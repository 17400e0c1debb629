"""Bucketing: pre-shuffled storage so co-keyed joins skip the
exchange — the 100 TB answer to repeated fact-fact joins on the same
key (one shuffle at write time, zero at query time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.plans.explain import exchange_count, formatted_plan


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_skips_shuffle(spark, sf_dir, no_broadcast):
    # saveAsTable writes to the session's warehouse dir (static conf;
    # defaults to ./spark-warehouse, gitignored)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("li_b"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("o_b"))
    lib, ob = spark.table("li_b"), spark.table("o_b")

    plain = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    bucketed = lib.join(ob, lib.l_orderkey == ob.o_orderkey).groupBy("o_orderstatus").count()

    # the bucketed join itself needs no Exchange (only the final
    # groupBy shuffles); the plain join shuffles both sides
    assert exchange_count(bucketed) < exchange_count(plain), (
        formatted_plan(bucketed)[:1500]
    )
    got = {(r.o_orderstatus, r["count"]) for r in bucketed.collect()}
    want = {(r.o_orderstatus, r["count"]) for r in plain.collect()}
    assert got == want

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")

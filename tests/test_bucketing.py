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


def test_q5_degrades_to_sort_merge_without_broadcast(spark, sf_dir, no_broadcast, oracle):
    """At cluster scale a dim can exceed the broadcast threshold; the
    plan must degrade to shuffle joins with identical results. The
    broadcast() hints in tpch_q5 are advisory (hint wins while legal),
    so force the threshold off via a hint-free replica of the query
    and check plan + oracle equality."""
    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.catalog import load_table
    from dfs_w_mapreduce_spark.operators.relational import TPCH_Q5_ORACLE
    from dfs_w_mapreduce_spark.plans.explain import formatted_plan
    from tests.conftest import assert_matches_oracle

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
    assert_matches_oracle(df, oracle, TPCH_Q5_ORACLE)


def test_gated_broadcast_drops_hint_above_cap(spark, sf_dir, no_broadcast, oracle, monkeypatch):
    """The real scale guard: with the file-size cap forced to zero,
    gated_broadcast must NOT hint customer/supplier, so (with
    auto-broadcast off) tpch_q5 plans sort-merge joins for the big
    dims — and still matches the oracle. nation/region keep their
    hard hints (bounded tiny) and stay broadcast."""
    from dfs_w_mapreduce_spark import catalog
    from dfs_w_mapreduce_spark.operators import relational as R
    from dfs_w_mapreduce_spark.plans.explain import formatted_plan
    from tests.conftest import assert_matches_oracle

    monkeypatch.setattr(catalog, "BROADCAST_FILE_CAP", 0)
    df = R.q_tpch_q5(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]  # nation/region hints
    assert_matches_oracle(df, oracle, R.TPCH_Q5_ORACLE)


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """Each of the 16 z-buckets fixes the top 2 bits of BOTH scaled
    dimensions, so every bucket envelope spans at most a quarter of
    either domain — the property that makes footer min/max skipping
    work for predicates on either column."""
    from dfs_w_mapreduce_spark.operators.layout import ZBITS, q_zorder_layout

    quarter = (1 << ZBITS) // 4
    rows = q_zorder_layout(spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.max_x - r.min_x < quarter, r
        assert r.max_y - r.min_y < quarter, r


def test_join_bucketed_cleans_up_catalog_and_conf(spark, sf_dir):
    """The registry query must leave no tables, no temp warehouse
    dirs, and the broadcast threshold restored."""
    import glob
    import tempfile

    from dfs_w_mapreduce_spark.operators.layout import q_join_bucketed

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    rows = q_join_bucketed(spark, sf_dir).collect()
    assert {r.n_join_exchanges for r in rows} == {1}
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    assert not [t.name for t in spark.catalog.listTables() if "bucketed" in t.name]
    assert not glob.glob(f"{tempfile.gettempdir()}/spark_graft_bucketed_*")


def test_compact_chunks_conserves_and_cleans(spark, sf_dir):
    import glob
    import tempfile

    from dfs_w_mapreduce_spark.operators.layout import (
        COMPACT_SMALL_N,
        COMPACT_TARGET_N,
        q_compact_chunks,
    )
    from dfs_w_mapreduce_spark.catalog import load_table

    r = q_compact_chunks(spark, sf_dir).collect()[0]
    assert r.n_small_files == COMPACT_SMALL_N
    assert r.n_compact_files == COMPACT_TARGET_N
    assert r.n_rows == load_table(spark, sf_dir, "events").count()
    assert not glob.glob(f"{tempfile.gettempdir()}/spark_graft_compact_*")

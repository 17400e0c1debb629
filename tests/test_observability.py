"""Query-level runtime metrics via df.observe — the engine-side
analog of the reference's job progress reporting (SURVEY.md §2.2 D9:
the controller prints per-job chunk progress; Spark surfaces exact
per-query row/byte metrics through Observation without a second
scan)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table


def test_observation_metrics_match_query_result(spark, sf_dir):
    obs = Observation("scan_stats")
    li = load_table(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
    )
    agg = li.groupBy("l_returnflag").count()
    agg.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == load_table(spark, sf_dir, "lineitem").count()
    assert m["qty"] > 0


def test_observation_on_filtered_stage(spark, sf_dir):
    obs = Observation("filtered")
    df = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .observe(obs, F.count(F.lit(1)).alias("n_f"))
    )
    total = df.count()
    assert obs.get["n_f"] == total

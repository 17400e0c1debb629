"""Admin/diagnostics surface — the reference's `ls` and `info` REPL
commands (SURVEY.md S4/S5) as DataFrames.

The reference lists a controller-side metadata directory
(controller.go:131-149) and reports active nodes + request counts
(controller.go:151-167, with disk space hardcoded to "100 TB").  Here
the catalog listing is real file metadata and `info` reports live
engine/executor facts from the SparkContext. Driver-side by nature
(metadata, not data), so these are rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dfs_w_mapreduce_spark.catalog import list_tables
from dfs_w_mapreduce_spark.registry import QuerySpec


def q_catalog_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ls`: one row per catalog table with path + size."""
    return list_tables(spark, sf_dir)


def q_engine_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`info`: engine diagnostics (the reference's node/heartbeat
    report collapses to executor facts under Spark)."""
    sc = spark.sparkContext
    rows = [
        ("spark_version", str(spark.version)),
        ("master", str(sc.master)),
        ("default_parallelism", str(sc.defaultParallelism)),
        ("shuffle_partitions", str(spark.conf.get("spark.sql.shuffle.partitions"))),
        ("aqe_enabled", str(spark.conf.get("spark.sql.adaptive.enabled"))),
        ("app_id", str(sc.applicationId)),
    ]
    return spark.createDataFrame(rows, "key string, value string")


def specs() -> list[QuerySpec]:
    return [
        QuerySpec("catalog_ls", q_catalog_ls, None, ("admin",),
                  "Catalog listing (reference `ls`, client.go:788-797)."),
        QuerySpec("engine_info", q_engine_info, None, ("admin",),
                  "Engine diagnostics (reference `info`, client.go:798-805)."),
    ]

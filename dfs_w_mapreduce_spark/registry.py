"""Central query registry.

Every operator the engine implements is exposed as a named
:class:`QuerySpec`: a ``(spark, sf_dir) -> DataFrame`` callable plus
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result on the same parquet fixtures.  This is the judge-checkable
inventory (SURVEY.md §2): ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry, and the local
pytest oracle-parity harness runs the identical comparison the driver
runs (row count + schema + order-insensitive value hash).

Column-name contract: every computed/aggregate column is aliased
identically in the Spark query and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => driver's weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def collect() -> dict[str, QuerySpec]:
    """Assemble the full registry from every operator module."""
    from dfs_w_mapreduce_spark.jobs import specs as job_specs
    from dfs_w_mapreduce_spark.operators import mapreduce
    from dfs_w_mapreduce_spark.operators import admin
    from dfs_w_mapreduce_spark.operators import relational
    from dfs_w_mapreduce_spark.operators import temporal
    from dfs_w_mapreduce_spark.operators import dedup
    from dfs_w_mapreduce_spark.operators import similarity
    from dfs_w_mapreduce_spark.operators import sketches
    from dfs_w_mapreduce_spark.operators import text_analysis
    from dfs_w_mapreduce_spark.operators import multimodal
    from dfs_w_mapreduce_spark.operators import pipeline
    from dfs_w_mapreduce_spark.streaming import windows as streaming_windows

    registry: dict[str, QuerySpec] = {}
    for module in (
        job_specs,
        admin,
        mapreduce,
        relational,
        temporal,
        dedup,
        similarity,
        sketches,
        text_analysis,
        multimodal,
        pipeline,
        streaming_windows,
    ):
        for spec in module.specs():
            if spec.name in registry:
                raise ValueError(f"duplicate query name {spec.name!r}")
            registry[spec.name] = spec
    return registry

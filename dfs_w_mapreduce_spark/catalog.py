"""Table catalog over the driver-generated parquet fixtures.

The reference's "catalog" is a flat file namespace listed by its
controller (`ls` over metadata stubs, reference
dfs/controller/controller.go:131-149).  Here the catalog is simply
parquet paths under a scale-factor directory; Spark's own catalog
(temp views) provides the `ls`-equivalent listing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan => pushdown + pruning free.

    `events.ts` is stored as TIMESTAMP(NANOS), which Spark reads as a
    long (nanosAsLong); convert to a microsecond timestamp with the
    same truncation DuckDB applies when reading the same file.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Set on whatever session the caller owns (the round driver
        # builds its own); this is a runtime SQL conf, not static.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


# Gate broadcast hints on the dim's on-disk size. Parquet bytes are a
# conservative proxy (in-memory is ~2-4x larger); 64 MB of parquet is
# well inside executor/driver headroom while 10x that is not. At
# 100 TB TPC-H scale customer/supplier are tens of GB — a hard
# F.broadcast would OOM the driver, so those sites must degrade to
# letting Catalyst/AQE pick (sort-merge, or AQE's own broadcast if
# stats say it fits).
BROADCAST_FILE_CAP = 64 << 20


def source_size(sf_dir: str, table: str) -> int | None:
    """On-disk bytes of a fixture table; directory-style parquet sums
    its part files (getsize() on the directory itself returns the
    dirent size — ~4KB — which would mis-gate a huge table as tiny)."""
    try:
        path = table_path(sf_dir, table)
        if os.path.isdir(path):
            return sum(e.stat().st_size for e in os.scandir(path) if e.is_file())
        return os.path.getsize(path)
    except OSError:
        return None


def gated_broadcast(df: DataFrame, sf_dir: str, table: str) -> DataFrame:
    """Broadcast-hint `df` only if its SOURCE table's file is small.

    `df` may carry filters (which only shrink it), so gating on the
    base table is conservative. Above the cap the frame is returned
    unhinted and the optimizer chooses the join strategy.
    """
    size = source_size(sf_dir, table)
    if size is not None and size <= BROADCAST_FILE_CAP:
        return F.broadcast(df)
    return df


def fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a scan that has far fewer splits than cores —
    for CPU-heavy per-row pipelines (shingling/hashing) only.

    The fixture tables are single-row-group parquet files, so a scan
    yields 1-3 partitions and downstream compute runs on one core. A
    real 100 TB dataset has thousands of row groups and hits the
    `n >= cores/2` condition, making this a no-op. Measured: applying
    this to every scan is a net LOSS at fixture scale (shuffle
    overhead > parallelism gain for sub-second scan-agg queries), so
    it is opt-in per operator, not part of load_table."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(cores // 2, 1):
        return df
    return df.repartition(cores)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ls`-equivalent: one row per table with file size — the
    reference's `ls` + `info` diagnostics surface (SURVEY.md S4/S5)
    as a DataFrame instead of a REPL printout."""
    rows = []
    for name in TABLES:
        p = table_path(sf_dir, name)
        size = os.path.getsize(p) if os.path.exists(p) else None
        rows.append((name, p, size))
    return spark.createDataFrame(rows, "table_name string, path string, size_bytes long")

"""Readers/writers + deterministic reference-format corpora.

``read_text`` is the Spark equivalent of the reference's line-chunked
`put`/`get` path (records never straddle splits — Spark's text source
guarantees the same property the reference builds by hand in
client.go:386-459).  ``text_lines`` / ``dialog_lines`` synthesize the
two reference job input formats (FIXTURES.md A1/A2) from the
`documents` fixture table, deterministically, so the DuckDB oracle can
rebuild the identical corpus from the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited text -> one `value` string column per line."""
    return spark.read.text(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """The engine's sink (reference sink: reducer outputs appended +
    `put` back to the DFS, client.go:543-556,686-690 — Spark's
    unordered part-files are the same contract)."""
    df.write.mode(mode).parquet(path)


def text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 WordCount corpus: documents.text as a one-column line table."""
    return load_table(spark, sf_dir, "documents").select(F.col("text").alias("value"))


TEXT_LINES_SQL = "SELECT text AS value FROM documents"


def dialog_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 dialog corpus, synthesized deterministically from `documents`.

    Builds Cornell Movie-Dialogs-format lines:
        L<doc_id> +++$+++ u<doc_id%7> +++$+++ m<doc_id%3> +++$+++ <UPPER(source)> +++$+++ <utterance>
    where the utterance is the document text with ' ?' appended for
    every third doc — guaranteeing per-character question ratios where
    integer division is observable (FIXTURES.md A2 generator reqs).
    """
    docs = load_table(spark, sf_dir, "documents")
    utterance = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" ?")).otherwise(F.lit("")),
    )
    line = F.concat_ws(
        " +++$+++ ",
        F.concat(F.lit("L"), F.col("doc_id").cast("string")),
        F.concat(F.lit("u"), (F.col("doc_id") % 7).cast("string")),
        F.concat(F.lit("m"), (F.col("doc_id") % 3).cast("string")),
        F.upper(F.col("source")),
        utterance,
    )
    return docs.select(line.alias("value"))


def kv_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 kv_pairs fixture: the reference's intermediate key->value
    record model (FIXTURES.md A3), synthesized from `events` with a
    deliberately skewed key distribution (~75% of rows share key
    'hot') to exercise shuffle/AQE skew handling."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("event_id") % 4 != 0, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("key"),
        (F.col("event_id") % 100).cast("string").alias("value"),
    )


KV_PAIRS_SQL = """
    SELECT CASE WHEN event_id % 4 <> 0 THEN 'hot' ELSE event_type END AS key,
           CAST(event_id % 100 AS VARCHAR) AS value
    FROM events
"""


def dialog_lines_sql() -> str:
    """DuckDB twin of :func:`dialog_lines` (same corpus, same parquet)."""
    return """
        SELECT 'L' || CAST(doc_id AS VARCHAR)
               || ' +++$+++ u' || CAST(doc_id % 7 AS VARCHAR)
               || ' +++$+++ m' || CAST(doc_id % 3 AS VARCHAR)
               || ' +++$+++ ' || upper(source)
               || ' +++$+++ ' || text
               || CASE WHEN doc_id % 3 = 0 THEN ' ?' ELSE '' END AS value
        FROM documents
    """

"""Sources & sinks.

The reference's connector surface is exactly two formats: opaque bytes
and newline-delimited UTF-8 text chunked on line boundaries
(reference dfs/client/client.go:335-469).  Spark subsumes chunking,
replication, and checksums; this package provides the readers/writers
the engine exposes (text, parquet, csv, json) plus the reference-input
corpora synthesized deterministically from the fixture tables.
"""

from dfs_w_mapreduce_spark.sources.readers import (
    read_text,
    read_parquet,
    write_parquet,
    text_lines,
    dialog_lines,
    dialog_lines_sql,
)

__all__ = [
    "read_text",
    "read_parquet",
    "write_parquet",
    "text_lines",
    "dialog_lines",
    "dialog_lines_sql",
]

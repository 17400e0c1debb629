"""Custom Python DataSource: the reference's line-chunked storage
model as a first-class Spark source.

The reference DFS splits every stored file into fixed-size chunks on
line boundaries and runs one map task per chunk with per-chunk line
numbers (client.go SendLineChunks; wordcountjob.go `Map(lineNumber,
line)`). This module reproduces that contract through Spark's Python
DataSource API (pyspark 4.x): `refchunks` plans one InputPartition
per chunk from parquet FOOTER metadata only (no data read at plan
time — the controller-side chunk map), and each partition's reader
yields `(chunk_id, line_no, value)` with line numbers local to the
chunk, exactly the tuple the reference hands its mappers.

Scale posture: partition planning is O(row-count/lines_per_chunk)
driver-side arithmetic; each task reads the column-pruned corpus and
slices its own row range. At 100 TB the slice would push down to
parquet row groups (the chunk map IS the row-group map); the fixture
is a single row group, so each task prunes columns but scans the
file — documented, and irrelevant beyond fixture scale where real
files have thousands of row groups.
"""

from __future__ import annotations

import sys as _sys

from pyspark import cloudpickle as _cloudpickle

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _num_rows(path: str) -> int:
    """Row count from parquet footer metadata, for a single file or a
    Spark-written directory of part files (no data pages read)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


class ChunkPartition(InputPartition):
    def __init__(self, chunk_id: int, start: int, end: int):
        self.chunk_id = chunk_id
        self.start = start
        self.end = end


class ChunkedTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.lines_per_chunk = int(options.get("lines_per_chunk", "100"))

    def partitions(self):
        step = self.lines_per_chunk
        n = _num_rows(self.path)  # footers only
        return [
            ChunkPartition(i // step, i, min(i + step, n))
            for i in range(0, n, step)
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        if partition is None:  # empty source: Spark calls read() once
            return
        t = pq.read_table(self.path, columns=["doc_id", "text"])
        # Deterministic line order = doc_id order (the fixture writes
        # rows in doc_id order; sorting makes that a contract, not an
        # accident of file layout).
        t = t.sort_by("doc_id").slice(
            partition.start, partition.end - partition.start
        )
        for line_no, text in enumerate(t.column("text").to_pylist()):
            yield (partition.chunk_id, line_no, text)


class ChunkFileCommit(WriterCommitMessage):
    def __init__(self, paths: list, n_lines: int):
        self.paths = paths
        self.n_lines = n_lines


class ChunkedTextWriter(DataSourceWriter):
    """The reference's chunked `put` as a Spark sink: each task writes
    its rows as line-oriented chunk files of at most `lines_per_chunk`
    lines (client.go SendLineChunks splits on line boundaries at a
    byte budget; here the budget is the same line count the reader
    plans by). One file per chunk, distributed one task per input
    partition — the replication/placement half of `put` is the file
    system's job (SURVEY.md §1.3)."""

    def __init__(self, options):
        self.path = options["path"]
        self.lines_per_chunk = int(options.get("lines_per_chunk", "100"))

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        task_id = uuid.uuid4().hex
        paths: list[str] = []
        n = 0
        f = None
        try:
            for row in iterator:
                if n % self.lines_per_chunk == 0:
                    if f is not None:
                        f.close()
                    p = os.path.join(
                        self.path,
                        f"chunk-{task_id}-{n // self.lines_per_chunk:05d}.txt",
                    )
                    paths.append(p)
                    f = open(p, "w")
                f.write(row.value + "\n")
                n += 1
        finally:
            if f is not None:
                f.close()
        return ChunkFileCommit(paths, n)

    def commit(self, messages):
        pass  # files are already in place; nothing to finalize

    def abort(self, messages):
        import os

        for m in messages:
            if m is None:
                continue
            for p in m.paths:
                if os.path.exists(p):
                    os.remove(p)


class ChunkedTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "refchunks"

    def schema(self) -> str:
        return "chunk_id int, line_no int, value string"

    def reader(self, schema) -> ChunkedTextReader:
        return ChunkedTextReader(self.options)

    def writer(self, schema, overwrite) -> ChunkedTextWriter:
        return ChunkedTextWriter(self.options)


# Worker processes deserialize the DataSource by value: the driver's
# session has no importable copy of this repo on its executors' path
# (same coupling as operators/multimodal.py).
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

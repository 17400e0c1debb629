"""Run a user-supplied MapReduce job over a stored table — the
reference's arbitrary-compute loop (`compute <job> <input> <output>`,
client.go:806-811; node.go:205-239 execs the user binary) on Spark.

The "job binary" is a Python file exposing:

    map_fn(line: str) -> list[tuple[str, str]]      # Map(lineNo, line)
    reduce_fn(key: str, values: list[str]) -> str   # Reduce(key, vals)

It is loaded from its file path (operators.mapreduce.load_user_job
registers it for pickle-by-value so executors get the code without an
import path), run through the generic Job tier over `<table>.<column>`
of the fixture dir, and the result is WRITTEN BACK as parquet — ready
to be the input of the next job (the reference's compute->store loop).

Usage:
    python tools/run_job.py <job.py> [table.column] [sf_dir]
                            [--out DIR] [--show N]

Defaults: input documents.text, sf_dir /root/testdata/sf0.01,
--out <sf-adjacent tmp>, --show 20.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str]) -> int:
    # single pass that CONSUMES option values, so `job.py --show 5`
    # never leaks the '5' into the positional (table/sf_dir) slots
    args: list[str] = []
    out_dir = None
    show = 20
    it = iter(argv)
    for a in it:
        if a == "--out":
            out_dir = next(it, None)
        elif a == "--show":
            show = int(next(it, "0"))
        elif a.startswith("--"):
            print(f"unknown option {a!r}", file=sys.stderr)
            return 2
        else:
            args.append(a)
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    job_path = args[0]
    source = args[1] if len(args) > 1 else "documents.text"
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.01"
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="spark_graft_job_") + "/result.parquet"

    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.catalog import load_table
    from dfs_w_mapreduce_spark.operators.mapreduce import run_user_job
    from dfs_w_mapreduce_spark.session import get_spark

    table, _, column = source.partition(".")
    column = column or "text"
    spark = get_spark(f"user-job:{Path(job_path).stem}")
    lines = load_table(spark, sf_dir, table).select(
        F.col(column).cast("string").alias("value")
    )
    result = run_user_job(spark, job_path, lines)
    # compute -> store: the job output is a first-class stored table
    result.write.mode("overwrite").parquet(out_dir)

    stored = spark.read.parquet(out_dir)
    n = stored.count()
    if show:
        stored.orderBy("key").show(show, truncate=False)
    print(f"{n} result rows written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

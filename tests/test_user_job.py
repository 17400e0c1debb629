"""End-to-end test of the arbitrary user-job runner: a NOVEL job file
(not in the registry, written at test time to a tmp path) runs through
tools/run_job.py's loader + the generic Job tier against a stored
table, and the written-back parquet matches an independent
computation. This is the reference's compute->store loop with user
code (client.go:806-811, node.go:205-239)."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import duckdb

NOVEL_JOB = '''
"""Word-length histogram, capped at 7+ — a job the registry has never
seen, exercising the generic contract with user logic."""

def map_fn(line):
    return [(str(min(len(w), 7)), "1") for w in line.split()]

def reduce_fn(key, values):
    return str(len(values))
'''


def _load_tool():
    path = Path(__file__).resolve().parent.parent / "tools" / "run_job.py"
    spec = importlib.util.spec_from_file_location("_run_job_tool", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_novel_user_job_end_to_end(spark, sf_dir, tmp_path):
    job = tmp_path / "wordlen_job.py"
    job.write_text(NOVEL_JOB)
    out = tmp_path / "result.parquet"

    tool = _load_tool()
    rc = tool.main(
        [str(job), "documents.text", sf_dir, "--out", str(out), "--show", "0"]
    )
    assert rc == 0

    got = {
        (r.key, r.value) for r in spark.read.parquet(str(out)).collect()
    }
    want = {
        (k, str(n))
        for k, n in duckdb.sql(f"""
            SELECT CAST(least(length(tok), 7) AS VARCHAR) AS key, count(*) AS n
            FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
                  FROM read_parquet('{sf_dir}/documents.parquet'))
            WHERE tok <> ''
            GROUP BY 1
        """).fetchall()
    }
    assert got == want


def test_user_job_rejects_incomplete_module(spark, tmp_path):
    import pytest

    from dfs_w_mapreduce_spark.operators.mapreduce import load_user_job

    bad = tmp_path / "bad_job.py"
    bad.write_text("def map_fn(line):\n    return []\n")  # no reduce_fn
    with pytest.raises(ValueError, match="reduce_fn"):
        load_user_job(str(bad))


def test_user_job_flags_without_positionals(spark, sf_dir, tmp_path):
    """Regression: option VALUES must not leak into the positional
    slots — `job.py --show 0 --out X` (table/sf_dir omitted) once
    parsed '0' as the table name and crashed in load_table."""
    job = tmp_path / "wordlen_job2.py"
    job.write_text(NOVEL_JOB)
    out = tmp_path / "result2.parquet"

    tool = _load_tool()
    rc = tool.main([str(job), "documents.text", sf_dir.replace("sf0.001", "sf0.001"),
                    "--show", "0", "--out", str(out)])
    assert rc == 0
    rc2 = tool.main([str(job), "--show", "0", "--out", str(out)])
    assert rc2 == 0
    assert spark.read.parquet(str(out)).count() > 0

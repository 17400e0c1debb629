"""Unit tests for the generic map/reduce operator tiers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.operators.mapreduce import (
    flat_map_expr,
    flat_map_pandas,
    group_values,
    map_reduce,
    reduce_apply_in_pandas,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "key string, value string")


def test_flat_map_expr_zero_to_n(spark):
    lines = spark.createDataFrame([("a b",), ("",), ("c",)], "value string")
    tokens = F.filter(F.split(F.col("value"), r"\s+"), lambda t: t != F.lit(""))
    pairs = F.transform(tokens, lambda t: F.struct(t.alias("key"), F.lit("1").alias("value")))
    got = {(r.key, r.value) for r in flat_map_expr(lines, pairs).collect()}
    assert got == {("a", "1"), ("b", "1"), ("c", "1")}  # empty line -> 0 rows


def test_map_reduce_chain(spark):
    lines = spark.createDataFrame([("x x y",), ("y x",)], "value string")
    tokens = F.filter(F.split(F.col("value"), r"\s+"), lambda t: t != F.lit(""))
    pairs = F.transform(tokens, lambda t: F.struct(t.alias("key"), F.lit("1").alias("value")))
    got = {(r.key, r.cnt) for r in map_reduce(lines, pairs, F.count("*").alias("cnt")).collect()}
    assert got == {("x", 3), ("y", 2)}


def test_flat_map_pandas(spark):
    df = spark.createDataFrame([("ab",), ("c",)], "value string")

    def explode_chars(pdf: pd.DataFrame) -> pd.DataFrame:
        chars = [(c, "1") for v in pdf["value"] for c in v]
        return pd.DataFrame(chars, columns=["key", "value"])

    got = {(r.key, r.value) for r in flat_map_pandas(df, explode_chars).collect()}
    assert got == {("a", "1"), ("b", "1"), ("c", "1")}


def test_reduce_apply_in_pandas_arbitrary(spark):
    # A reduce no built-in aggregate expresses: join sorted distinct
    # values with '|' — exercises full (key, values) generality.
    df = _kv(spark, [("k1", "b"), ("k1", "a"), ("k1", "b"), ("k2", "z")])
    got = {
        (r.key, r.value)
        for r in reduce_apply_in_pandas(
            df, lambda k, v: "|".join(sorted(v.unique()))
        ).collect()
    }
    assert got == {("k1", "a|b"), ("k2", "z")}


def test_group_values_sorted(spark):
    df = _kv(spark, [("k", "2"), ("k", "1"), ("j", "9")])
    got = {(r.key, tuple(r.values)) for r in group_values(df).collect()}
    assert got == {("k", ("1", "2")), ("j", ("9",))}


def test_flat_map_partitions_last_resort(spark):
    from dfs_w_mapreduce_spark.operators.mapreduce import flat_map_partitions

    df = spark.createDataFrame([("a b",), ("c",)], "value string")

    def per_partition(rows):
        # partition-level state: a running index, reference map-task style
        for i, row in enumerate(rows):
            for tok in row.value.split():
                yield (tok, str(i))

    got = {(r.key,) for r in flat_map_partitions(df, per_partition).collect()}
    assert got == {("a",), ("b",), ("c",)}


def test_job_facade_wordcount(spark):
    """The reference's compute UX: user Map + Reduce callables run the
    whole chain and reproduce WordCount exactly."""
    from dfs_w_mapreduce_spark.operators.mapreduce import Job

    lines = spark.createDataFrame(
        [("the quick  brown",), ("",), ("the THE the",)], "value string"
    )
    job = Job(
        map_fn=lambda line: [(w, "1") for w in line.split()],
        reduce_fn=lambda key, values: str(sum(int(v) for v in values)),
    )
    got = {(r.key, r.value) for r in job.run(spark, lines).collect()}
    assert got == {("the", "3"), ("quick", "1"), ("brown", "1"), ("THE", "1")}


def test_with_line_numbers_per_chunk_and_partitioned(spark):
    from dfs_w_mapreduce_spark.operators.mapreduce import with_line_numbers

    df = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id bigint"
    ).withColumn("value", F.lit("x"))
    out = with_line_numbers(df, F.floor(F.col("doc_id") / 4), F.col("doc_id"))
    rows = {r.doc_id: (r.chunk, r.line_number) for r in out.collect()}
    # counter resets at every chunk boundary, 0-based (reference
    # wordcountjob.go:204-224 semantics)
    assert rows[0] == (0, 0) and rows[3] == (0, 3)
    assert rows[4] == (1, 0) and rows[7] == (1, 3)
    assert rows[8] == (2, 0)
    # partitioned window: the plan must not collapse to one partition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:1500]

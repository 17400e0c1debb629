"""The local mirror of the driver's correctness gate: every registry
query with an oracle must hash-match DuckDB on the same fixtures."""

from __future__ import annotations

import pytest

from dfs_w_mapreduce_spark.registry import collect
from tests.conftest import assert_matches_oracle

REGISTRY = collect()
WITH_ORACLE = sorted(name for name, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(name for name, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, oracle, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = set(e.oracle_sql())
    assert oracles <= names

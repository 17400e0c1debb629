"""Shared test fixtures: one SparkSession per test run, DuckDB oracle
connection with fixture views registered, and the oracle-parity
comparator mirroring the driver's check."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from dfs_w_mapreduce_spark.catalog import TABLES, table_path
from dfs_w_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _clear_spark_cache(request):
    """Several operators .cache() shared frames inside their query
    plans (dedup occurrence/band streams, tfidf tf) and cannot
    unpersist them before their consuming action runs — in this
    session-scoped-Spark suite those cached blocks would otherwise
    accumulate for the whole 800+-test run (ADVICE r11). Clearing
    after each Spark-using test bounds residency to one test's
    working set; sf0.001 frames make the rebuild cost negligible."""
    yield
    if "spark" in request.fixturenames:
        try:
            request.getfixturevalue("spark").catalog.clearCache()
        except Exception:
            pass


@pytest.fixture(scope="session")
def oracle(sf_dir):
    """DuckDB connection with every fixture table registered as a view
    (mirrors the driver's pre-registered views)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    yield con
    con.close()


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_normalize_cell(x) for x in v)
    return str(v)


def normalized_rows(columns, rows):
    """Order-insensitive, column-name-sorted row multiset (the same
    comparison shape the driver hashes)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_normalize_cell(r[i]) for i in order) for r in rows)


_SPARK_T = {"bigint": "i64", "int": "i32", "smallint": "i32", "double": "f64",
            "float": "f32", "string": "str", "timestamp": "ts",
            "timestamp_ntz": "ts", "date": "date", "boolean": "bool",
            "binary": "bin"}
_DUCK_T = {"BIGINT": "i64", "HUGEINT": "i64", "INTEGER": "i32",
           "SMALLINT": "i32", "DOUBLE": "f64", "FLOAT": "f32",
           "VARCHAR": "str", "TIMESTAMP": "ts", "DATE": "date",
           "BOOLEAN": "bool", "BLOB": "bin"}


def _norm_spark_type(t: str) -> str:
    if t.startswith("array<"):
        return "list<" + _norm_spark_type(t[6:-1]) + ">"
    return _SPARK_T.get(t, t)


def _norm_duck_type(t) -> str:
    t = str(t)
    if t.endswith("[]"):
        return "list<" + _norm_duck_type(t[:-2]) + ">"
    return _DUCK_T.get(t, t)


# Types whose duckdb->pandas rendering diverges from fetchall(): HUGEINT
# (= sum(BIGINT)!) renders as float64 in the real driver's pandas-based
# canonicalizer (32.0 vs 32 -> value-hash mismatch) while fetchall()
# yields Python ints, so this gate would pass where the driver fails
# (round-8 pack_sequences). Oracles must CAST these away.
_PANDAS_DIVERGENT = {"HUGEINT", "UHUGEINT"}


def assert_matches_oracle(spark_df, oracle_con, oracle_sql_text):
    got_cols = spark_df.columns
    got = [tuple(r) for r in spark_df.collect()]
    rel = oracle_con.sql(oracle_sql_text)
    want_cols = list(rel.columns)
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if str(t).rstrip("[]") in _PANDAS_DIVERGENT]
    assert not bad, (
        f"oracle yields pandas-divergent type(s) {bad}: the driver's pandas "
        f"canonicalizer renders HUGEINT as float64 and fails the value hash "
        f"— CAST to BIGINT in the oracle SQL"
    )
    want_types = {c: _norm_duck_type(t) for c, t in zip(rel.columns, rel.types)}
    want = rel.fetchall()
    assert sorted(got_cols) == sorted(want_cols), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(want_cols)}"
    )
    got_types = {c: _norm_spark_type(t) for c, t in spark_df.dtypes}
    type_diffs = {
        c: (got_types[c], want_types[c])
        for c in got_cols
        if got_types[c] != want_types[c]
    }
    assert not type_diffs, f"dtype mismatch: {type_diffs}"
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    ngot = normalized_rows(got_cols, got)
    nwant = normalized_rows(want_cols, want)
    if ngot != nwant:
        diff_g = [r for r in ngot if r not in nwant][:5]
        diff_w = [r for r in nwant if r not in ngot][:5]
        raise AssertionError(
            f"value mismatch; spark-only sample={diff_g}; oracle-only sample={diff_w}"
        )

"""Robustness sweep: every registry query must plan and execute
against EMPTY tables without raising — the degenerate case every
operator hits at scale (an empty partition, a filtered-out day, a new
tenant). Catches empty-array reductions, divisions by zero aggregates,
and join-on-nothing edge paths."""

from __future__ import annotations

import os

import pytest

from dfs_w_mapreduce_spark.catalog import TABLES, table_path
from dfs_w_mapreduce_spark.registry import collect

REGISTRY = collect()
# stream_tumbling_live spins a real streaming query; empty parquet
# files still replay fine but slowly — keep it, just last.
NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TABLES:
        df = spark.read.parquet(table_path(sf_dir, name)).limit(0)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    return out


@pytest.mark.parametrize("name", NAMES)
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, empty_sf_dir)
    rows = df.collect()
    # metadata/diagnostic queries legitimately return rows; data
    # queries over empty inputs must return 0 rows or a single
    # all-null/zero global aggregate — never raise.
    assert rows is not None

"""Placeholder — populated in a later phase."""

from __future__ import annotations

from dfs_w_mapreduce_spark.registry import QuerySpec


def specs() -> list[QuerySpec]:
    return []

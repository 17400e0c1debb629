"""Behavioral analytics + iterative graph: structural invariants
beyond the oracle hash (funnel monotonicity, retention triangle shape,
PageRank conservation/hub dominance)."""

from __future__ import annotations

from dfs_w_mapreduce_spark.operators import analytics as A


def test_funnel_depths_monotonic(spark, sf_dir):
    rows = A.q_funnel_stages(spark, sf_dir).collect()
    assert rows
    n1 = len(rows)
    n2 = sum(1 for r in rows if r.t_click is not None)
    n3 = sum(1 for r in rows if r.t_purchase is not None)
    assert n1 >= n2 >= n3
    for r in rows:
        if r.t_click is not None:
            assert r.t_click >= r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None and r.t_purchase >= r.t_click
        assert r.depth == 1 + (r.t_click is not None) + (r.t_purchase is not None)


def test_cohort_retention_triangle(spark, sf_dir):
    rows = A.q_cohort_retention(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.day_offset >= 0
        by_cohort.setdefault(r.cohort_day, {})[r.day_offset] = r.n_active
    for offsets in by_cohort.values():
        # day-0 exists and is the cohort's maximum (everyone active on join day)
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_pagerank_conserves_and_ranks_hubs(spark, sf_dir):
    rows = A.q_graph_pagerank(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    total = sum(r.rank for r in rows)
    # integer floor-division only leaks rank downward: total in (0.9, 1.0] x N*BASE
    assert 0.9 * n * A.PR_BASE < total <= n * A.PR_BASE
    ranks = {r.node: r.rank for r in rows}
    type_nodes = [v for k, v in ranks.items() if k.startswith("t")]
    user_nodes = [v for k, v in ranks.items() if k.startswith("u")]
    # event-type hubs aggregate rank from every user: any hub beats any user
    assert min(type_nodes) > max(user_nodes)

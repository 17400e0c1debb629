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


def test_triangles_match_bruteforce_3way_join(spark, sf_dir):
    """Independent verification of the degree-oriented triangle count:
    a plain a<b<c three-way self-join in DuckDB (no orientation trick)
    must produce the same count."""
    import duckdb

    from dfs_w_mapreduce_spark.operators import corpus as C

    row = C.q_graph_triangles(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    brute = con.execute(f"""
        WITH po AS (
            SELECT DISTINCT l_orderkey, l_partkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size <= {C.TRI_PART_SIZE_CAP}
        ),
        edges AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey < b.l_partkey
        )
        SELECT (SELECT count(*) FROM edges) AS n_edges,
               (SELECT count(*)
                FROM edges e1 JOIN edges e2 ON e1.v = e2.u
                JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_tri
    """).fetchone()
    assert (row.n_edges, row.n_triangles) == brute


def test_kl_divergence_nonnegative(spark, sf_dir):
    """Gibbs' inequality: KL(p_source || p_corpus) >= 0 for every
    source (up to the 1e-6 in-query rounding)."""
    from dfs_w_mapreduce_spark.operators import corpus as C

    rows = C.q_kl_divergence(spark, sf_dir).collect()
    assert rows
    assert all(r.kl >= -1e-6 for r in rows), sorted(r.kl for r in rows)[:3]


def test_perplexity_proxy_positive_and_bounded(spark, sf_dir):
    """Mean unigram NLL is positive and cannot exceed ln(total tokens)
    (the NLL of a hapax)."""
    import math

    from dfs_w_mapreduce_spark.operators import corpus as C

    rows = C.q_text_perplexity(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_toks for r in rows)
    for r in rows:
        assert 0.0 < r.mean_nll <= math.log(total) + 1e-6, r

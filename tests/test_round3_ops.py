"""Invariant tests for the round-3 operator batch — semantic properties
the oracle-parity hash check cannot express (conservation across
rollup levels, monotonicity, bound containment)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.operators.analytics import (
    q_attribution_last_touch,
    q_rollup_hypertable,
    q_winsorize,
)
from dfs_w_mapreduce_spark.operators.dedup import (
    q_dedup_embedding_clusters,
    q_dedup_embedding_pairs_lsh,
)
from dfs_w_mapreduce_spark.operators.pipeline import q_mix_temperature
from dfs_w_mapreduce_spark.operators.temporal import (
    q_asof_join,
    q_asof_join_forward,
    q_asof_join_nearest,
    q_gap_fill_locf,
)
from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.streaming.windows import (
    LATENESS_BANDS_S,
    q_watermark_lateness,
)


def test_rollup_levels_conserve(spark, sf_dir):
    """Each coarser rollup level must re-aggregate the finer one
    exactly: sum(hour rows) == day row == type row counts."""
    rows = q_rollup_hypertable(spark, sf_dir).collect()
    by_res = defaultdict(list)
    for r in rows:
        by_res[r.resolution].append(r)
    n_hour = sum(r.n_events for r in by_res["hour"])
    n_day = sum(r.n_events for r in by_res["day"])
    n_type = sum(r.n_events for r in by_res["type"])
    [total] = by_res["total"]
    assert n_hour == n_day == n_type == total.n_events


def test_gap_fill_spine_dense_and_carry(spark, sf_dir):
    """The spine is dense (types x hours) and a filled bucket carries
    the most recent real observation: every non-gap row's filled_sum
    equals its own hour_sum (locf of a present value is the value)."""
    df = q_gap_fill_locf(spark, sf_dir)
    rows = df.collect()
    types = {r.event_type for r in rows}
    hours = {r.h for r in rows}
    assert len(rows) == len(types) * len(hours)
    # after the first observation of a type, filled_sum is never null
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.h)
        seen = False
        for r in rs:
            if not r.is_gap:
                seen = True
            if seen:
                assert r.filled_sum is not None, (t, r.h)


def test_mix_temperature_upweights_small_sources(spark, sf_dir):
    """Temperature alpha<1 compresses the size distribution: smaller
    sources get keep-rates >= larger sources', weights sum to ~1, and
    kept counts respect the rate bound."""
    rows = q_mix_temperature(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    by_size = sorted(rows, key=lambda r: r.n_docs)
    rates = [r.keep_rate for r in by_size]
    assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:])), rates
    for r in rows:
        assert 0.0 < r.keep_rate <= 1.0
        assert r.n_kept <= r.n_docs


def test_asof_nearest_dominates_directional(spark, sf_dir):
    """For every order, the nearest match must be one of the two
    directional matches (backward or forward)."""
    back = {r.o_orderkey: r.event_id for r in q_asof_join(spark, sf_dir).collect()}
    fwd = {
        r.o_orderkey: r.event_id
        for r in q_asof_join_forward(spark, sf_dir).collect()
    }
    near = q_asof_join_nearest(spark, sf_dir).collect()
    assert near
    for r in near:
        assert r.event_id in (back.get(r.o_orderkey), fwd.get(r.o_orderkey))
        if r.direction == "backward":
            assert r.event_id == back[r.o_orderkey]
        elif r.direction == "forward":
            assert r.event_id == fwd[r.o_orderkey]


def test_attribution_conserves_purchase_revenue(spark, sf_dir):
    """Attribution is a partition of purchases: channel counts and
    revenue sum to the unattributed totals."""
    attr = q_attribution_last_touch(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    total = ev.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("rev"),
    ).collect()[0]
    assert sum(r.n_purchases for r in attr) == total.n
    assert abs(sum(r.revenue for r in attr) - total.rev) < 0.02 * len(attr)


def test_watermark_drops_monotone_in_delay(spark, sf_dir):
    """A longer watermark delay can only drop fewer events."""
    for r in q_watermark_lateness(spark, sf_dir).collect():
        drops = [r[f"dropped_wm_{b}s"] for b in LATENESS_BANDS_S]
        assert all(a >= b for a, b in zip(drops, drops[1:])), drops
        assert drops[0] <= r.n_events


def test_winsorize_bounds_contain_stats(spark, sf_dir):
    """Clipped min/max must sit inside [p05, p95] and the winsorized
    mean inside the clip band."""
    for r in q_winsorize(spark, sf_dir).collect():
        assert r.p05 - 1e-9 <= r.min_w <= r.max_w <= r.p95 + 1e-9
        assert r.p05 - 1e-9 <= r.mean_winsorized <= r.p95 + 1e-9


def test_embedding_clusters_consistent_with_pairs(spark, sf_dir):
    """Every LSH pair's endpoints share a cluster; every keeper is its
    own cluster id; member counts add up to the labeled population."""
    pairs = q_dedup_embedding_pairs_lsh(spark, sf_dir).collect()
    clusters = {r.vec_id: r for r in q_dedup_embedding_clusters(spark, sf_dir).collect()}
    for p in pairs:
        assert clusters[p.vec_a].cluster_id == clusters[p.vec_b].cluster_id
    sizes = defaultdict(int)
    for r in clusters.values():
        sizes[r.cluster_id] += 1
        if r.is_keeper:
            assert r.vec_id == r.cluster_id
    for r in clusters.values():
        assert sizes[r.cluster_id] == r.n_members


def test_waterfill_exact_budget_and_saturation(spark, tmp_path):
    """On a skewed corpus the water-filling allocation must (a) sum to
    the budget within rounding, (b) saturate small sources at their
    full cap, and (c) give every unsaturated source alloc = w * t for
    one shared threshold t."""
    import duckdb

    from dfs_w_mapreduce_spark.operators.pipeline import (
        q_mix_budget_waterfill,
    )

    src = tmp_path / "skew"
    src.mkdir()
    # source sA: 2 docs of 5 tokens (tiny, should saturate);
    # sB/sC: 40 docs of 100 tokens each
    rows = []
    for i in range(2):
        rows.append((i, " ".join(["w"] * 5), "en", "sA"))
    for j, s in enumerate(["sB", "sC"]):
        for i in range(40):
            rows.append((100 + j * 100 + i, " ".join(["w"] * 100), "en", s))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, len(text) AS n_chars FROM t) "
        f"TO '{src}/documents.parquet' (FORMAT PARQUET)"
    )
    out = {r.source: r for r in q_mix_budget_waterfill(spark, str(src)).collect()}
    assert set(out) == {"sA", "sB", "sC"}
    budget = out["sA"].budget
    total_alloc = sum(r.alloc_tokens for r in out.values())
    assert abs(total_alloc - budget) < 0.1, (total_alloc, budget)
    assert out["sA"].saturated and out["sA"].alloc_tokens == out["sA"].cap
    assert not out["sB"].saturated and not out["sC"].saturated
    # same threshold: alloc/w equal across unsaturated sources
    import math

    tb = out["sB"].alloc_tokens / math.sqrt(out["sB"].cap)
    tc = out["sC"].alloc_tokens / math.sqrt(out["sC"].cap)
    assert abs(tb - tc) < 1e-2, (tb, tc)

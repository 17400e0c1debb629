"""Physical-plan assertions: the 100 TB-posture regression gate.

Correct results with a wrong plan (no pushdown, shuffled dim join,
full sort for top-k) would still pass the oracle tests but fall over
at scale — these tests pin the plan properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.operators import relational as R
from dfs_w_mapreduce_spark.plans.explain import (
    formatted_plan,
    has_pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02")
    )
    assert has_pushed_filters(df)


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    read = scan_read_schema(df)
    assert set(read) == {"l_orderkey", "l_quantity"}, read


def test_tpch_q1_prunes_and_pushes(spark, sf_dir):
    df = R.q_tpch_q1(spark, sf_dir)
    read = set(scan_read_schema(df))
    # 7 of 11 lineitem columns needed; scan must not read the rest
    assert "l_orderkey" not in read and "l_partkey" not in read, read
    assert has_pushed_filters(df)


def test_tpch_q3_broadcasts_customer(spark, sf_dir):
    df = R.q_tpch_q3(spark, sf_dir)
    assert uses_broadcast_join(df)


def test_tpch_q5_broadcasts_all_dims(spark, sf_dir):
    plan = formatted_plan(R.q_tpch_q5(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]


def test_global_topk_avoids_full_sort(spark, sf_dir):
    df = R.q_topk_global(spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_partial_aggregation_present(spark, sf_dir):
    # Map-side combine: two HashAggregate nodes (partial + final)
    # around the exchange — the combiner the reference lacks.
    plan = formatted_plan(R.q_tpch_q1(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_aqe_coalesces_tiny_shuffle(spark, sf_dir):
    """AQE must shrink the configured shuffle partitions down to the
    data's actual size: a 6-group aggregate shouldn't keep N
    near-empty post-shuffle partitions alive."""
    df = R.q_distinct_rows(spark, sf_dir)
    df.collect()  # run so AQE finalizes the plan
    final = df.rdd.getNumPartitions()
    configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert final < configured, (final, configured)


def test_approx_percentile_error_bound(spark, sf_dir):
    """The query computes the sketch-vs-exact bound in-query (that is
    what the oracle hash-checks); every group must be within
    tolerance, and the exact percentiles must agree with the
    standalone exact-percentile query."""
    rows = R.q_approx_percentiles(spark, sf_dir).collect()
    assert rows
    assert all(r.p50_within_tol and r.p99_within_tol for r in rows), rows
    exact = {
        r.o_orderstatus: (r.p50, r.p99)
        for r in R.q_percentiles(spark, sf_dir).collect()
    }
    for r in rows:
        assert (r.p50, r.p99) == exact[r.o_orderstatus]


def test_approx_distinct_error_bound(spark, sf_dir):
    """The query computes the HLL-vs-exact bound in-query; every group
    must be within tolerance and the exact counts must be true."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = R.q_approx_distinct(spark, sf_dir).collect()
    assert rows
    assert all(r.parts_within_tol and r.orders_within_tol for r in rows), rows
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.exact_parts == exact[r.l_returnflag]


def test_tpch_q9_broadcasts_dims_and_prunes(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators import tpch_extra as TX

    df = TX.q_tpch_q9(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    read = set(scan_read_schema(df))
    assert "l_orderkey" not in read and "l_tax" not in read, read


def test_tpch_q16_pushes_isin_filter(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators import tpch_extra as TX

    # p_size IN (...) and the <> filters must reach the part scan
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    assert has_pushed_filters(p)
    assert TX.q_tpch_q16(spark, sf_dir).count() > 0


def test_tpch_q21_limits_without_full_sort(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators import tpch_extra as TX

    plan = formatted_plan(TX.q_tpch_q21(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_pipeline_end_to_end_single_dag_no_cartesian(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators import pipeline as P

    plan = formatted_plan(P.q_pipeline_end_to_end(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2000]
    # two dedup hash-aggregations + the final rollup
    assert plan.count("HashAggregate") >= 4, plan[:2000]


def test_bloom_probe_join_pushes_prefilter_to_scan_side(spark, sf_dir):
    """The bloom membership predicate must run BEFORE the join (a
    Filter on the orders side under the join, not after it)."""
    from dfs_w_mapreduce_spark.operators import sketches as SK

    plan = formatted_plan(SK.q_bloom_probe_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    # the bloom tests appear as a Filter containing element_at over
    # the literal word array
    assert "element_at" in plan, plan[:1500]


def test_basket_lift_partial_aggregation(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators import analytics as AN

    plan = formatted_plan(AN.q_basket_lift(spark, sf_dir))
    assert plan.count("HashAggregate") >= 4, plan[:1500]
    assert "CartesianProduct" not in plan
    # top-N goes through the per-partition heap, never a global sort
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # a-priori item prune: the pair self-join input is semi-joined
    # against frequent items before pairing
    assert "LeftSemi" in plan, plan[:2000]


def test_rollup_hypertable_single_pass(spark, sf_dir):
    """All rollup resolutions from ONE scan: an Expand feeding a
    partial+final HashAggregate pair around exactly one Exchange."""
    from dfs_w_mapreduce_spark.operators import analytics as AN
    from dfs_w_mapreduce_spark.plans.explain import exchange_count

    df = AN.q_rollup_hypertable(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" in plan, plan[:1500]
    assert exchange_count(df) == 1, plan[:1500]


def test_rolling_user_features_one_shuffle(spark, sf_dir):
    """The RANGE-frame window computes both features over a single
    user_id shuffle; the scan reads only the needed columns."""
    from dfs_w_mapreduce_spark.operators import analytics as AN
    from dfs_w_mapreduce_spark.plans.explain import exchange_count

    df = AN.q_rolling_user_features(spark, sf_dir)
    assert exchange_count(df) == 1
    read = set(scan_read_schema(df))
    assert "props" not in read and "event_type" not in read, read


def test_gap_fill_spine_is_broadcast_not_shuffled(spark, sf_dir):
    """The generated hours spine and the distinct-types frame are tiny
    and must join by broadcast; no CartesianProduct of data frames."""
    from dfs_w_mapreduce_spark.operators import temporal as T

    plan = formatted_plan(T.q_gap_fill_locf(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_mix_temperature_broadcasts_rates(spark, sf_dir):
    """The 5-row rate table broadcasts onto the corpus scan — the
    corpus is never shuffled to meet it."""
    from dfs_w_mapreduce_spark.operators import pipeline as P

    plan = formatted_plan(P.q_mix_temperature(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_embedding_lsh_pairs_join_on_bucket(spark, sf_dir):
    """The pair join is keyed on the LSH bucket (an equi-join), never
    a cartesian over the vectors."""
    from dfs_w_mapreduce_spark.operators import dedup as D

    plan = formatted_plan(D.q_dedup_embedding_pairs_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2000]


def test_dup_ngram_spans_prunes_and_no_pair_join(spark, sf_dir):
    """The span detector must read only (doc_id, text) and never form
    a doc-pair join — its cost is O(corpus tokens) by construction."""
    from dfs_w_mapreduce_spark.operators import corpus as C

    df = C.q_dup_ngram_spans(spark, sf_dir)
    read = set(scan_read_schema(df))
    assert read == {"doc_id", "text"}, read
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_merge_both_sides_share_user_partitioning(spark, sf_dir):
    """Latest-per-key reductions and the merge join are all keyed on
    user_id — the full-outer join must be an equi-join (sort-merge or
    hash), never nested-loop."""
    from dfs_w_mapreduce_spark.operators import relational as RR

    plan = formatted_plan(RR.q_cdc_merge_apply(spark, sf_dir))
    assert "FullOuter" in plan.replace(" ", ""), plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_waterfill_corpus_work_is_one_aggregate(spark, sf_dir):
    """Only the per-source token-count aggregate touches the corpus:
    the scan reads (source, text) alone, and every join after it is
    dimension-sized (broadcast)."""
    from dfs_w_mapreduce_spark.operators import pipeline as P

    df = P.q_mix_budget_waterfill(spark, sf_dir)
    read = set(scan_read_schema(df))
    assert read == {"source", "text"}, read


def test_kmv_topk_uses_window_group_limit(spark, sf_dir):
    """The per-source rank<=k must run under WindowGroupLimit so only
    k rows per group survive into the window sort — without it the
    full distinct-hash stream sorts per source."""
    from dfs_w_mapreduce_spark.operators.sketches import q_kmv_distinct

    plan = formatted_plan(q_kmv_distinct(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_kmeans_assignment_is_broadcast_hash_agg(spark, sf_dir):
    """Centroid assignment must broadcast the KxD centroid frame and
    argmin via hash aggregate (partial+final min-of-struct), never a
    per-vector sort window or a shuffled centroid join."""
    from dfs_w_mapreduce_spark.operators.similarity import q_kmeans_lloyd

    plan = formatted_plan(q_kmeans_lloyd(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "WindowExec" not in plan and "Window " not in plan


def test_placement_queries_scan_only_needed_columns(spark, sf_dir):
    """chunk_placement derives everything from (doc_id, text): the
    documents scan must prune the other columns."""
    from dfs_w_mapreduce_spark.operators.layout import q_chunk_placement

    read = set(scan_read_schema(q_chunk_placement(spark, sf_dir)))
    assert read == {"doc_id", "text"}, read


def test_heartbeat_horizon_is_broadcast(spark, sf_dir):
    """The one global scalar (fleet horizon) must broadcast; the
    per-node liveness window must NOT be a global (unpartitioned)
    window."""
    from dfs_w_mapreduce_spark.operators.layout import q_heartbeat_liveness

    plan = formatted_plan(q_heartbeat_liveness(spark, sf_dir))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_perceptron_round_is_partial_aggregate_only(spark, sf_dir):
    """Each perceptron round must be ONE partial+final aggregate over
    the feature scan with the weights as literals — no join, no
    window, no shuffle beyond the 1-row agg exchange. (The registry
    query's returned frame is a createDataFrame of driver rows, so the
    plan to assert is a single round's aggregate.)"""
    from dfs_w_mapreduce_spark.catalog import load_table
    from dfs_w_mapreduce_spark.operators.pipeline import _perceptron_feats

    feats = _perceptron_feats(load_table(spark, sf_dir, "documents"))
    mis = (F.col("y") * (F.lit(3) * F.col("b") + F.lit(5) * F.col("tc"))) <= 0
    rnd = feats.agg(F.sum(F.when(mis, F.col("y") * F.col("tc")).otherwise(F.lit(0))))
    plan = formatted_plan(rnd)
    assert "HashAggregate" in plan
    assert "Join" not in plan and "Window" not in plan
    read = set(scan_read_schema(rnd))
    assert read <= {"lang", "text", "n_chars"}, read


def test_matryoshka_single_corpus_join(spark, sf_dir):
    """All prefix dims score through ONE q x corpus join (2 parquet
    scans: query block + corpus) with one stacked explode — never a
    per-dim rescan. The recall rollup consumes the localCheckpointed
    dims x Q x K table, so the registry query's final plan reads the
    pinned RDD, not parquet."""
    from dfs_w_mapreduce_spark.operators.similarity import (
        _matryoshka_topk,
        q_embedding_matryoshka,
    )

    import re

    plan = formatted_plan(_matryoshka_topk(spark, sf_dir))
    # formatted explain lists each scan in the tree AND the details
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 2, n_scans
    assert "explode" in plan
    final = formatted_plan(q_embedding_matryoshka(spark, sf_dir))
    assert "Scan parquet" not in final


def test_resize_has_no_shuffle(spark, sf_dir):
    """Decode+resize is embarrassingly parallel: manifest scan ->
    Arrow map, zero exchanges."""
    from dfs_w_mapreduce_spark.operators.multimodal import q_multimodal_resize
    from dfs_w_mapreduce_spark.plans.explain import exchange_count

    df = q_multimodal_resize(spark, sf_dir)
    assert exchange_count(df) == 0
    assert set(scan_read_schema(df)) == {"doc_id", "n_chars"}


def test_semdedup_join_is_cluster_partitioned(spark, sf_dir):
    """The within-cluster self-join must be keyed on cid via the
    explicit repartition (AQE coalesce-to-1 defense), and the member/
    dropped rollups must aggregate on cid — no corpus-wide pairwise
    join appears anywhere (the join condition is cid equality)."""
    from dfs_w_mapreduce_spark.operators.similarity import q_semdedup_prune

    plan = formatted_plan(q_semdedup_prune(spark, sf_dir))
    assert "hashpartitioning(cid" in plan, plan[:3000]


def test_importance_resample_is_takeordered_with_broadcast_lr(spark, sf_dir):
    """DSIR's top-K must run as TakeOrderedAndProject (per-partition
    heaps, no global sort) and the 64-row log-ratio table must reach
    the per-doc sum via broadcast."""
    from dfs_w_mapreduce_spark.operators.corpus import q_importance_resample

    plan = formatted_plan(q_importance_resample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_gopher_battery_is_single_scan_single_rollup(spark, sf_dir):
    """The whole verdict battery (incl. the duplicate-2-gram mass via
    sorted-run walk) must be a projection + ONE aggregate on source:
    exactly one parquet scan and the only exchange is the rollup's."""
    import re

    from dfs_w_mapreduce_spark.operators.text_analysis import q_quality_gopher
    from dfs_w_mapreduce_spark.plans.explain import exchange_count

    df = q_quality_gopher(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    # r11: exactly TWO exchanges — the rollup's, plus the scan fan-out
    # (catalog.fan_out spreads the single-split fixture scan before
    # the per-doc battery; measured 4.87s -> 1.14s at sf0.1)
    assert exchange_count(df) == 2
    assert set(scan_read_schema(df)) >= {"source", "text"}


def test_collocations_single_corpus_pass_and_topk(spark, sf_dir):
    """Unigram counts, bigram counts, and both corpus totals must all
    derive from the ONE (token, next) aggregate — at runtime every
    branch above it is a ReusedExchange (one corpus scan) — and the
    final top-K must be TakeOrderedAndProject, not a global sort."""
    from dfs_w_mapreduce_spark.operators.text_analysis import q_text_collocations

    df = q_text_collocations(spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 3, executed[:3000]


def test_entropy_all_row_reuses_term_counts(spark, sf_dir):
    """The ALL row must re-aggregate the (source, term) counts, not
    rescan the corpus: the tc exchange is reused at runtime."""
    from dfs_w_mapreduce_spark.operators.text_analysis import q_text_entropy

    df = q_text_entropy(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed[:3000]


def test_cms_probe_joins_broadcast_sketch(spark, sf_dir):
    """The 512-cell sketch is bounded by construction and must reach
    the probe side via broadcast; the sketch build itself must be a
    partial+final aggregate (map-side combine on the bounded cell
    domain)."""
    from dfs_w_mapreduce_spark.operators.sketches import q_cms_sketch

    df = q_cms_sketch(spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert "partial_count" in plan or "HashAggregate" in plan


def test_ts_autocorr_spine_is_generated_not_scanned(spark, sf_dir):
    """The fact table must be scanned with only (ts, event_type) and
    the day spine must come from sequence+explode (no extra fact
    scan feeding the spine beyond the min/max bounds row)."""
    from dfs_w_mapreduce_spark.operators.analytics import q_ts_autocorr

    df = q_ts_autocorr(spark, sf_dir)
    assert set(scan_read_schema(df)) == {"ts", "event_type"}
    assert "explode" in formatted_plan(df)


def test_sample_balanced_window_is_label_partitioned(spark, sf_dir):
    """Per-label rank must run under a label-partitioned window (no
    global sort) and the min-class-size scalar must broadcast."""
    from dfs_w_mapreduce_spark.operators.pipeline import q_sample_balanced

    plan = formatted_plan(q_sample_balanced(spark, sf_dir))
    assert "hashpartitioning(label" in plan, plan[:3000]
    assert "BroadcastExchange" in plan


def test_anomaly_seasonal_baseline_broadcasts_and_prunes(spark, sf_dir):
    """The (type, hour) baseline is 24*|types| rows and must reach the
    cells via broadcast; the fact scan reads only (ts, event_type)."""
    from dfs_w_mapreduce_spark.operators.analytics import q_anomaly_seasonal

    df = q_anomaly_seasonal(spark, sf_dir)
    assert uses_broadcast_join(df)
    assert set(scan_read_schema(df)) == {"ts", "event_type"}


def test_dedup_containment_keeps_ngram_oom_guards(spark, sf_dir):
    """The shared co-occurrence core must keep both OOM guards: the
    shuffled-hash join (never broadcast the exploded corpus) and the
    pre-aggregation pair repartition."""
    from dfs_w_mapreduce_spark.operators.dedup import q_dedup_containment

    plan = formatted_plan(q_dedup_containment(spark, sf_dir))
    assert "ShuffledHashJoin" in plan, plan[:2000]
    assert "hashpartitioning(doc_a" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_bigram_kn_broadcasts_vocab_frames(spark, sf_dir):
    """Prefix counts, continuation counts, and the bigram-type scalar
    are vocabulary-sized and must broadcast; only the distinct-bigram
    frame shuffle-joins the occurrences."""
    from dfs_w_mapreduce_spark.operators.corpus import q_text_bigram_kn

    plan = formatted_plan(q_text_bigram_kn(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 3, plan[:2500]
    assert "CartesianProduct" not in plan


def test_keyphrases_islands_partition_by_doc_and_topk(spark, sf_dir):
    """The islands window must partition by doc_id (never a global
    window) and the final top-15 must be TakeOrderedAndProject."""
    from dfs_w_mapreduce_spark.operators.text_analysis import q_text_keyphrases

    plan = formatted_plan(q_text_keyphrases(spark, sf_dir))
    assert "hashpartitioning(doc_id" in plan, plan[:2500]
    assert "TakeOrderedAndProject" in plan

"""Central query registry.

Every operator the engine implements is exposed as a named
:class:`QuerySpec`: a ``(spark, sf_dir) -> DataFrame`` callable plus
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result on the same parquet fixtures.  This is the judge-checkable
inventory (SURVEY.md §2): ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry, and the local
pytest oracle-parity harness runs the identical comparison the driver
runs (row count + schema + order-insensitive value hash).

Column-name contract: every computed/aggregate column is aliased
identically in the Spark query and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => driver's weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


# The round driver verifies the FIRST 50 registry entries per round.
# Rotation policy: (a) queries whose implementation changed since
# their last green driver row come first (a stale green row must not
# outlive the code it verified), then (b) brand-new queries from this
# round, then (c) the never-driver-verified backlog in registry order
# (116 names after r01-r03 banked 96 green rows). Stable green
# queries fall to the back; the local mimic re-checks ALL queries at
# sf0.01 and sf0.1 every round regardless of this order.
DRIVER_FRONT: tuple[str, ...] = (
    # (a) re-verify: implementation changed in round 4 (adaptive
    # banded embedding-LSH rewired these; green rows are from the
    # fixed-16-bucket era)
    "dedup_embedding_pairs_lsh", "dedup_embedding_clusters",
    "knn_lsh_bucketed",
    # (b) new in round 4 — inserted here as they are added
    "mr_user_job", "minhash_band_sweep", "dedup_keep_best",
    "stream_upsert_live", "quality_threshold_sweep", "join_skew_aqe",
    "dup_ngram_spans", "langid_confusion", "cdc_merge_apply",
    "mix_budget_waterfill", "dedup_span_apply", "stream_dedup_incremental_live",
    "chunk_corruption_recovery", "ewma_user",
    # (c) never driver-verified, registry-relative order (the round-3
    # block first, per VERDICT r3 item 3)
    "gap_fill_locf", "rollup_hypertable", "winsorize", "mix_temperature",
    "chunk_prune_stats", "text_bigram_lm", "attribution_last_touch",
    "columnar_encoding_stats", "join_dpp", "rolling_user_features",
    "exchange_reuse", "set_ops_all", "join_null_safe", "agg_filter",
    "watermark_lateness", "knn_graph", "histogram_fixed_width",
    "bootstrap_ci", "dedup_apply_embedding", "cumulative_distinct_users",
    "path_3grams", "pit_training_join", "grouped_linear_fit",
    "tfidf_cosine_pairs", "sink_partition_overwrite", "mr_job_chain",
    "dedup_clusters_incremental", "ab_test_ttest",
    "mr_map_positional", "multimodal_decode", "stream_dedup_live",
    "sink_csv_roundtrip", "sink_json_roundtrip", "sink_partitioned",
    "graph_pagerank", "funnel_stages", "cohort_retention",
    "text_repetition", "text_pii_redact",
    "embedding_pool", "embedding_quantize", "vocab_coverage",
    "scd2_build", "profile_table",
    "anomaly_zscore", "stream_file_sink_live",
    "source_chunked_scan", "mr_map_udtf", "stream_json_variant",
    "incremental_agg", "value_histogram", "dq_constraints",
    "sample_stratified", "stream_stateful_live", "safe_arithmetic",
    "hierarchy_closure", "cogroup_pandas",
    "rfm_segments", "funnel_time_to_convert", "wow_change", "basket_lift",
    "latency_bands", "skyline_pareto", "user_streaks", "event_transitions",
    "anomaly_mad", "mr_map_arrow", "udaf_grouped_agg", "scd2_asof_lookup",
    "tpch_q2", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q15", "tpch_q16",
    "tpch_q17", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "asof_join_forward", "dedup_incremental", "minhash_estimate",
    "heavy_hitters", "rrf_fusion", "substring_winnow", "kl_divergence",
    "text_perplexity", "chisq_independence", "graph_triangles",
    "knn_filtered", "ann_recall", "knn_pq", "hll_union",
    "bloom_probe_join", "lateral_topk", "recursive_cte",
    "text_line_dedup", "bm25_search", "pack_sequences",
    "split_train_val_test", "tokenize_encode", "contrastive_pairs",
    "pipeline_end_to_end", "zorder_layout", "join_bucketed",
    "compact_chunks", "sink_xml_roundtrip", "sink_orc_roundtrip",
    "source_schema_evolution", "sink_chunked_roundtrip",
    "stream_session_dynamic", "stream_sliding_live", "stream_session_live",
    "stream_wmdedup_live", "stream_join_live",
)


def collect() -> dict[str, QuerySpec]:
    """Assemble the full registry from every operator module."""
    from dfs_w_mapreduce_spark.jobs import specs as job_specs
    from dfs_w_mapreduce_spark.operators import mapreduce
    from dfs_w_mapreduce_spark.operators import admin
    from dfs_w_mapreduce_spark.operators import analytics
    from dfs_w_mapreduce_spark.operators import relational
    from dfs_w_mapreduce_spark.operators import temporal
    from dfs_w_mapreduce_spark.operators import tpch_extra
    from dfs_w_mapreduce_spark.operators import corpus
    from dfs_w_mapreduce_spark.operators import dedup
    from dfs_w_mapreduce_spark.operators import similarity
    from dfs_w_mapreduce_spark.operators import sketches
    from dfs_w_mapreduce_spark.operators import sqlplus
    from dfs_w_mapreduce_spark.operators import text_analysis
    from dfs_w_mapreduce_spark.operators import multimodal
    from dfs_w_mapreduce_spark.operators import pipeline
    from dfs_w_mapreduce_spark.operators import layout
    from dfs_w_mapreduce_spark.sources import roundtrip
    from dfs_w_mapreduce_spark.streaming import windows as streaming_windows

    registry: dict[str, QuerySpec] = {}
    for module in (
        job_specs,
        admin,
        analytics,
        mapreduce,
        relational,
        tpch_extra,
        temporal,
        dedup,
        corpus,
        similarity,
        sketches,
        sqlplus,
        text_analysis,
        multimodal,
        pipeline,
        layout,
        roundtrip,
        streaming_windows,
    ):
        for spec in module.specs():
            if spec.name in registry:
                raise ValueError(f"duplicate query name {spec.name!r}")
            registry[spec.name] = spec
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_FRONT:
        if name not in registry:
            raise KeyError(f"DRIVER_FRONT names unknown query {name!r}")
        ordered[name] = registry[name]
    for name, spec in registry.items():
        ordered.setdefault(name, spec)
    return ordered

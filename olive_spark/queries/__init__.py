"""Declared query surface: name → (callable(spark, sf_dir) -> DataFrame,
oracle SQL | None). See SURVEY.md §2.7 for the capability each exercises.

Output contract: every registered query's final projection casts
DecimalType columns to double.  Exact money math still happens on
decimals *inside* each query (see relational.py); the terminal cast only
normalizes the output representation, because the driver's correctness
gate compares pandas frames — Spark ``toPandas()`` yields
``decimal.Decimal`` objects while DuckDB's ``.df()`` yields float64 for
DECIMAL/HUGEINT, and ``Decimal('137431.00')`` vs ``137431.0`` hash
differently despite being the same number (the r2/r3 scoreboard's 17
"hash-fail" rows were exactly this).  Decimal→double is the identical
correctly-rounded IEEE conversion in both engines, so the hashes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DecimalType

from olive_spark.queries.llm import QUERIES as _LLM
from olive_spark.queries.pipeline import QUERIES as _PIPE
from olive_spark.queries.relational import QUERIES as _REL
from olive_spark.queries.relational2 import QUERIES as _REL2
from olive_spark.queries.streaming_q import QUERIES as _STREAM
from olive_spark.queries.tpch import QUERIES as _TPCH
from olive_spark.queries.tpch2 import QUERIES as _TPCH2


def _normalize_decimals(df: DataFrame) -> DataFrame:
    """Cast top-level DecimalType output columns to double (exact math
    upstream stays decimal; only the output representation changes)."""
    if not any(isinstance(f.dataType, DecimalType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def _wrap(fn):
    def run(spark, sf_dir: str) -> DataFrame:
        return _normalize_decimals(fn(spark, sf_dir))

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    return run


_RAW: dict[str, tuple] = {
    **_REL, **_REL2, **_TPCH, **_TPCH2, **_LLM, **_PIPE, **_STREAM,
}

# Driver coverage window: the correctness gate checks the FIRST 50
# registry entries.  Round-8 rotation (VERDICT r7 task #8): cumulative
# coverage is complete (every registry query has appeared in some
# driver CORRECTNESS window, r2–r7), so the window now leads with the
# 25 r8-new queries (never driver-checked; local driver_check MATCH /
# rows-only-sane), re-checks the 10 r7-new queries that have appeared
# exactly once, keeps the regression canary, and fills to 50 with the
# longest-unchecked entries — the r04/r05-era windows, last checked 3-4
# rounds ago — keeping ≥1 per query family (audited: 15 families in
# the first 50).  Everything stays registered; entries beyond 50 keep
# bench/pytest coverage.
_ORDER = [
    # proven regression canary (format round-trip, r02–r07 green)
    "scan_roundtrip_lineitem",
    # --- new in r8 (never driver-checked) ---
    "scan_after_merge_upsert",     # r8: MERGE INTO copy-on-write parity
    "scan_merge_time_travel",      # r8: pre-merge snapshot still exact
    "scan_merge_partitioned",      # r8: hive layout survives MERGE/DELETE
    "scan_merge_cdc_tombstones",   # r8: sequenced WHEN-MATCHED-DELETE
    "mm_decode_png_real",          # r8: real PNG decode, exact oracle
    "mm_audio_wav_real",           # r8: real WAV decode, exact oracle
    "llm_similarity_ivf_persisted",  # r8: ANN from a persisted index (rows-only)
    "stream_merge_upsert",         # r8: streaming CDC latest-wins MERGE
    "scan_merge_conditional_evolve",  # r8: WHEN-MATCHED-AND + add-column evolution
    "scan_changes_feed",           # r8: CDF — net row changes between snapshots
    "llm_domain_cap",              # r8: skew-safe per-domain quota cap
    "scan_changes_by_commit",      # r8: per-commit CDF granularity
    "mm_phash_pairs",              # r8: DCT pHash + band-blocked pairs (rows-only)
    "ts_anomaly_zscore",           # r8: rolling z-score outliers, bounded frame
    "llm_word_entropy",            # r8: per-doc Shannon word entropy deciles
    "scan_merge_conditional_delete",  # r8: WHEN-MATCHED-AND-DELETE leg
    "scan_incremental_matview",    # r8: delta-fold continuous aggregate
    "llm_neardup_incremental",     # r8: persisted LSH index probe (rows-only)
    "llm_keyword_search",          # r8: inverted-index exact term search
    "llm_bm25_search",             # r8: BM25 ranking off the same index
    "stream_matview",              # r8: per-epoch continuous aggregate
    "scan_expectations_gate",      # r8: DLT-style gate + quarantine sidecar
    "llm_graph_pagerank",          # r8: power-iteration authority (rows-only)
    "scan_after_update_where",     # r8: predicate UPDATE copy-on-write parity
    "scan_after_restore",          # r8: RESTORE TO VERSION, then append
    "stream_cdc_pump",             # r8: cursor-resumed per-commit CDC delivery
    "scan_after_drop_column",      # r8: metadata-only DROP COLUMN + append
    "llm_unigram_lm_score",        # r8: corpus-unigram LM curation scoring
    "scan_hidden_partition_pruning",  # r8: days(ts) hidden partitioning
    "scan_bucket_partition_pruning",  # r8: bucket(8, user_id) pmod pruning
    "scan_merge_hidden_partition",    # r9: MERGE+DELETE on days(ts) layout
    "scan_truncate_partition_pruning",  # r9: truncate(16, user_id) ranges
    "scan_after_respec",              # r9: partition-spec evolution + mutate
    "scan_after_rename_column",       # r9: metadata-only RENAME COLUMN
    "scan_table_by_name",             # r9: register_table + plain SQL
    "llm_train_split",             # r8: engine-portable seeded hash split
    # --- r7-new, driver-checked exactly once (r07) ---
    "llm_pack_sequences_sharded",  # r7: partition-wise packing
    "llm_decontaminate_ngram",     # r7: GPT-3-style n-gram overlap
    "llm_dedup_lines",             # r7: intra-doc line dedup
    "llm_boilerplate_lines",       # r7: cross-doc frequent-line removal
    "ts_resample_interpolate",     # r7: gapfill linear interpolation
    "llm_dedup_clusters_star",     # r7: O(log n) large/small-star CC
    "join_fuzzy_names",            # r7: symmetric-delete fuzzy join
    "scan_table_checksum",         # r7: order-independent content sum
    "scan_time_travel",            # r7: snapshot-log versioned read
    "stream_snapshot_tail",        # r7: startingSnapshot stream handoff
    # --- longest-unchecked: r04/r05-window entries (≥1 per family) ---
    "types_unsigned_time",
    "agg_groupby_sum",
    "agg_approx_sketches",         # rows-only (sketch estimates)
    "join_hash_orders_customer",
    "join_broadcast_dims",
    "join_skew_salted",
    "window_sessionize",
    "dedup_latest_per_key",
    "ts_resample_locf",
    "events_window_funnel",
    "scalar_json_events",
    "setop_union_except",
    "subquery_correlated_scalar",
    "tpch_q3_shipping",
    # ---- beyond the 50-entry driver window (the r8-new additions
    # above displaced these from the checked first 50; all were green
    # in earlier windows and keep bench/pytest coverage) ----
    "agg_cube_events",
    "agg_rollup",
    "agg_distinct",
    "join_semi_anti",
    "join_range_events",
    "join_asof_event_order",
    "window_rank_events",
    "agg_grouping_sets",
    "events_cohort_retention",
    "tpch_q9_product_revenue",
    "tpch_q21_waiting_orders",
    "llm_dedup_exact",
    "llm_dedup_minhash",           # rows-only (LSH banding)
    "llm_dedup_clusters",
    "llm_similarity_topk",
    "llm_contamination",
    "llm_curation_pipeline",
    "llm_text_stats",
    "mm_image_resize",
    "stream_window_counts",
    # r07-window entries (all green r07)
    "llm_dedup_incremental",
    "llm_token_budget_mix",
    "stream_incremental_dedup",
    "llm_gopher_rules",
    "llm_chunk_documents",
    "scan_bloom_pruning",
    "ts_ewma_events",
    "llm_pretrain_pipeline",
    "join_interval_overlap",
    "llm_dedup_simhash",
    "llm_dedup_ngram",
    "llm_dedup_embedding",
    "llm_dedup_semantic",
    "llm_similarity_ivf",
    "llm_similarity_pq",
    "window_ntile_percent",
    "window_lead_lag",
    "window_range_frame",
    "sort_limit_topk",
    "setop_intersect",
    "explode_embeddings",
    "scalar_functions",
    "scalar_array_functions",
    "scalar_map_functions",
    "scalar_datetime_functions",
    "scalar_string_advanced",
    "join_nested_loop",
    "subquery_in_uncorrelated",
    "tpch_q4_order_priority",
    "tpch_q6_revenue",
    "scan_projection_pruning",
    "scan_filter_pages",
    "scan_nulls_validity",
    "scan_nested_list",
    "scan_multi_table_chunk",
    "scan_partitioned_pruning",
    "dict_encode_fsb",
    "compression_codecs",
    "types_decimal_date",
    # r04/r05/r06 driver-green remainder
    "agg_pivot_status",
    "agg_stats_moments",
    "agg_collect_sorted",
    "join_full_outer",
    "null_handling",
    "reshape_unpivot",
    "agg_median_disc",
    "agg_histogram_buckets",
    "agg_conditional_bools",
    "agg_grouped_map_mad",
    "join_lateral_topn",
    "join_left_right_outer",
    "window_first_last",
    "scalar_hash_bitwise",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_ratio",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_suppliers",
    "tpch_q17_small_quantity",
    "tpch_q19_discounted_revenue",
    "tpch_q20_excess_shippers",
    "tpch_q22_global_sales",
    "llm_similarity_arrow",
    "llm_similarity_range",
    "llm_tfidf_topk",
    "llm_quality_score",
    "llm_lang_id",
    "llm_fingerprint",
    "llm_token_count",
    "llm_pii_redact",
    "llm_repetition_ratio",
    "llm_pack_sequences",
    "llm_stratified_sample",
    "llm_vocab_topk",
    "llm_ngram_topk",
    "llm_length_percentiles",
    "mm_decode_meta",
    "mm_frame_sample",
    "mm_audio_windows",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_static_join",
    "stream_user_totals",
    "stream_stream_join",
    "stream_dedup_counts",
    "stream_olive_sink",
    "window_running_sum",
    "tpch_q5_local_revenue",
    "tpch_q18_large_orders",
]

assert set(_ORDER) == set(_RAW), (
    sorted(set(_ORDER) ^ set(_RAW))
)

ALL_QUERIES: dict[str, tuple] = {
    name: (_wrap(_RAW[name][0]), _RAW[name][1]) for name in _ORDER
}

"""Operator inventory — importing this package registers every query.

Modules map to SURVEY.md §2 rows:
  wordcount / string_match  — the reference's two flagship jobs (§2.A)
  relational                — joins/aggs/setops/limits the reference lacks (§2.B)
  subqueries                — EXISTS / scalar-subquery / OR-predicate shapes (§2.B)
  reshape                   — pivot/unpivot, date arithmetic, moment stats (§2.B)
  analytic                  — window functions (§2.B)
  events                    — JSON + time-window (tumbling/sliding/session) (§2.B/§2.C)
  dedup                     — exact + MinHash/SimHash/Jaccard/embedding (§2.C)
  similarity                — brute-force + LSH ANN over embeddings (§2.C)
  text_analysis             — lang-id, quality, token counts, fingerprints (§2.C)
  multimodal                — binary-column decode plumbing (§2.C)
"""

from mapreduce_sm_spark.operators import (  # noqa: F401
    wordcount,
    string_match,
    relational,
    subqueries,
    reshape,
    olap,
    scale,
    arrays,
    strings,
    sampling,
    analytic,
    events,
    tpch_extra,
    streaming_ops,
    joins_advanced,
    udf_surface,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    behavioral,
    cdc,
    language_model,
    corpus_ops,
)

from mapreduce_sm_spark.registry import REGISTRY

# Round-4 driver window: the external correctness gate verifies the first 50
# entries of queries(). Priority order (the r03 verdict's own framework —
# never-driver-verified first): (1) the two queries that have NEVER been
# driver-green (both broken in r03, both fixed this round), (2) the twelve
# operators ADDED this round (no driver row exists yet), (3) every query
# whose code or source path changed this round (funnel nullif, LSH join
# aliasing, the streaming-source schema rework), (4) the queries the r03
# sample skipped, oldest driver evidence first (the r01-era set). The
# remainder that don't fit the window have green r01/r02 driver rows and
# stay covered by tests/test_oracle_parity.py (sf0.001) and the committed
# VERIFY_LOCAL_r04.txt sf0.01 log (exact-float compare).
REGISTRY.set_front(
    (
        # --- never driver-green; fixed this round ---
        "sessionize_events",
        "anomaly_zscore_events",
        # --- new this round: no driver row exists yet ---
        "quality_prune_per_source",
        "stratified_sample_quota",
        "inverted_index_topdocs",
        "dedup_cluster_size_histogram",
        "corpus_curation_report",
        "cogrouped_asof_gap",
        "dedup_events_time_window",
        "pmi_collocations",
        "winsorized_price_stats",
        "embedding_norm_quantiles",
        "lateral_top2_orders",
        "recursive_month_spine",
        "variant_props_stats",
        "profile_orders_columns",
        "cdc_merge_audit",
        "fuzzy_source_names",
        # --- code changed this round: re-verify under the driver ---
        "funnel_view_click_purchase",
        "ann_lsh_topk",
        "stream_dedup_events",
        "stream_stateful_user_totals",
        "stream_interval_join",
        # --- not sampled in r03; last driver row is r01 ---
        "agg_distinct_segments",
        "array_functions_surface",
        "collect_set_statuses",
        "cube_orders",
        "dataset_mixture_weights",
        "date_arithmetic_orders",
        "exists_discounted_orders",
        "grouping_sets_orders",
        "histogram_event_values",
        "join_anti_no_orders",
        "join_outer_order_counts",
        "join_semi_big_spenders",
        "json_schema_parse_events",
        "mode_event_type_per_user",
        "null_semantics_outer",
        "or_predicate_revenue",
        "percentiles_order_price",
        "pivot_orders_by_priority",
        "promo_revenue_ratio",
        "q10_top_lost_revenue",
        "q11_revenue_concentration",
        "q15_top_supplier",
        "q18_large_quantity_orders",
        "q1_pricing_summary",
        "q2_min_per_group",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
    )
)

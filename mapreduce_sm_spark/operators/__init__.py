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
  graph                     — triangle counting, integer PageRank (§2.C r05)
  sketches                  — HLL estimates + exact mergeable bitmaps (§2.C r05)
  formats                   — schema evolution, formatted-number round trip (§2.B r05)
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
    formats,
    graph,
    sketches,
    sharding,
    tokenizer,
)

from mapreduce_sm_spark.registry import REGISTRY

# Round-16 driver window: the external correctness gate verifies the first
# 50 entries of queries(). Entering this round the staleness histogram of
# freshest driver rows (CORRECTNESS_r01..r15 union) is 2 x r11 (the
# carries named in the r15 window comment), 50 x r12, 50 x r13,
# 50 x r14, 50 x r15, plus the 5 late-r15 registrations that have
# never been driver-seen. That is 57 candidates for 50 slots.
# Composition (2 + 5 + 43 = 50), exactly the order VERDICT r15 item 1
# mandates:
# (1) the 2 named r11 carries, first by promise:
#     scalar_functions, array_functions_surface.
# (2) the 5 late-r15 registrations, never driver-seen, in the order the
#     r15 window comment assigned them:
#     stream_gopher_gate_equality, exact_ngram_decontamination,
#     stream_decontamination_equality, semantic_decontamination_split,
#     source_unigram_divergence.
# (3) 43 of the 50 rows whose freshest driver row is r12. The seven
#     r12 rows that CARRY TO R17 (named per the carry-over
#     convention, chosen for lowest aging risk — all are pure
#     row-local expression / deterministic-kernel queries with dense
#     per-function pytest coverage and no shuffle or plan-choice
#     risk, unlike the r12 maintenance laws
#     (dedup_minhash_compaction, stream_minhash_index_equality),
#     which VERDICT r15 item 5 pins in-window):
#     string_functions_extended, try_arithmetic_surface,
#     mask_pii_shapes, variant_props_stats, multimodal_image_meta,
#     multimodal_audio_meta, multimodal_frame_sample.
# After this window the histogram is: 7 x r12 (the named carries),
# 50 x r13, 50 x r14, 50 x r15, 50 x r16 — no driver-seen query
# predates r12, and every registered query remains covered every
# pytest run by tests/test_oracle_parity.py (sf0.001) and by the
# sf0.01 pandas-path local gate. Any registration landing in r16
# AFTER this window is frozen gets a named r17-front slot here (the
# r14/r15 convention) rather than displacing this composition.
# r16 late registrations → r17 front, after the seven named r12
# carries, in registration order: ann_filtered_topk,
# dsir_importance_selection, length_bucket_padding_stats,
# boilerplate_prefix_stats, dedup_containment_pairs,
# embedding_dimension_stats, langid_confusion_matrix,
# winnowing_fingerprint_pairs, quality_classifier_gate,
# temperature_mixture_weights, ngram_novelty_curve,
# knn_label_noise_audit, label_centroid_drift,
# stream_quality_classifier_equality, cluster_aware_split_audit,
# token_budget_allocation, readability_scores, kmv_anotb_difference.
REGISTRY.set_front(
    (
        # --- (1) the 2 named r11 carries ---
        "scalar_functions",
        "array_functions_surface",
        # --- (2) the 5 late-r15 registrations, never driver-seen ---
        "stream_gopher_gate_equality",
        "exact_ngram_decontamination",
        "stream_decontamination_equality",
        "semantic_decontamination_split",
        "source_unigram_divergence",
        # --- (3) 43 of the 50 r12-freshest rows (carries named above) ---
        "bitmap_distinct_users",
        "bucketed_join_sales_by_segment",
        "calendar_spine_orders",
        "cdc_merge_audit",
        "cogrouped_asof_gap",
        "dedup_connected_components",
        "dedup_events_time_window",
        "dedup_minhash_compaction",
        "dedup_minhash_incremental",
        "dedup_simhash60_pairs",
        "doc_repetition_stats",
        "filter_clause_group_by_all",
        "grouped_map_top2_docs",
        "listagg_order_statuses",
        "merge_upsert_orders",
        "mg_heavy_hitters",
        "parameterized_sql_revenue",
        "partition_pruned_event_stats",
        "q12_late_shipment_priority",
        "q20_volume_suppliers",
        "q21_waiting_suppliers",
        "q22_dormant_customers",
        "q4_order_priority",
        "q8_market_share",
        "q9_product_profit",
        "quality_prune_per_source",
        "sample_documents_hashmod",
        "setops_multiset",
        "setops_nations",
        "sql_interface_udf",
        "sql_scripting_rollup",
        "stream_interval_join",
        "stream_minhash_index_equality",
        "stream_stateful_user_totals",
        "tf_cosine_pairs_prefix",
        "topk_orders",
        "train_val_test_split",
        "udtf_sentence_split",
        "union_by_name_contacts",
        "unpivot_lineitem_measures",
        "window_moving_avg",
        "window_time_range_frame",
        "winsorized_price_stats",
    )
)

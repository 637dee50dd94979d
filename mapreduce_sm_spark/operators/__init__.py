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
)

from mapreduce_sm_spark.registry import REGISTRY

# Round-5 driver window: the external correctness gate verifies the first 50
# entries of queries(). Priority order (the verdict framework — weakest
# evidence first): (1) the five queries that have NEVER been driver-green,
# all reworked this round onto exact integer boundaries (commit 24aa722 —
# no emitted value or predicate depends on double-ulp agreement anymore);
# (2) every other query whose EMISSIONS changed in the r05 boundary sweep
# (quarter-cent order-statistic quantiles, exact-rational PMI, raw
# bit-identical doubles instead of scaled rounds, integer-cents frames and
# thresholds — PLANS.md r05): their last driver green predates the new
# output shape, so they now carry the weakest evidence after the five;
# (3) the queries whose newest driver evidence is r01 — three rounds of
# code churn ago; (4) the nine queries ADDED this round (never
# driver-seen), filling the window to 50 (three r01 rows —
# setops_nations, union_by_name_contacts, sample_documents_hashmod,
# the least drift-exposed integer/string queries in the r01 group —
# yield their slots).
# Dropped vs the pre-sweep window to make room: unchanged r02 rows
# (q4/q6/q7/q8/q9/q22, the streaming-window batch twins) and unchanged
# r03 flagships (wordcount/string_match parity is binary-tested in
# tests/test_reference_binary_parity.py; join_asof, merge_upsert,
# dedup_connected_components are r03-green and untouched since). All
# out-of-window rows remain covered by tests/test_oracle_parity.py
# (sf0.001) and VERIFY_LOCAL_r05.txt (sf0.01, exact hash, full registry).
REGISTRY.set_front(
    (
        # --- never driver-green; boundary-reworked this round ---
        "anomaly_zscore_events",
        "dedup_events_time_window",
        "quality_prune_per_source",
        "winsorized_price_stats",
        "variant_props_stats",
        # --- emissions changed in the r05 sweep; driver evidence stale ---
        "percentiles_order_price",
        "embedding_norm_quantiles",
        "pmi_collocations",
        "promo_revenue_ratio",
        "udaf_weighted_avg",
        "array_functions_surface",
        "embedding_similar_pairs",
        "ann_ivf_recall_check",
        "multimodal_resize_features",
        "ann_lsh_topk",
        "ann_bruteforce_topk",
        "text_quality_stats",
        "doc_repetition_stats",
        "tfidf_top_terms",
        "corpus_curation_report",
        "histogram_event_values",
        "window_lag_lead_events",
        "window_moving_avg",
        "q17_small_quantity_revenue",
        "scalar_functions",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "corpus_near_dedup",
        # --- newest driver evidence is r01 (the drift-exposed members:
        # double/decimal emissions; the r01 rows with pure integer/string
        # passthrough outputs — calendar_spine_orders, setops_multiset,
        # string_functions_extended, topk_orders, train_val_test_split,
        # unpivot_lineitem_measures — yield their slots to the six
        # never-driver-seen capability rows below, same trade the window
        # already made for the first nine additions) ---
        "rollup_lineitem",
        "scalar_subquery_part_avg",
        "skew_salted_agg",
        "stats_moments_lineitem",
        "window_distribution_funcs",
        "window_rank_top_orders",
        "window_running_total",
        # --- NEW capability rows (never driver-seen): graph kernels,
        # collation grouping, stream-static enrichment, CSV round trip,
        # grouped applyInArrow — integer/exact emissions by construction ---
        "graph_triangle_count",
        "pagerank_supply_graph",
        "collation_token_counts",
        "stream_static_enrich",
        "csv_roundtrip_stats",
        "arrow_grouped_event_stats",
        # --- NEW this round (never driver-seen): sharding/chunking/packing,
        # skew diagnostics, real streaming session windows, z-order layout
        # stats — integer-domain emissions by construction. They displace
        # the unchanged r02 tail (json_extract_events, q12/q13/q16/q20/q21
        # — r02-green, untouched since; still covered by
        # tests/test_oracle_parity.py at sf0.001 and the local exact gate
        # at sf0.01).
        "chunk_documents_plan",
        "training_shard_manifest",
        "doc_length_deciles",
        "key_skew_diagnostics",
        "stream_session_windows",
        "zorder_bucket_stats",
        "custom_source_roundtrip",
        "arrow_doc_stats",
        "pipe_syntax_rollup",
    )
)

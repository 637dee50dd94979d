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
)

from mapreduce_sm_spark.registry import REGISTRY

# Round-3 driver window: the external correctness gate verifies the first 50
# entries of queries(). Leads with the 7 names the driver has NEVER
# green-lit (VERDICT r2 item 1): the five round-2 additions, the
# re-shaped multimodal_resize_features (now scalar-column output the
# driver's canonicalizer can hash), and the new ann_ivf_recall_check
# (the driver-checkable contract for the no-oracle IVF query).
# Next come the queries this round CHANGED (percentile rank-interval
# contract, Jaccard prefix rewrite, every fan_out caller), so any
# regression from the round-3 edits lands inside the verified window.
# The rest of the window re-verifies high-value r1/r2 greens; the full
# registry stays covered by tests/test_oracle_parity.py (sf0.001) and the
# committed tools/verify_local.py sf0.01 run.
REGISTRY.set_front(
    (
        # --- never driver-verified (rotation targets) ---
        "map_functions_surface",
        "stream_dedup_events",
        "corpus_clean_pipeline",
        "denylist_scrub_stats",
        "benchmark_contamination",
        "multimodal_resize_features",
        "ann_ivf_recall_check",
        "ann_ivf_topk",  # stays no-oracle; rows-only check recorded
        "dedup_exact_substring",  # new this round (Lee et al. substring dedup)
        "doc_repetition_stats",  # new this round (Gopher repetition filter)
        "multimodal_audio_meta",  # new this round (audio plumbing)
        "corpus_near_dedup",  # new this round (end-to-end near-dedup pipeline)
        # --- new in round 4: behavioral, CDC, and n-gram LM operators ---
        "sessionize_events",
        "funnel_view_click_purchase",
        "retention_cohorts_weekly",
        "anomaly_zscore_events",
        "merge_upsert_orders",
        "bigram_lm_counts",
        "zipf_token_stats",
        # --- changed this round: re-verify under the driver ---
        "approx_percentiles_lineitem",
        "dedup_ngram_jaccard",
        "wordcount",
        "string_match",
        "dedup_exact",
        "dedup_exact_normalized",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_minhash",
        "dedup_connected_components",
        "ann_bruteforce_topk",
        "ann_lsh_topk",
        "embedding_similar_pairs",
        "multimodal_image_meta",
        "multimodal_frame_sample",
        "text_quality_stats",
        "lang_id_heuristic",
        "token_count",
        "doc_fingerprint",
        "tfidf_top_terms",
        "corpus_source_rollup",
        "sequence_packing_plan",
        "posexplode_first_tokens",
        # --- high-value r1/r2 greens re-verified in the remaining slots ---
        "case_bucket_orders",
        "join_asof_events_orders",
        "join_range_value_bands",
        "udaf_weighted_avg",
        "grouped_map_top2_docs",
        "sql_interface_udf",
        "approx_distinct_users",
        "udtf_sentence_split",
        "json_extract_events",
        "tumbling_window_events",
        "sliding_window_events",
        "session_window_events",
        "stream_stateful_user_totals",
        "stream_interval_join",
        "window_time_range_frame",
        "q1_pricing_summary",
        "q9_product_profit",
        "q13_customer_distribution",
        "q21_waiting_suppliers",
        "q22_dormant_customers",
    )
)

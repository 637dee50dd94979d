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

# Round-13 driver window: the external correctness gate verifies the first
# 50 entries of queries(). The r12 window retired the r07 cohort; after it
# the staleness histogram of freshest driver rows was 34 x r08, 50 x r09,
# 50 x r11, 50 x r12. This window finishes the promised rotation
# (VERDICT r12 item 1). Composition (3 + 34 + 13 = 50):
# (1) the 3 queries NEW this round, never driver-seen:
#     dedup_semantic_embedding (VERDICT r12 item 2 — SemDeDup-style
#     embedding-space semantic dedup: k-means cells + probe-adjacent
#     assignment, cell-blocked exact-cosine pairs, audited per-doc
#     against the exact relation with an aggregate recall floor) and
#     dedup_connected_components60 (the CC rung swap: cluster resolution
#     over the 60-bit banded pairs — the 32-bit rung's x100 sitting died
#     on candidate-join disk spill, so the scale rung takes the slot)
#     and semantic_dedup_clusters (end-to-end embedding dedup with a full
#     value oracle: banded-LSH cosine pairs -> connected components ->
#     keeper per cluster).
# (2) ALL 34 rows whose freshest driver row is r08 (computed from the
#     CORRECTNESS_r01..r12 union) — after this window no registered
#     query's freshest driver row predates r09. Includes both headline
#     reference queries (wordcount, string_match) and the q6/q7/q13/q16
#     TPC-H spine.
# (3) the remaining 13 slots go to the riskiest-oracle r09 rows: the ANN
#     trio (bruteforce / LSH / IVF recall contract), the near-dedup deep
#     DAGs (corpus_near_dedup, minhash, ngram_jaccard, cluster-size
#     histogram), the triangle kernel, the stateful/sketch streaming trio,
#     the Arrow-UDAF surface, multimodal resize, and the KMV / Count-Min
#     sketches.
# Still out after this round: the 35 remaining r09 rows + the r11/r12
# cohorts — all covered every pytest run by tests/test_oracle_parity.py
# (sf0.001) and by the sf0.01 pandas-path local gate; the r09 remnant
# fronts in r14, together with the operators added late in r13 after
# this window was frozen (bpe_vocab_merges, bpe_token_stats,
# bpe_dict_compaction, doc_lm_surprisal, source_mixture_sample,
# stream_semantic_index_equality, lm_curation_report — never
# driver-seen, so they take r14 priority ahead of the r09 remnant).
REGISTRY.set_front(
    (
        # --- (1) new this round, never driver-seen ---
        "dedup_semantic_embedding",
        "dedup_connected_components60",
        "semantic_dedup_clusters",
        # --- (2) the complete r08 remnant (34 rows) ---
        "approx_distinct_users",
        "approx_percentiles_lineitem",
        "benchmark_contamination",
        "bigram_lm_counts",
        "case_bucket_orders",
        "corpus_clean_pipeline",
        "corpus_source_rollup",
        "dedup_exact",
        "dedup_exact_normalized",
        "dedup_exact_substring",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "denylist_scrub_stats",
        "doc_fingerprint",
        "hll_user_reach",
        "join_asof_events_orders",
        "join_range_value_bands",
        "json_extract_events",
        "lang_id_heuristic",
        "map_functions_surface",
        "posexplode_first_tokens",
        "q13_customer_distribution",
        "q16_part_supplier_variety",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "retention_cohorts_weekly",
        "sequence_packing_plan",
        "sessionize_events",
        "sliding_window_events",
        "string_match",
        "token_count",
        "tumbling_window_events",
        "wordcount",
        "zipf_token_stats",
        # --- (3) 13 riskiest-oracle r09 rows (countmin_token_freq and
        #     kmv_audience_overlap yielded their slots to the late new
        #     queries: both are re-probed every round by drift_probe, and
        #     stream_countmin_equality keeps the sketch family here) ---
        "ann_bruteforce_topk",
        "ann_ivf_recall_check",
        "ann_lsh_topk",
        "corpus_near_dedup",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "dedup_cluster_size_histogram",
        "graph_triangle_count",
        "stream_bloom_scrub_events",
        "stream_countmin_equality",
        "stream_session_windows",
        "udaf_weighted_avg",
        "multimodal_resize_features",
    )
)

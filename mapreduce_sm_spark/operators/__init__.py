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

# Round-8 driver window: the external correctness gate verifies the first 50
# entries of queries(). r07 went 49/50 green with every registered query
# driver-seen at least once, so this round is pure EVIDENCE ROTATION
# (VERDICT r07 items 2 and 7) plus the two rows whose emissions changed:
# (1) hll_user_reach — converted this round from rows-only to the
#     oracle-checkable contract form (exact distinct + engine-asserted
#     in-bound boolean); its first full rows+schema+hash driver row is
#     the round's primary deliverable (VERDICT item 1).
# (2) the queries NEW this round, none of which has ever had a driver
#     row: tf_cosine_pairs_prefix (VERDICT item 6 — the lossless L2AP
#     prefix rung, hash-identical to tf_cosine_pairs),
#     dedup_simhash60_pairs (the 60-bit SimHash scale rung; 1.7x wall
#     growth for 10x data vs the 32-bit rung's 12.9x, SCALING.md), and
#     mg_heavy_hitters (Misra-Gries frequency-sketch contract — the
#     fourth member of the sketch family), and dedup_minhash_incremental
#     (new-batch band-index probe — the production incremental-dedup
#     shape; oracle = the full pair query filtered to doc_b >= T).
# (3) all 7 rows last driver-seen in r02 (q6/q7/q13/q16 yielded their
#     slots in r07 and return as promised, plus the tumbling/sliding/
#     json_extract trio).
# (4) all 33 rows last driver-seen in r03 (ann_ivf_topk was deregistered
#     in r06 for the stronger ann_ivf_recall_check contract).
# (5) 8 of the 36 rows last driver-seen in r04, led by
#     stream_stateful_user_totals (the RocksDB transformWithState path —
#     never in a driver window, VERDICT item 7), then the most intricate
#     oracles (streaming joins, CDC, sessionization, cogrouped as-of).
# Dropped to make room: everything green in r06/r07 under its current
# output shape. Still out after this round: the 31 remaining r04 rows
# (q1_pricing_summary, json_schema_parse_events and
# funnel_view_click_purchase yielded their slots to the three
# late-round new queries — a never-driver-seen row outranks a
# stale-but-green one) — they rotate in r09 and stay covered by
# tests/test_oracle_parity.py (sf0.001) and the sf0.01 pandas-path
# local gate meanwhile.
REGISTRY.set_front(
    (
        # --- (1) emission changed: rows-only -> oracled contract ---
        "hll_user_reach",
        # --- (2) new this round ---
        "tf_cosine_pairs_prefix",
        "dedup_simhash60_pairs",
        "mg_heavy_hitters",
        "dedup_minhash_incremental",
        # --- (3) last driver-seen r02 ---
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q13_customer_distribution",
        "q16_part_supplier_variety",
        "tumbling_window_events",
        "sliding_window_events",
        "json_extract_events",
        # --- (4) last driver-seen r03 ---
        "wordcount",
        "string_match",
        "approx_distinct_users",
        "approx_percentiles_lineitem",
        "benchmark_contamination",
        "bigram_lm_counts",
        "case_bucket_orders",
        "corpus_clean_pipeline",
        "corpus_source_rollup",
        "dedup_connected_components",
        "dedup_exact",
        "dedup_exact_normalized",
        "dedup_exact_substring",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "denylist_scrub_stats",
        "doc_fingerprint",
        "grouped_map_top2_docs",
        "join_asof_events_orders",
        "join_range_value_bands",
        "lang_id_heuristic",
        "map_functions_surface",
        "merge_upsert_orders",
        "multimodal_audio_meta",
        "multimodal_frame_sample",
        "multimodal_image_meta",
        "posexplode_first_tokens",
        "retention_cohorts_weekly",
        "sequence_packing_plan",
        "sql_interface_udf",
        "token_count",
        "udtf_sentence_split",
        "zipf_token_stats",
        # --- (5) last driver-seen r04: RocksDB stateful first ---
        "stream_stateful_user_totals",
        "stream_interval_join",
        "cdc_merge_audit",
        "sessionize_events",
        "cogrouped_asof_gap",
    )
)

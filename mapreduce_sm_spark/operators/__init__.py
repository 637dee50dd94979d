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

# Round-7 driver window: the external correctness gate verifies the first 50
# entries of queries(). Priority order (weakest evidence first):
# (1) the 8 r6 hash-reds + the r6 ERR — every one root-caused to a DuckDB
#     HUGEINT output column that a pandas fetch renders as float64
#     (VERDICT r6) and fixed this round with oracle-side
#     CAST(... AS BIGINT) (plus the filterPushdown conf pinned inside the
#     refmr read path for the ERR). Their driver rows are the round's
#     primary deliverable.
# (2) the 2 queries whose EMISSIONS changed this round (decimal(18,2)
#     drift channel -> integer cents): stream_static_enrich (green r6 but
#     under the old output shape), stream_dedup_events.
# (3) the 17 r05 additions that have NEVER had a driver row, including
#     the two latent-HUGEINT oracles fixed this round
#     (try_arithmetic_surface, udtf_dynamic_kv).
# (4) the stalest remaining driver evidence: all 9 last-seen-r01 rows and
#     13 of the 16 last-seen-r02 rows (the full TPC-H residue +
#     session_window_events + window_time_range_frame).
# Dropped to make room: everything green in r06 under its CURRENT output
# shape (fresh evidence), the r03/r04 greens, and three r02 rows whose
# shapes are represented in-window (tumbling/sliding_window_events twin
# session_window_events; json_extract_events twins variant_props_stats).
# All out-of-window rows remain covered by tests/test_oracle_parity.py
# (sf0.001, pandas fetch path) and VERIFY_LOCAL_r07_pandas.txt (sf0.01,
# exact hash, full registry, driver-faithful pandas fetch).
REGISTRY.set_front(
    (
        # --- (1) r6 hash-reds, HUGEINT oracle outputs cast this round ---
        "dedup_events_time_window",
        "quality_prune_per_source",
        "winsorized_price_stats",
        "variant_props_stats",
        "doc_repetition_stats",
        "corpus_curation_report",
        "window_moving_avg",
        "pagerank_supply_graph",
        # --- (1) r6 ERR: conf now pinned at the refmr read site ---
        "custom_source_roundtrip",
        # --- (2) emissions changed this round (integer cents) ---
        "stream_static_enrich",
        "stream_dedup_events",
        # --- (3) never driver-seen r05 additions ---
        "try_arithmetic_surface",
        "udtf_dynamic_kv",
        "udtf_table_arg_reduce",
        "filter_clause_group_by_all",
        "listagg_order_statuses",
        "mask_pii_shapes",
        "xml_roundtrip_stats",
        "stream_sink_roundtrip",
        "scd2_point_in_time_join",
        "parameterized_sql_revenue",
        "pandas_api_rollup",
        "sql_scripting_rollup",
        "incremental_agg_maintenance",
        "schema_evolution_stats",
        "number_format_roundtrip",
        "hll_user_reach",
        "bitmap_distinct_users",
        # --- (4) stalest driver evidence: all of r01 ---
        "calendar_spine_orders",
        "sample_documents_hashmod",
        "setops_multiset",
        "setops_nations",
        "string_functions_extended",
        "topk_orders",
        "train_val_test_split",
        "union_by_name_contacts",
        "unpivot_lineitem_measures",
        # --- (4) NEW this round (never driver-seen): storage-layout round
        # trips, sparse cosine, edit-distance dedup — all with exact
        # integer emissions and pandas-path local-gate green ---
        "partition_pruned_event_stats",
        "bucketed_join_sales_by_segment",
        "tf_cosine_pairs",
        "dedup_edit_distance",
        # --- (5) stalest driver evidence: r02 TPC-H + window shapes
        # (q6/q7/q13/q16 yield their slots to the four new-capability
        # rows; all four remain covered by tests/test_oracle_parity.py and
        # the sf0.01 local gate, and rotate in next round) ---
        "q4_order_priority",
        "q8_market_share",
        "q9_product_profit",
        "q12_late_shipment_priority",
        "q20_volume_suppliers",
        "q21_waiting_suppliers",
        "q22_dormant_customers",
        "session_window_events",
        "window_time_range_frame",
    )
)

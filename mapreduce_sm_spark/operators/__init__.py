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

# Round-10 driver window: the external correctness gate verifies the first
# 50 entries of queries(). r09 finished the r04-stale rotation (histogram
# after r09: 29 x r06, 49 x r07, 50 x r08, 50 x r09 — no row older than
# r06); VERDICT r09 item 1 asks this round to front the full r06 remnant
# plus the oldest r07 rows. Composition:
# (1) the 4 queries NEW this round, never driver-seen (never-seen
#     outranks stale): dedup_minhash_persisted (VERDICT item 4 — the
#     band index's build->parquet->reload->probe cycle),
#     stream_bitmap_equality (item 6 — bitmap OR proven across RocksDB
#     micro-batches), quantile_sketch_order_price (item 7 — mergeable
#     bottom-k rank sketch, oracle replays the whole synopsis), and
#     stream_quantile_equality (the trilogy's third proven member:
#     bottom-k is a min-structure, streamed == batch bit-for-bit).
# (2) ALL 29 rows whose freshest driver row is r06 (the complete
#     remnant; VERDICT said 26 but three r06 rows that yielded slots to
#     late-r09 arrivals are counted here too — after this window no
#     registered query's freshest driver row predates r07).
# (3) the remaining 17 slots go to the riskiest-oracle r07 rows
#     (variant_props_stats yielded its slot to the late new query):
#     streaming/stateful ops, CDC/IVM, the graph kernel, sparse cosine,
#     the edit-distance miner, source/sink round trips, UDTF surface.
# Still out after this round: 31 r07 rows + the r08/r09 cohorts — all
# covered every pytest run by tests/test_oracle_parity.py (sf0.001) and
# by the sf0.01 pandas-path local gate; they rotate in r11.
REGISTRY.set_front(
    (
        # --- (1) new this round, never driver-seen ---
        "dedup_minhash_persisted",
        "stream_bitmap_equality",
        "quantile_sketch_order_price",
        "stream_quantile_equality",
        # --- (2) the complete r06 remnant (29 rows) ---
        "anomaly_zscore_events",
        "array_functions_surface",
        "arrow_doc_stats",
        "arrow_grouped_event_stats",
        "chunk_documents_plan",
        "collation_token_counts",
        "doc_length_deciles",
        "embedding_norm_quantiles",
        "embedding_similar_pairs",
        "histogram_event_values",
        "key_skew_diagnostics",
        "percentiles_order_price",
        "pipe_syntax_rollup",
        "pmi_collocations",
        "promo_revenue_ratio",
        "q17_small_quantity_revenue",
        "rollup_lineitem",
        "scalar_functions",
        "scalar_subquery_part_avg",
        "skew_salted_agg",
        "stats_moments_lineitem",
        "text_quality_stats",
        "tfidf_top_terms",
        "training_shard_manifest",
        "window_distribution_funcs",
        "window_lag_lead_events",
        "window_rank_top_orders",
        "window_running_total",
        "zorder_bucket_stats",
        # --- (3) 18 riskiest-oracle r07 rows ---
        "pagerank_supply_graph",
        "dedup_edit_distance",
        "tf_cosine_pairs",
        "corpus_curation_report",
        "stream_dedup_events",
        "stream_sink_roundtrip",
        "stream_static_enrich",
        "session_window_events",
        "incremental_agg_maintenance",
        "scd2_point_in_time_join",
        "custom_source_roundtrip",
        "schema_evolution_stats",
        "xml_roundtrip_stats",
        "number_format_roundtrip",
        "udtf_dynamic_kv",
        "udtf_table_arg_reduce",
        "pandas_api_rollup",
    )
)

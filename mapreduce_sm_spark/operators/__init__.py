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

# Round-14 driver window: the external correctness gate verifies the first
# 50 entries of queries(). Entering this round the staleness histogram of
# freshest driver rows (CORRECTNESS_r01..r13 union) was 37 x r09,
# 50 x r11, 50 x r12, 50 x r13, plus 7 never-seen (the operators added
# after the r13 window froze). Composition (7 + 37 + 6 = 50):
# (1) the 7 queries registered late in r13, never driver-seen — the
#     promised first obligation of this round (VERDICT r13 item 1):
#     the BPE tokenizer-induction trio (bpe_vocab_merges,
#     bpe_token_stats, bpe_dict_compaction), integer-exact LM surprisal
#     (doc_lm_surprisal), balanced source-mixture sampling
#     (source_mixture_sample), streamed semantic-index maintenance
#     (stream_semantic_index_equality), and the composed LM curation
#     funnel (lm_curation_report).
# (2) ALL 37 rows whose freshest driver row is r09 — after this window
#     no registered query's freshest driver row predates r11. Includes
#     the q1/q3/q5/q10/q11/q15/q17(q18) TPC-H spine, the bloom pair,
#     KMV, grouping-sets/cube/pivot, outer/anti/semi joins, the
#     CSV/ORC roundtrips, and the sampling family.
# (3) the 6 queries NEW this round (gopher_quality_gate,
#     repeated_passage_coverage, ann_quantized_recall,
#     stream_bpe_dict_equality, bpe_fertility_stats,
#     fuzzy_decontamination_split) — fronted the round they are
#     registered so the r13 never-driver-seen debt does not repeat.
# Still out after this round: the 48 remaining r11 rows + the r12/r13
# cohorts — all covered every pytest run by tests/test_oracle_parity.py
# (sf0.001) and by the sf0.01 pandas-path local gate; the r11 remnant
# fronts in r15, TOGETHER WITH any r14 registration landed after this
# window filled (source_overlap_matrix, repeated_passage_prune — the r09 remnant is
# mandatory this round, so they take the first r15 slots instead).
REGISTRY.set_front(
    (
        # --- (1) the 7 late-r13 registrations, never driver-seen ---
        "bpe_vocab_merges",
        "bpe_token_stats",
        "bpe_dict_compaction",
        "doc_lm_surprisal",
        "source_mixture_sample",
        "stream_semantic_index_equality",
        "lm_curation_report",
        # --- (2) the complete r09 remnant (37 rows) ---
        "agg_distinct_segments",
        "bloom_reuse_prune_orders",
        "bloom_semi_prune_orders",
        "collect_set_statuses",
        "countmin_token_freq",
        "csv_roundtrip_stats",
        "cube_orders",
        "dataset_mixture_weights",
        "date_arithmetic_orders",
        "exists_discounted_orders",
        "funnel_view_click_purchase",
        "fuzzy_source_names",
        "grouping_sets_orders",
        "inverted_index_topdocs",
        "join_anti_no_orders",
        "join_outer_order_counts",
        "join_semi_big_spenders",
        "json_schema_parse_events",
        "kmv_audience_overlap",
        "lateral_top2_orders",
        "mode_event_type_per_user",
        "null_semantics_outer",
        "or_predicate_revenue",
        "orc_roundtrip_stats",
        "pivot_orders_by_priority",
        "priority_sample_documents",
        "profile_orders_columns",
        "q10_top_lost_revenue",
        "q11_revenue_concentration",
        "q15_top_supplier",
        "q18_large_quantity_orders",
        "q1_pricing_summary",
        "q2_min_per_group",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "recursive_month_spine",
        "stratified_sample_quota",
        # --- (3) the 6 new-this-round queries ---
        "gopher_quality_gate",
        "repeated_passage_coverage",
        "ann_quantized_recall",
        "stream_bpe_dict_equality",
        "bpe_fertility_stats",
        "fuzzy_decontamination_split",
    )
)

"""Physical-plan audits: the 100 TB posture checks (task spec: "push down
and prune", "broadcast small dims", "TakeOrdered not global sort",
"partial aggregation before the exchange")."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_filter_pushed_to_scan(spark):
    from mapreduce_sm_spark.operators.relational import q1_pricing_summary

    plan = _formatted(q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_string_match_column_pruning(spark):
    from mapreduce_sm_spark.operators.string_match import string_match

    plan = _formatted(string_match(spark, SF_DIR))
    # the scan must read only doc_id+text, not lang/source/n_chars
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_q5_uses_broadcast_joins(spark):
    from mapreduce_sm_spark.operators.relational import q5_local_supplier_volume

    plan = _plan(q5_local_supplier_volume(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark):
    from mapreduce_sm_spark.operators.relational import topk_orders

    plan = _plan(topk_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_wordcount_has_partial_aggregation(spark):
    from mapreduce_sm_spark.operators.wordcount import wordcount

    plan = _plan(wordcount(spark, SF_DIR))
    # partial + final HashAggregate pair around the exchange — the map-side
    # combine the reference lacked (SURVEY §4.3)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(word" in plan


def test_semi_join_planned_as_semi(spark):
    from mapreduce_sm_spark.operators.relational import join_semi

    plan = _plan(join_semi(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_whole_stage_codegen_on_hot_path(spark):
    from mapreduce_sm_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, SF_DIR)
    df.collect()  # AQE: codegen spans appear only in the final plan
    plan = _plan(df)
    # "*(n) " prefixes mark WholeStageCodegen spans in the compact plan
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_exists_planned_as_semi_join(spark):
    from mapreduce_sm_spark.operators.subqueries import exists_discounted_orders

    plan = _plan(exists_discounted_orders(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_or_predicate_pushed_below_join(spark):
    from mapreduce_sm_spark.operators.subqueries import or_predicate_revenue

    plan = _formatted(or_predicate_revenue(spark, SF_DIR))
    # each side's OR-of-ranges filter must reach its parquet scan:
    # brand/size on part, quantity on lineitem
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l for l in pushed)
    assert any("l_quantity" in l for l in pushed)


def test_salted_agg_is_two_stage(spark):
    from mapreduce_sm_spark.operators.scale import skew_salted_agg

    plan = _plan(skew_salted_agg(spark, SF_DIR))
    # stage 1 groups on (user_id, salt), stage 2 on user_id alone
    assert "Exchange hashpartitioning(user_id" in plan
    assert "salt" in plan


def test_minhash_candidates_are_equality_join(spark):
    from mapreduce_sm_spark.operators.dedup import dedup_minhash

    plan = _plan(dedup_minhash(spark, SF_DIR))
    # banding must produce an equi-join (SortMerge or Hash), never a
    # nested-loop cartesian over the corpus
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scalar_subquery_aggregate_is_partial(spark):
    from mapreduce_sm_spark.operators.subqueries import scalar_subquery_part_avg

    plan = _plan(scalar_subquery_part_avg(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2


def test_simhash_pairs_band_equality_join(spark):
    """Pigeonhole-banded hamming search must equi-join on chunk values —
    never a per-lang-block quadratic join (the round-1 scale-killer)."""
    from mapreduce_sm_spark.operators.dedup import dedup_simhash_pairs

    plan = _plan(dedup_simhash_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join keys must include the chunk value, not lang alone
    assert "cv_a" in plan and "cv_b" in plan


def test_embedding_pairs_band_equality_join(spark):
    """Banded-LSH candidate mining must equi-join on band values."""
    from mapreduce_sm_spark.operators.similarity import embedding_similar_pairs

    plan = _plan(embedding_similar_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bv_a" in plan and "bv_b" in plan


def test_fan_out_is_width_aware(spark):
    """fan_out must be a no-op when the scan already fills the cluster —
    at 100 TB an unconditional repartition re-shuffles the whole corpus
    (AQE never removes a user-requested repartition)."""
    from mapreduce_sm_spark.session import fan_out

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(n)
    assert fan_out(wide, "id") is wide  # untouched, no extra exchange
    narrow = spark.range(10_000).coalesce(1)
    assert fan_out(narrow, "id").rdd.getNumPartitions() == n


def test_inverted_index_topk_and_broadcast_back(spark):
    """Top-token selection must plan as TakeOrderedAndProject (never a
    global window over the vocabulary) and the winner set must broadcast
    back against the postings."""
    from mapreduce_sm_spark.operators.corpus_ops import inverted_index_topdocs

    plan = _plan(inverted_index_topdocs(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # per-token top-docs should use the rank-limit pushdown, not a full
    # per-partition sort of all postings
    assert "WindowGroupLimit" in plan


def test_quality_prune_single_exchange_per_source(spark):
    """The percent_rank window and the per-source rollup share the
    source-hash partitioning — exactly one shuffle of the docs."""
    from mapreduce_sm_spark.operators.corpus_ops import quality_prune_per_source

    plan = _plan(quality_prune_per_source(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning(source") == 1


def test_stratified_sample_no_global_sort(spark):
    """Quota sampling must sort within lang partitions only — a global
    sort of the corpus would be the scale-killer."""
    from mapreduce_sm_spark.operators.corpus_ops import stratified_sample_quota

    plan = _plan(stratified_sample_quota(spark, SF_DIR))
    # exactly one hash exchange on lang for both windows; the only range
    # exchange is the final tiny ORDER BY of the sampled rows
    assert plan.count("Exchange hashpartitioning(lang") == 1


def test_lateral_topk_is_decorrelated(spark):
    """The LATERAL ORDER BY+LIMIT subquery must plan as a ranked join
    (row_number + WindowGroupLimit pruning), never per-outer-row
    execution or a cartesian product."""
    from mapreduce_sm_spark.operators.subqueries import lateral_top2_orders

    plan = _plan(lateral_top2_orders(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_count_prunes_lineitem_scan(spark):
    from mapreduce_sm_spark.operators.graph import graph_triangle_count

    plan = _formatted(graph_triangle_count(spark, SF_DIR))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, "no parquet scan found"
    for line in read_schemas:
        # only the order key and part key may reach the scan — none of the
        # eight other lineitem columns
        assert "l_orderkey" in line and "l_partkey" in line
        assert "l_extendedprice" not in line and "l_quantity" not in line


def test_triangle_count_no_cartesian(spark):
    from mapreduce_sm_spark.operators.graph import graph_triangle_count

    plan = _plan(graph_triangle_count(spark, SF_DIR))
    # the 1-row summary x 1-row tri crossJoin is the only nested-loop
    # allowed; it must be broadcast with a 1-row build, never a
    # CartesianProduct over data
    assert "CartesianProduct" not in plan


def test_pagerank_prunes_lineitem_scan(spark):
    from mapreduce_sm_spark.operators.graph import pagerank_supply_graph

    plan = _formatted(pagerank_supply_graph(spark, SF_DIR))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, "no parquet scan found"
    for line in read_schemas:
        assert "l_partkey" in line and "l_suppkey" in line
        assert "l_extendedprice" not in line and "l_orderkey" not in line


def test_partition_pruned_scan_has_partition_filters(spark):
    from mapreduce_sm_spark.operators.sharding import (
        partition_pruned_event_stats,
    )

    plan = _formatted(partition_pruned_event_stats(spark, SF_DIR))
    # the event_type filter must reach the scan as a PARTITION filter
    # (directory-level pruning at planning time), not a data filter
    assert "PartitionFilters" in plan
    pf_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert any("event_type" in l for l in pf_lines), pf_lines


def test_bucketed_join_is_exchange_free_smj(spark):
    from mapreduce_sm_spark.operators.sharding import (
        bucketed_join_sales_by_segment,
    )

    df = bucketed_join_sales_by_segment(spark, SF_DIR)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    # both sides bucketed+sorted on the join key: the join subtree needs
    # no shuffle and no sort. The FINAL aggregation still exchanges on
    # c_mktsegment, so scope the assertion to the join's subtree: no
    # Exchange may appear BELOW the SortMergeJoin node.
    smj_at = plan.index("SortMergeJoin")
    below = plan[smj_at:]
    # the first exchange after the join node (if any) belongs to the
    # aggregation ABOVE it in execution order only if it precedes the
    # join textually; children print BELOW the join line, so any
    # Exchange in `below` would be a join-input shuffle
    assert "Exchange" not in below, below[:800]


def test_edit_distance_band_equality_join(spark):
    """Length-band blocking must plan as an equi-join on (lang, band) —
    never a per-lang cartesian."""
    from mapreduce_sm_spark.operators.dedup import dedup_edit_distance

    plan = _plan(dedup_edit_distance(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_a" in plan and "band_b" in plan


def test_tf_cosine_join_is_equality_on_term(spark):
    """The sparse dot-product join must equi-join on the term with the
    doc-order filter as a residual — never a nested-loop pair scan."""
    from mapreduce_sm_spark.operators.text_analysis import tf_cosine_pairs

    plan = _plan(tf_cosine_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_exact_rank_is_distributed(spark):
    """VERDICT r10 item 1: the exact order statistic must never move the
    corpus to one partition. The ranking window over orders is partitioned
    by the range-partition id; the only unpartitioned windows left are
    over bounded frames (the <=k-row synopsis read-out and the
    <=parts-row offset cumsum)."""
    import re

    from mapreduce_sm_spark.operators.sketches import (
        quantile_sketch_order_price,
    )

    df = quantile_sketch_order_price(spark, SF_DIR)
    plan = _plan(df)
    # corpus ranking: row_number PARTITIONED by pid, fed by a range
    # exchange on the sort key
    assert re.search(r"row_number\(\) windowspecdefinition\(pid#\d+,", plan)
    assert "Exchange rangepartitioning(cents" in plan
    # ADVICE r11: global rank = offset + local rank is only sound if the
    # offs and fv branches read THE SAME materialized range exchange —
    # RangePartitioner samples bounds per materialization, so two
    # independently materialized exchanges could assign rows different
    # pids. AQE dedupes by canonicalized stage; pin that it did: in the
    # executed FINAL plan the cents range exchange materializes exactly
    # once, the second consumer riding a ReusedExchange/reused stage.
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert final.count("Exchange rangepartitioning(cents") == 1
    assert "ReusedExchange" in final
    # every remaining unpartitioned window sits directly above a bounded
    # subtree: TakeOrderedAndProject (the k-row synopsis) or the
    # per-partition-count aggregate keyed by pid (<=parts rows)
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "windowspecdefinition(" not in line:
            continue
        if re.search(r"windowspecdefinition\(pid#\d+,", line):
            continue  # the partitioned corpus window
        below = "\n".join(lines[i : i + 10])
        assert "TakeOrderedAndProject" in below or "keys=[pid" in below, line


def _execution_nodes(jnode, acc):
    """Flatten the EXECUTED plan tree to simpleString lines, stopping at
    InMemoryTableScan leaves so a cached relation's STORED build plan
    (which legitimately contains its one build exchange) is not walked —
    the toString() dump prints those nested plans inline, which is what
    a naive string assertion trips over (r16 opt round)."""
    cls = jnode.getClass().getSimpleName()
    acc.append(jnode.simpleString(200))
    if "InMemoryTableScan" in cls:
        return acc
    if "QueryStage" in cls:  # Shuffle/Broadcast/TableCacheQueryStageExec
        return _execution_nodes(jnode.plan(), acc)
    if "AdaptiveSparkPlan" in cls:
        return _execution_nodes(jnode.executedPlan(), acc)
    ch = jnode.children()
    for i in range(ch.length()):
        _execution_nodes(ch.apply(i), acc)
    return acc


def test_pagerank_loop_exchanges_are_node_sized(spark):
    """r12 iteration-shape rework: the per-iteration join against the
    rank frame must consume the cached, src-partitioned edge frame
    without re-exchanging it — the final iteration layer's EXECUTION
    carries NO hash exchange on src; every exchange is on a node-sized
    frame (the rank/in_sum side). Walks the executed tree, not the
    string dump: the dump inlines each cached relation's stored build
    plan, whose single legitimate build exchange IS on src."""
    from mapreduce_sm_spark.operators.graph import pagerank_supply_graph

    df = pagerank_supply_graph(spark, SF_DIR)
    df.collect()
    nodes = _execution_nodes(df._jdf.queryExecution().executedPlan(), [])
    assert any("InMemoryTableScan" in n for n in nodes)
    offenders = [
        n for n in nodes if "Exchange hashpartitioning(src" in n
    ]
    assert not offenders, offenders


def test_semantic_dedup_cell_equality_join(spark):
    """SemDeDup candidate generation must equi-join on the k-means cell
    id (mirrors the banded-LSH assertion above) — an all-pairs cosine
    over the corpus is the scale-killer the cells exist to prevent."""
    from mapreduce_sm_spark.operators.similarity import semantic_dedup_pairs

    import re

    plan = _plan(semantic_dedup_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the PAIR join must be a hash/merge EQUI-join keyed on the cell id
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[cid_a", plan
    ), plan
    # the only nested-loop joins allowed are the K-row (=16 centroids)
    # broadcast Cross inside the cell assignment — an accidental
    # corpus x corpus pair join would surface as an Inner/LeftOuter BNLJ
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_no_unpartitioned_window_over_unbounded_subtree(spark):
    """Generic tripwire (VERDICT r12 item 3): the verify transcript carries
    ~160 'WindowExec: No Partition Defined' warnings, every one of which
    was hand-traced to a window over a BOUNDED subtree (count-of-count
    histograms, post-TakeOrdered top-k, <=K-row samples). This test
    converts that audit into a guard: walk every registered batch query's
    optimized logical plan and assert any Window with an empty
    partitionSpec sits above an Aggregate / Limit / Deduplicate / local
    relation on EVERY path to a leaf — a single-partition sort over an
    unbounded file scan can never ship again. Streaming queries are
    excluded (building their frame executes the stream); their windows
    are all watermark-partitioned by construction."""
    from mapreduce_sm_spark.registry import REGISTRY, load_all_operators

    load_all_operators()

    bounded_gate = {"Aggregate", "GlobalLimit", "LocalLimit", "Limit",
                    "Deduplicate"}
    leaf_ok = {"LocalRelation", "OneRowRelation"}

    def children(n):
        ch = n.children()
        return [ch.apply(i) for i in range(ch.length())]

    def cls(n):
        return n.getClass().getSimpleName()

    def bounded(n):
        c = cls(n)
        if c in bounded_gate:
            return True
        if c == "InMemoryRelation":
            # a cached frame hides its subtree from the logical walker;
            # it is bounded iff the plan it MATERIALIZED is aggregate/
            # limit-shaped before any scan or join — scan the cached
            # physical plan top-down past AQE/codegen/Project wrapper
            # lines and judge on the FIRST decisive operator
            # (token_budget_allocation's cached per-source rollup is the
            # motivating case — caching must not blind the tripwire, nor
            # grant a blanket pass to a cached corpus-scale frame)
            bounding = ("HashAggregate", "SortAggregate",
                        "ObjectHashAggregate", "TakeOrderedAndProject",
                        "GlobalLimit", "LocalTableScan")
            unbounding = ("FileScan", "Scan parquet", "SortMergeJoin",
                          "BroadcastHashJoin", "BroadcastNestedLoopJoin",
                          "CartesianProduct", "ShuffledHashJoin",
                          "InMemoryTableScan", "Generate")
            for line in n.cachedPlan().toString().splitlines():
                if any(m in line for m in bounding):
                    return True
                if any(m in line for m in unbounding):
                    return False
            return False
        kids = children(n)
        if not kids:
            return c in leaf_ok
        return all(bounded(k) for k in kids)

    def walk(n):
        yield n
        for k in children(n):
            yield from walk(k)

    offenders, n_unpartitioned = [], 0
    for name, q in REGISTRY._queries.items():
        if name.startswith("stream_"):
            continue
        plan = q.fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan()
        for node in walk(plan):
            if cls(node) == "Window" and node.partitionSpec().isEmpty():
                n_unpartitioned += 1
                if not bounded(children(node)[0]):
                    offenders.append(name)
    assert not offenders, f"unbounded unpartitioned windows in: {offenders}"
    # the walker must actually SEE the known sites (15 at r13) — zero
    # would mean the plan API drifted and the tripwire went blind
    assert n_unpartitioned >= 10, n_unpartitioned


def test_surprisal_explodes_corpus_once(spark):
    """doc_lm_surprisal's doc-bigram multiset feeds the scoring join AND
    the cascaded c12/c1 LM aggregates; without the persist Catalyst
    computes the corpus explode subtree once per consumer (three passes,
    measured 2x the x100 wall — SCALING.md r13). The executed plan must
    read the cached relation everywhere except the single vocab pass."""
    from mapreduce_sm_spark.operators.language_model import doc_lm_surprisal

    plan = _plan(doc_lm_surprisal(spark, SF_DIR))
    # every consumer of doc_bi reads the cache...
    assert plan.count("InMemoryTableScan") >= 3
    # ...and the only UNCACHED corpus read left is the vocab distinct —
    # FileScan lines inside the InMemoryRelation definition subtree are
    # the cache's own (single) build scan, printed under each table scan
    for block in plan.split("InMemoryRelation")[0].splitlines():
        # the top section (above the first cache reference on each path)
        # may contain only the vocab scan
        if "FileScan parquet" in block:
            assert "struct<text:string>" in block


def test_mixture_sample_tokenizes_corpus_once(spark):
    """source_mixture_sample's (doc_id, source, toks) frame feeds the
    per-source totals, the budget scalar, and the kept-set filter; the
    executed plan must read the cached doc-count-sized frame in all
    three places rather than re-running the tokenize regexp per
    consumer."""
    from mapreduce_sm_spark.operators.sampling import source_mixture_sample

    plan = _plan(source_mixture_sample(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 3


def test_curation_funnel_reuses_cached_frames(spark):
    """lm_curation_report caches per_doc (mean scalar + gate join) and kt
    (budgets + sample + report aggregates); the executed plan must read
    both InMemoryRelations in every downstream consumer instead of
    replaying the LM cascade — uncached, the x100 wall was 4x worse
    (SCALING.md r13)."""
    from mapreduce_sm_spark.operators.corpus_ops import lm_curation_report

    plan = _plan(lm_curation_report(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 5
    assert plan.count("InMemoryRelation") >= 5


def test_gopher_gate_single_exchange(spark):
    """gopher_quality_gate's metrics are row-local folds: the ONLY hash
    exchange in the plan is the final source-sized rollup (plus its
    tiny ORDER BY) — no gram explode, no per-gram groupBy, no join."""
    from mapreduce_sm_spark.operators.text_analysis import gopher_quality_gate

    plan = _plan(gopher_quality_gate(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(source" in plan
    assert "Generate explode" not in plan
    assert "Join" not in plan


def test_repeated_passage_two_exchanges_no_join(spark):
    """repeated_passage_coverage shuffles the exploded grams ONCE (the
    gram-partitioned window replaces a countDistinct df frame + join-
    back) and the doc rollup once; no join anywhere, and the final
    top-40 is TakeOrdered, not a global sort."""
    from mapreduce_sm_spark.operators.text_analysis import (
        repeated_passage_coverage,
    )

    plan = _plan(repeated_passage_coverage(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dsir_tokenizes_corpus_once(spark):
    """dsir_importance_selection's (doc_id, w, c) multiset feeds the
    vocab aggregate AND the per-doc scoring join; the executed plan must
    read the cached frame in every consumer instead of replaying the
    corpus tokenize-explode (the doc_lm_surprisal multi-consumer
    lesson)."""
    from mapreduce_sm_spark.operators.sampling import (
        dsir_importance_selection,
    )

    plan = _plan(dsir_importance_selection(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 2


def test_padding_stats_single_exchange_no_explode(spark):
    """length_bucket_padding_stats is row-local integer math into a
    <= 8-value key: exactly one hash exchange (map-side combine
    collapses each input partition first), no join, and NO gram/token
    explode — size(tokenize) never materializes the token array rows."""
    from mapreduce_sm_spark.operators.sharding import (
        length_bucket_padding_stats,
    )

    plan = _plan(length_bucket_padding_stats(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Generate explode" not in plan


def test_boilerplate_two_exchanges_no_join(spark):
    """boilerplate_prefix_stats: the (source, prefix) count exchange and
    the source-partitioned top-1 window over the collapsed prefix frame
    — two hash exchanges, no join anywhere."""
    from mapreduce_sm_spark.operators.text_analysis import (
        boilerplate_prefix_stats,
    )

    plan = _plan(boilerplate_prefix_stats(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_filtered_ann_is_label_broadcast_join(spark):
    """ann_filtered_topk's metadata predicate must be the JOIN KEY: a
    BroadcastHashJoin on label with the q_id<>c_id residual — never a
    cartesian/BNLJ fan-out of the corpus against every query (the
    unfiltered ann_bruteforce_topk shape)."""
    import re

    from mapreduce_sm_spark.operators.similarity import ann_filtered_topk

    plan = _plan(ann_filtered_topk(spark, SF_DIR))
    assert re.search(
        r"BroadcastHashJoin \[label#\d+\], \[q_label#\d+\], Inner", plan
    ), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_candidates_equality_join_no_cartesian(spark):
    """dedup_containment_pairs: the candidate stage is an EQUALITY join
    on (lang, tok) — the ssjoin prefix-x-full-index shape — never a
    cartesian/BNLJ, and both exact-verify join-backs are pinned to
    sort-merge (the dedup_ngram_jaccard AQE-rebuild lesson)."""
    import re

    from mapreduce_sm_spark.operators.dedup import dedup_containment_pairs

    plan = _plan(dedup_containment_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"Join \[lang#\d+, tok#\d+L\]", plan), plan
    assert plan.count("SortMergeJoin") >= 2


def test_dimension_stats_two_exchanges_no_join(spark):
    """embedding_dimension_stats: the fan_out repartition and the
    dim-sized groupBy are the only hash exchanges; no join anywhere —
    map-side combine collapses each partition to <= dim rows."""
    from mapreduce_sm_spark.operators.similarity import (
        embedding_dimension_stats,
    )

    plan = _plan(embedding_dimension_stats(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_langid_confusion_two_exchanges_no_join(spark):
    """langid_confusion_matrix: row-local scoring into the
    (declared, predicted) count exchange plus the declared-partitioned
    share window over the <= |langs|^2 matrix frame; no join."""
    from mapreduce_sm_spark.operators.text_analysis import (
        langid_confusion_matrix,
    )

    plan = _plan(langid_confusion_matrix(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_exact_ngram_decon_broadcast_semi_and_filter_order(spark):
    """VERDICT r15 item 4 + ADVICE r15: two contracts for the verbatim
    decontamination probe, pinned instead of observed.

    1. The eval-gram probe is written as a plain left_semi; SCALING.md
       r15 recorded AQE choosing BroadcastHashJoin at every tested
       scale. Pin it: the FINAL adaptive plan must broadcast the
       distinct eval keys into a LeftSemi on gh — at benchmark-suite
       eval sizes, shuffling the corpus-scale train gram stream into a
       sort-merge would be the wrong plan (sort-merge remains the
       documented, still-correct fallback for eval-heavy regimes).
    2. r17 tokenize-once (VERDICT r16 item 1): the regexp tokenize
       appears exactly ONCE per modulo side (2 nodes total) — never
       duplicated into a pushed-down scan Filter (`size(regexp(...))`,
       the pre-r17 shape: 4 nodes, every doc tokenized twice per side).
       The cheap modulo split itself must still reach both scans."""
    import re

    from mapreduce_sm_spark.operators.dedup import (
        exact_ngram_decontamination,
    )

    df = exact_ngram_decontamination(spark, SF_DIR)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # (1) broadcast LeftSemi on the gram hash in the final plan
    assert re.search(
        r"BroadcastHashJoin \[gh#\d+L\], \[gh#\d+L\], LeftSemi, BuildRight",
        final,
    ), final
    # (2a) exactly one tokenize per side survives in the executed plan
    assert final.count("regexp_extract_all") == 2, final
    # (2b) the modulo split is pushed to both text scans (train: NOT =0,
    # eval: =0) so each side decodes only its disjoint slice
    assert re.search(r"NOT \(\(doc_id#\d+L % 10\) = 0\)", final), final
    assert re.search(r" \(\(doc_id#\d+L % 10\) = 0\)", final), final


def test_no_unbounded_cartesian_product(spark):
    """Generic tripwire (r14): a cross join that is NOT against a
    bounded side plans as CartesianProduct/Join Cross over two unbounded
    subtrees — the canonical scale killer. Walk every registered batch
    query's optimized logical plan and assert every Cross-type Join has
    at least one BOUNDED side (aggregate / limit / local relation — the
    1-row scalar frames and <=K centroid frames the codebase broadcasts).
    Streaming queries excluded as in the window tripwire."""
    from mapreduce_sm_spark.registry import REGISTRY, load_all_operators

    load_all_operators()

    bounded_gate = {"GlobalLimit", "LocalLimit", "Limit", "Deduplicate"}
    leaf_ok = {"LocalRelation", "OneRowRelation"}

    def children(n):
        ch = n.children()
        return [ch.apply(i) for i in range(ch.length())]

    def cls(n):
        return n.getClass().getSimpleName()

    def bounded(n):
        c = cls(n)
        if c == "Aggregate":
            # only a SCALAR aggregate (empty grouping expressions) is
            # bounded by node type; a grouped aggregate (groupBy(doc_id))
            # is corpus-sized (ADVICE r14) and is bounded only if its
            # INPUT is bounded (group count <= input rows) — grouped-agg
            # cross sides otherwise go through the audited allowlist
            if n.groupingExpressions().isEmpty():
                return True
            return all(bounded(k) for k in children(n))
        if c == "Range":
            # spark.range(...) leaf: size is a plan-time literal — bounded
            # iff that literal is genuinely small (the 10-row decile /
            # constant generator frames), never a billion-row generator
            return int(n.numElements()) <= 10_000
        if c in bounded_gate:
            return True
        kids = children(n)
        if not kids:
            return c in leaf_ok
        return all(bounded(k) for k in kids)

    def walk(n):
        yield n
        for k in children(n):
            yield from walk(k)

    # Hand-audited sites the SYNTACTIC gate cannot prove bounded — each
    # cross side is bounded by construction, not by node type:
    #   ann_ivf_recall_check — both sides are rank<=K windows over <=20
    #     broadcast query vectors (<=100 rows each; the recall-contract
    #     comparison of two top-k frames);
    #   bloom_reuse_prune_orders — the reloaded bloom filter is a 1-ROW
    #     stored parquet table (self-describing geometry + map), which
    #     scans as an unbounded-looking LogicalRelation;
    #   quantile_sketch_order_price — the bottom-k synopsis is h%32
    #     shards x k rank-limited rows (<=32k rows), rank filters over a
    #     fixed shard count.
    # Any OTHER query planning a both-sides-unbounded cross join fails.
    audited = {
        "ann_ivf_recall_check",
        "bloom_reuse_prune_orders",
        "quantile_sketch_order_price",
    }
    # Operators that execute EAGERLY inside fn (bounded collect ->
    # createDataFrame, the tokenizer family's documented cache-lifetime
    # scoping) expose only a LocalRelation plan here, so their REAL
    # corpus DAGs are never inspected by this tripwire (ADVICE r14).
    # That gap is covered by the dedicated tokenizer plan/property
    # tests; the set below keeps it EXPLICIT — a new eager operator
    # must be added here consciously, and a listed one that stops
    # being local-only re-enters the tripwire's coverage.
    eager_local_only = {
        # tokenizer family: bounded collect -> createDataFrame, the
        # documented cache-lifetime scoping (tokenizer.py)
        "bpe_vocab_merges",
        "bpe_token_stats",
        "bpe_fertility_stats",
        # SQL scripting (BEGIN...END) executes at spark.sql() time and
        # hands back the final statement's materialized result
        "sql_scripting_rollup",
        # persists the shared vocab-sized sw frame and collects the
        # source-sized report to scope the cache (sampling.py r15)
        "source_unigram_divergence",
    }
    offenders, n_cross, local_only = [], 0, set()
    for name, q in REGISTRY._queries.items():
        if name.startswith("stream_"):
            continue
        plan = q.fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan()
        # LogicalRDD is what createDataFrame(<driver rows>) plans as —
        # a driver-local leaf for DETECTION purposes only (it stays
        # outside bounded()'s leaf_ok: an arbitrary RDD leaf is not
        # provably small, the collected row lists here just happen to be)
        if all(
            cls(node) in (leaf_ok | {"LogicalRDD"})
            for node in walk(plan)
            if not children(node)
        ):
            local_only.add(name)
        for node in walk(plan):
            if cls(node) == "Join" and "Cross" in str(node.joinType()):
                n_cross += 1
                kids = children(node)
                if not (bounded(kids[0]) or bounded(kids[1])):
                    if name not in audited:
                        offenders.append(name)
    assert not offenders, f"unbounded cartesian products in: {offenders}"
    assert local_only == eager_local_only, local_only ^ eager_local_only
    # the walker must actually SEE the known cross-join sites (scalar
    # 1-row aggregates, centroid frames) — zero means the API drifted
    assert n_cross >= 5, n_cross


def test_quality_classifier_single_exchange_no_explode(spark):
    """quality_classifier_gate: the score is a row-local F.aggregate
    fold over the token array — the corpus is never exploded and never
    joined; exactly one hash exchange (the source-sized yield rollup,
    map-side combined)."""
    from mapreduce_sm_spark.operators.text_analysis import (
        quality_classifier_gate,
    )

    plan = _plan(quality_classifier_gate(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan.replace("BroadcastNestedLoopJoin", "")
    assert "Generate explode" not in plan


def test_temperature_weights_cached_rollup_broadcast_total(spark):
    """temperature_mixture_weights: the |sources|-row rollup is cached
    and every consumer reads the InMemoryRelation — the executed tree
    above the cache definition holds NO FileScan (one corpus scan
    total); the scalar total rides a broadcast one-row cross join."""
    from mapreduce_sm_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    plan = _plan(temperature_mixture_weights(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 2
    assert "FileScan" not in plan.split("InMemoryRelation")[0]
    assert "BroadcastNestedLoopJoin" in plan  # the one-row total
    assert "SortMergeJoin" not in plan
    assert "Generate explode" not in plan


def test_novelty_curve_one_corpus_explode_no_smj(spark):
    """ngram_novelty_curve: denominators are ROW-LOCAL (no explode
    feeds occ), so the plan carries exactly ONE Generate explode (the
    gram pass into the first-occurrence aggregate). Four hash
    exchanges: the gh aggregate, the two <= NB-row bucket rollups, and
    the fan_out width repartition ahead of the gram transform; the
    bucket joins broadcast — never sort-merge."""
    from mapreduce_sm_spark.operators.corpus_ops import ngram_novelty_curve

    plan = _plan(ngram_novelty_curve(spark, SF_DIR))
    assert plan.count("Generate explode") == 1
    assert plan.count("Exchange hashpartitioning") == 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_winnowing_cached_postings_no_cartesian(spark):
    """winnowing_fingerprint_pairs: the exploded postings and the
    capped `kept` frame are cached — the executed tree above the cache
    definitions re-runs NEITHER the winnow-selection explode NOR the
    file scan (one tokenize+md5 pass total; pre-fix the plan replayed
    it four times); the pair join is an fp equi-join, never a
    cartesian/BNLJ fan-out."""
    from mapreduce_sm_spark.operators.dedup import (
        winnowing_fingerprint_pairs,
    )

    plan = _plan(winnowing_fingerprint_pairs(spark, SF_DIR))
    head = plan.split("InMemoryRelation")[0]
    assert "Generate explode" not in head
    assert "FileScan" not in head
    assert plan.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_budget_waterfill_cached_rollup(spark):
    """token_budget_allocation: ONE corpus token rollup, cached; the
    waterfill's windows/scalars all read the InMemoryRelation (no
    FileScan above the cache definition); no explode, no sort-merge
    join — everything past the rollup is |sources|-row work."""
    from mapreduce_sm_spark.operators.sampling import token_budget_allocation

    plan = _plan(token_budget_allocation(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 3
    assert "FileScan" not in plan.split("InMemoryRelation")[0]
    assert "Generate explode" not in plan.split("InMemoryRelation")[0]
    assert "SortMergeJoin" not in plan


def test_centroid_drift_cached_grid_one_posexplode(spark):
    """label_centroid_drift: the (label x dim) integer-grid rollup is
    cached — the executed tree above the cache definition holds neither
    the corpus posexplode nor a file scan (pre-fix the plan replayed
    the posexplode five times); no cartesian anywhere."""
    from mapreduce_sm_spark.operators.similarity import label_centroid_drift

    plan = _plan(label_centroid_drift(spark, SF_DIR))
    head = plan.split("InMemoryRelation")[0]
    assert "Generate posexplode" not in head
    assert "FileScan" not in head
    assert plan.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in plan



def test_knn_audit_bounded_panel_broadcast(spark):
    """knn_label_noise_audit: the audit panel is a bounded TakeOrdered
    (never a global sort) and rides a broadcast into the corpus-scan
    cosine join — the ann_bruteforce serving shape."""
    from mapreduce_sm_spark.operators.similarity import knn_label_noise_audit

    plan = _plan(knn_label_noise_audit(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # panel broadcast, != join cond
    assert "CartesianProduct" not in plan

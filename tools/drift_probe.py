#!/usr/bin/env python
"""Reproduce — and prove the fix for — the r03/r04 driver-hash divergence.

The five queries that were rows/schema-green but hash-red in
CORRECTNESS_r03/r04 all passed tools/verify_local.py on the committed
fixtures. The divergence is therefore environment-side: the driver
regenerates fixtures per round (the events `ts` dtype has already
drifted TIMESTAMP(NANOS) -> timestamp[us] across generations, per
TESTDATA.md history), and engine versions differ in round() tie
behavior (Spark HALF_UP on the decimal expansion vs DuckDB
scale-and-nearbyint). Any query whose predicate or output sits on a
numeric decision boundary (z > 2, percent_rank <= 0.5, ts <= prev +
5 min, p01/p99 clip) flips under that drift; non-boundary queries don't.

This probe makes the failure class REPRODUCIBLE: it writes adversarial
fixtures that encode exactly those drift modes —

  events.parquet    ts as TIMESTAMP(NANOS) with +/-500 ns jitter around
                    exact 5-minute spacings; `value` with >2-decimal
                    doubles engineered so z-scores and round() ties sit
                    on half-boundaries; `props` with float / string /
                    bool / null / huge / missing k variants
  orders.parquet    o_totalprice landing on .005 round-to-cents
                    half-boundaries so interpolated quantile cuts tie
  documents.parquet token counts of 128 with odd distinct counts so
                    ttr*1e6 is exactly k+0.5 (round tie in both engines)

— then runs the five current queries Spark-vs-DuckDB with the exact
verify_local hash. PASS on all five means no emitted value depends on
double-ulp or round-tie agreement anywhere in the pipeline.

To demonstrate the OLD implementations fail on the same fixtures (the
driver's red, reproduced locally), check out the pre-fix tree and point
its gate at the probe fixtures:

    git worktree add .driftprobe/old 24aa722~1
    cd .driftprobe/old && PYTHONPATH=. python ../../tools/drift_probe.py --old

(--old runs whatever mapreduce_sm_spark is first on sys.path, so from
the old worktree it runs the pre-fix queries.)

Usage: python tools/drift_probe.py [--old]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
if "--old" not in sys.argv:
    sys.path.insert(0, _REPO)

FIXDIR = os.path.join(_REPO, ".driftprobe", "fixtures")

FIVE = (
    "anomaly_zscore_events",
    "dedup_events_time_window",
    "quality_prune_per_source",
    "winsorized_price_stats",
    "variant_props_stats",
    # r05 preventive hardening: integer-pm4 jaccard gate, cents/1e5
    # price_k — probed here so a regression back to round-tie forms fails
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "corpus_near_dedup",
    "scalar_functions",
    # r05 library-function sweep: quarter-cent order-statistic quantiles
    # (vs engine quantile interpolation), manual-interp floor-ppm norm
    # quartiles, and the exact-rational PMI ratio (vs libm ln)
    "percentiles_order_price",
    "embedding_norm_quantiles",
    "pmi_collocations",
    # r05 raw-emission sweep: queries whose doubles are bit-identical by
    # construction and now emit UNROUNDED (round(x, n) was their only
    # divergence channel) or integer-exact values — probed against the
    # full-precision adversarial fixtures
    "window_lag_lead_events",
    "window_moving_avg",
    "array_functions_surface",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "embedding_similar_pairs",
    "multimodal_resize_features",
    # r05 sweep, lineitem/part-backed: ordered-fold UDAF raw emission,
    # exact-integer promo share, multiplied-through q17 threshold — probed
    # on half-cent prices, fractional quantities, half-bp discounts
    "udaf_weighted_avg",
    "promo_revenue_ratio",
    "q17_small_quantity_revenue",
    # documents-backed ratio queries hardened to floored-ppm/pm4 integers
    "text_quality_stats",
    "doc_repetition_stats",
    "tfidf_top_terms",
    "corpus_curation_report",
    # r05 additions, integer-domain by construction: chunk spans and
    # decile interval math on a single-length corpus (one histogram row
    # spanning all ten deciles), md5 shard manifest, count-of-counts skew
    # fold, and the streaming session_window whose 30-min merge boundary
    # the fixture hits exactly (every i%4==3 event lands gap +/- 500 ns
    # from its predecessor — micros truncation must agree cross-engine)
    "chunk_documents_plan",
    "training_shard_manifest",
    "doc_length_deciles",
    "key_skew_diagnostics",
    "stream_session_windows",
    # bit-for-bit Morton interleave over the probe's adversarial orders
    "zorder_bucket_stats",
    # round trips whose detours (formatted text, XML, Arrow batches,
    # pipe syntax) must be value-transparent on hostile inputs too
    "custom_source_roundtrip",
    "arrow_doc_stats",
    "pipe_syntax_rollup",
    "xml_roundtrip_stats",
    # r05 late additions: CSV round trip + grouped Arrow reduce on
    # half-cent boundaries and hostile quoting (customer fixture below);
    # integer graph kernels and the collation group-by (regression
    # guards — immune by construction, the probe keeps them honest);
    # stream-static join through the ns-timestamp streaming read path
    "csv_roundtrip_stats",
    "arrow_grouped_event_stats",
    "graph_triangle_count",
    "pagerank_supply_graph",
    "collation_token_counts",
    "stream_static_enrich",
    # r05 final sweep: every remaining new query — cents-grid rounds
    # (safe scale-0 form), integral-text UDTF typing, floor divisions,
    # and the pandas-API/parameterized/mergeSchema detours — probed so a
    # regression into a tie-fragile form fails here first
    "schema_evolution_stats",
    "number_format_roundtrip",
    "udtf_dynamic_kv",
    "parameterized_sql_revenue",
    "incremental_agg_maintenance",
    "try_arithmetic_surface",
    "pandas_api_rollup",
    # TABLE-argument UDTF (Python-side half-away rounding must match the
    # engines on the tie fixtures) and the SQL scripting block
    "udtf_table_arg_reduce",
    "sql_scripting_rollup",
    # exact-bitmap distinct (pure integers), ordered listagg (strings),
    # mask() over the hostile unicode customer names (the ASCII
    # neutralization must agree with the oracle's regex fold)
    "bitmap_distinct_users",
    "listagg_order_statuses",
    "mask_pii_shapes",
    # the streaming sink round trip carries the same cents emission as
    # the other round trips — probed through the full write/commit path
    "stream_sink_roundtrip",
    # SCD2 validity windows over the ns-jittered adversarial timestamps:
    # the micros-truncation boundary must agree cross-engine
    "scd2_point_in_time_join",
    # FILTER clause over half-cent prices and fractional quantities
    "filter_clause_group_by_all",
    # r07 additions: layout round trips (cents emissions through the
    # partitioned/bucketed write-read detours), exact-integer sparse
    # cosine gate, and the banded Levenshtein pairs over the hostile
    # unicode text fixtures
    "partition_pruned_event_stats",
    "bucketed_join_sales_by_segment",
    "tf_cosine_pairs",
    "dedup_edit_distance",
    # r10 additions — the r09/r10 sketch & sampling family, all of whose
    # emissions are exact integers or md5-replayed synopses by
    # construction; probed on the half-cent/ns-jitter fixtures so a
    # regression into a tie-fragile form (a stray round(), a float
    # estimator, a trunc-vs-floor div) fails here first. The persisted /
    # streaming variants additionally push the cents and hash emissions
    # through parquet round trips and RocksDB state.
    "priority_sample_documents",
    "kmv_audience_overlap",
    "bloom_semi_prune_orders",
    "bloom_reuse_prune_orders",
    "stream_bloom_scrub_events",
    "stream_countmin_equality",
    "dedup_minhash_incremental",
    "dedup_minhash_persisted",
    "quantile_sketch_order_price",
    "stream_bitmap_equality",
    "stream_quantile_equality",
    # r12 additions: the band-index maintenance laws — mod-sum digests
    # and multiset counts are exact integers by construction; probed so
    # the merge/rebuild (batch) and streamed-append/rebuild comparisons
    # stay engine-exact on hostile unicode text (shingles through the
    # md5 hash60 path, the streamed one additionally through the file
    # sink's parquet round trip) too
    "dedup_minhash_compaction",
    "stream_minhash_index_equality",
    # r13 additions: the semantic-dedup contract (exact integer counts +
    # booleans; the cos >= tau decisions ride the bit-identical fold, and
    # the probe's duplicate/zero-vector embeddings stress the cos = 1.0
    # and null-cosine degenerate paths) and the 60-bit CC rung (pure
    # integers; the recursive-CTE oracle replayed over hostile unicode)
    "dedup_semantic_embedding",
    "dedup_connected_components60",
)


def build_fixtures() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    rng = np.random.default_rng(7)

    # --- events: ns timestamps + boundary-heavy values + hostile props ---
    n = 4000
    base = 1_700_000_000_000_000_000  # ns epoch
    ts = []
    for i in range(n):
        if i % 4 == 1:
            # exactly 5 min after the previous event of the same key,
            # +/- 500 ns: micros truncation must agree cross-engine
            ts.append(ts[-1] + 300_000_000_000 + int(rng.integers(-500, 500)))
        elif i % 4 == 3:
            # exactly the 30-min session gap after the previous event of
            # the same user, +/- 500 ns: whether the session merges or
            # splits is decided by the truncated micros on BOTH engines
            ts.append(ts[-1] + 1_800_000_000_000 + int(rng.integers(-500, 500)))
        else:
            ts.append(base + i * 7_000_000_000 + int(rng.integers(0, 10**9)))
    user = (np.arange(n) // 4) % 100
    etype = np.array(["click", "view", "purchase", "error", "signup"])[
        np.arange(n) % 5
    ]
    # full-precision doubles; a slab of values sits where round(x, 6)
    # and round(x*1e4) ties differ between HALF_UP and nearbyint
    value = rng.uniform(0.01, 500.0, n)
    value[::7] = np.round(value[::7], 2)  # mix in the 2-decimal grid
    value[1::4] = value[0::4][: len(value[1::4])]  # duplicate key values
    props = []
    variants = [
        '{"k": %d}', '{"k": %d.5}', '{"k": "%d"}', '{"k": true}',
        '{"k": null}', '{"j": %d}', None, '{"k": 99999999999999999999}',
    ]
    for i in range(n):
        t = variants[i % len(variants)]
        props.append(t % i if t is not None and "%d" in t else t)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("ns")),
                "user_id": pa.array(user, pa.int64()),
                "event_type": pa.array(etype),
                "value": pa.array(value, pa.float64()),
                "props": pa.array(props),
            }
        ),
        os.path.join(FIXDIR, "events.parquet"),
        # keep nanos: pandas/pyarrow coercion must not silently downcast
        coerce_timestamps=None,
    )

    # --- orders: prices tying at .005 so quantile cuts + clip ties flip;
    # order dates interleaved with the EVENT timestamps above so SCD2
    # validity-window boundaries are actually hit (an event exactly at a
    # window's valid_from is simultaneously at the previous window's
    # valid_to — both the >= and < comparisons decide on equality) ---
    m = 6000
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT", "5-LOW"])[
        np.arange(m) % 5
    ]
    price = np.round(rng.uniform(1000, 500000, m), 2)
    # every 11th price sits exactly on a half-cent: x.005
    price[::11] = np.floor(price[::11]) + 0.005
    odate = []
    for i in range(m):
        if i % 3 == 0:
            # exactly an event's micros-truncated timestamp: boundary hit
            odate.append(ts[(i * 13) % n] // 1000)
        elif i % 3 == 1:
            # one microsecond past an event: the other side of the cut
            odate.append(ts[(i * 7) % n] // 1000 + 1)
        else:
            # long before any event: keeps open-ended current rows too
            odate.append(1_500_000_000_000_000 + i * 10**9)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(m), pa.int64()),
                # dense overlap with events.user_id (0..99)
                "o_custkey": pa.array(
                    (np.arange(m) % 120).astype("int64"), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[np.arange(m) % 3]
                ),
                "o_totalprice": pa.array(price, pa.float64()),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(prio),
            }
        ),
        os.path.join(FIXDIR, "orders.parquet"),
    )

    # --- documents: ttr*1e6 exactly on .5 (t=128 tokens, odd distinct) ---
    docs, langs, srcs = [], [], []
    for i in range(400):
        t_total = 128
        d_distinct = 2 * (i % 60) + 1  # odd -> d*1e6/128 = k + 0.5 exactly
        words = [f"w{j}" for j in range(d_distinct)]
        words += [words[0]] * (t_total - len(words))
        docs.append(" ".join(words))
        langs.append(["en", "de", "fr"][i % 3])
        srcs.append(f"src{i % 5}")
    # hostile-unicode tail: multi-byte text where BYTE-based and
    # CODEPOINT-based string functions diverge (the confirmed class:
    # DuckDB levenshtein counts bytes, Spark counts codepoints —
    # dedup_edit_distance ASCII-projects for exactly this reason). Two
    # near-identical accent families so the edit-distance and cosine
    # queries emit pairs THROUGH the unicode path, not around it.
    uni = [
        "héllo wörld naïve café résumé " + "中文 分词 测试 " * 3,
        "hello world naive cafe resume " + "中文 分词 测试 " * 3,
        "héllo wörld naïve café résumé " + "中文 分词 测试 " * 3 + "über",
        "señor piñata jalapeño año " * 8,
        "senor pinata jalapeno ano " * 8,
        "Ωμέγα άλφα βήτα γάμμα " * 6,
        "emoji 😀 mixed ascii text with tabs	and punctuation!!! " * 2,
        "ascii only control doc for the unicode block " * 2,
    ]
    # same lang WITHIN each near family so the lang-blocked pair miners
    # emit pairs THROUGH the unicode path (docs 0 and 2 differ only by a
    # short ascii suffix after projection: an emitted distance-4 pair)
    uni_langs = ["en", "en", "en", "de", "de", "fr", "fr", "fr"]
    for k, t in enumerate(uni):
        docs.append(t)
        langs.append(uni_langs[k])
        srcs.append(f"src{k % 5}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(langs),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(d) for d in docs], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, "documents.parquet"),
    )


    # --- lineitem + part: half-cent prices, FRACTIONAL quantities (the
    # q17 threshold premise-breaker), half-basis-point discounts ---
    nl = 5000
    okey = np.arange(nl) // 3
    pkey = rng.integers(0, 200, nl)
    qty = np.round(rng.uniform(1, 50, nl), 2)
    qty[::5] = np.floor(qty[::5]) + 0.005  # half-cent quantity boundary
    eprice = np.round(rng.uniform(900, 105000, nl), 2)
    eprice[::11] = np.floor(eprice[::11]) + 0.005
    disc = np.round(rng.uniform(0.0, 0.1, nl), 4)
    disc[::7] = np.round(disc[::7], 3) + 0.00005  # half-bp boundary
    ship = [1_450_000_000_000_000 + int(i) * 10**9 for i in range(nl)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okey, pa.int64()),
                "l_partkey": pa.array(pkey, pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, 100, nl), pa.int64()),
                "l_linenumber": pa.array((np.arange(nl) % 3 + 1).astype("int32")),
                "l_quantity": pa.array(qty, pa.float64()),
                "l_extendedprice": pa.array(eprice, pa.float64()),
                "l_discount": pa.array(disc, pa.float64()),
                "l_tax": pa.array(np.round(rng.uniform(0, 0.08, nl), 4)),
                "l_returnflag": pa.array(np.array(["A", "N", "R"])[np.arange(nl) % 3]),
                "l_linestatus": pa.array(np.array(["O", "F"])[np.arange(nl) % 2]),
                "l_shipdate": pa.array(ship, pa.timestamp("us")),
            }
        ),
        os.path.join(FIXDIR, "lineitem.parquet"),
    )
    np_part = 200
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(np_part), pa.int64()),
                "p_name": pa.array([f"part {i} small" for i in range(np_part)]),
                "p_brand": pa.array(
                    [f"Brand#{20 + i % 5}" for i in range(np_part)]
                ),
                "p_type": pa.array(
                    ["PROMO" if i % 4 == 0 else "ECONOMY" for i in range(np_part)]
                ),
                "p_size": pa.array((np.arange(np_part) % 50 + 1).astype("int32")),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900, 2000, np_part), 2)
                ),
            }
        ),
        os.path.join(FIXDIR, "part.parquet"),
    )

    # --- customer: half-cent acctbal boundaries + names that stress CSV
    # quoting (commas, quotes, unicode) and user_ids joinable to events ---
    nc = 300
    bal = np.round(rng.uniform(-999, 9999, nc), 2)
    bal[::9] = np.floor(bal[::9]) + 0.005  # .005 round-to-cents tie
    hostile_names = [
        'Cust, "quoted" #%d' % i if i % 3 == 0
        else ("Cüst—%d\ttab" % i if i % 3 == 1 else "Customer#%09d" % i)
        for i in range(nc)
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(nc), pa.int64()),
                "c_name": pa.array(hostile_names),
                "c_nationkey": pa.array(
                    (np.arange(nc) % 25).astype("int32")
                ),
                "c_acctbal": pa.array(bal, pa.float64()),
                "c_mktsegment": pa.array(
                    [f"SEG{i % 5}" for i in range(nc)]
                ),
            }
        ),
        os.path.join(FIXDIR, "customer.parquet"),
    )

    # --- embeddings: norms engineered onto floor-ppm integer boundaries ---
    # power-of-two components make norm^2 (and often norm) exactly
    # representable, so norm*1e6 can land exactly on an integer — the
    # floor boundary; zero vectors and duplicate rows stress the
    # degenerate paths. Immunity must come from both engines running the
    # identical fold + interp expression, not from the data being nice.
    vecs, labels = [], []
    for i in range(500):
        dim = 16
        if i % 7 == 0:
            v = [0.0] * dim  # zero vector: norm exactly 0
        elif i % 7 == 1:
            v = [0.25] * dim  # norm = 1.0 exactly -> ppm boundary 1000000
        elif i % 7 == 2:
            v = [float(2 ** ((j % 5) - 2)) for j in range(dim)]
        else:
            v = [float(x) for x in rng.normal(0, 1, dim).astype(np.float32)]
        vecs.append(v)
        labels.append(i % 10)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(500), pa.int64()),
                "embedding": pa.array(
                    vecs, pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(FIXDIR, "embeddings.parquet"),
    )


def main() -> int:
    build_fixtures()

    from mapreduce_sm_spark.registry import load_all_operators
    from mapreduce_sm_spark.session import get_spark

    # verify_local's exact canon/hash — the driver-strict compare
    sys.path.insert(0, _HERE)
    from verify_local import value_hash

    reg = load_all_operators()
    spark = get_spark("drift-probe")
    con = duckdb.connect()
    for t in (
        "events",
        "orders",
        "documents",
        "embeddings",
        "lineitem",
        "part",
        "customer",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{FIXDIR}/{t}.parquet'"
        )

    n_fail = 0
    for name in FIVE:
        q = reg.all()[name]
        try:
            # both sides through pandas — the driver's fetch path
            # (verify_local r07; fetchall() hid HUGEINT->float64 drift)
            from verify_local import _pd_rows

            sdf = q.fn(spark, FIXDIR)
            scols, srows = sdf.columns, _pd_rows(sdf.toPandas())
            from pyspark.sql.types import DateType

            s_dates = frozenset(
                f.name for f in sdf.schema.fields
                if isinstance(f.dataType, DateType)
            )
            odf = con.execute(q.oracle).df()
            ocols, orows = list(odf.columns), _pd_rows(odf)
            o_dates = frozenset(
                col for col, typ, *_ in
                con.execute(f"DESCRIBE ({q.oracle})").fetchall()
                if typ.upper() == "DATE"
            )
        except Exception as e:  # engine error IS a divergence signal here
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and value_hash(scols, srows, s_dates)
            == value_hash(ocols, orows, o_dates)
        )
        if ok:
            print(f"PASS {name} ({len(srows)} rows) — drift-immune")
        else:
            print(
                f"FAIL {name}: spark={len(srows)} oracle={len(orows)} "
                "(boundary flipped under drift fixtures)"
            )
            n_fail += 1
    print(f"\n{len(FIVE) - n_fail} drift-immune, {n_fail} drift-fragile")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

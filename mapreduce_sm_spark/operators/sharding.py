"""Training-data sharding, chunking, length-packing, and storage-layout
reports (§2.C extensions — the reference engine,
/root/reference/src/mapreduce.c, has no notion of documents; these compose
the same registered primitives the rest of the corpus pipeline uses).

What an LLM training pipeline does between "curated corpus" and "tensors":
  - split long documents into fixed-token-budget chunks with overlap
    (chunk_documents_plan),
  - assign every document to a deterministic shard so any worker can
    recompute the assignment without coordination (training_shard_manifest),
  - bucket the corpus by length so batches pack without padding waste
    (doc_length_deciles).

100 TB posture, per query:
  - chunking is embarrassingly parallel: per-row array math + explode, no
    shuffle at all until the caller aggregates;
  - shard assignment is a pure hash of the doc id (engine-portable md5 —
    functions/hashing.py), so the manifest is one partial-aggregable
    group-by on a 16-value key: map-side combine collapses each input
    partition to <=16 rows before the (trivial) shuffle;
  - the decile report NEVER globally sorts the corpus: it aggregates a
    token-length histogram (bounded domain — one row per distinct length),
    runs the cumulative window over that tiny frame, and splits each
    length's rank span across decile rank intervals with exact integer
    interval math. The doc-level row_number the oracle uses would be a
    single-task global sort at corpus scale; the histogram plan is the
    shape that survives it. All emitted values are integers (tie-free
    under engine/fixture drift — PLANS.md r05).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_sm_spark.functions.hashing import hash60, hash60_sql
from mapreduce_sm_spark.functions.text import WORD_TOKEN_RE_SQL
from mapreduce_sm_spark.functions.zorder import zvalue_sql
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# chunk budget in whitespace tokens; stride < chunk gives the overlap a
# retrieval/packing pipeline keeps for context continuity
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
N_SHARDS = 16

# ---------------------------------------------------------------------------
# Fixed-budget chunking with overlap: every document yields
# 1 + ceil(max(0, n - CHUNK) / STRIDE) chunks; chunk i covers tokens
# [i*STRIDE, i*STRIDE + len) with len = min(CHUNK, n - i*STRIDE). The
# final token is always covered and no chunk is empty. Integer math only.
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, toks, n_tokens,
         1 + (greatest(n_tokens - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})
             // {CHUNK_STRIDE} AS n_chunks
  FROM base
),
x AS (
  SELECT doc_id, toks, n_tokens,
         unnest(range(0, n_chunks)) AS chunk_id
  FROM c
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(least({CHUNK_TOKENS}, n_tokens - chunk_id * {CHUNK_STRIDE})
            AS BIGINT) AS chunk_len,
       toks[CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT)] AS first_token
FROM x
ORDER BY doc_id, chunk_id
"""


@REGISTRY.register(
    "chunk_documents_plan",
    oracle=_CHUNK_ORACLE,
    description=f"fixed {CHUNK_TOKENS}-token chunks, stride {CHUNK_STRIDE}: per-chunk spans",
    tags=("text", "chunking", "explode"),
)
def chunk_documents_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    d = (
        docs.select(
            "doc_id", F.split(F.col("text"), " ", -1).alias("toks")
        )
        .withColumn("n_tokens", F.size("toks").cast("long"))
        .withColumn(
            "n_chunks",
            F.expr(
                f"1 + (greatest(n_tokens - {CHUNK_TOKENS}, 0)"
                f" + {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE}"
            ),
        )
    )
    return (
        d.select(
            "doc_id",
            "toks",
            "n_tokens",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
            ).alias("chunk_id"),
        )
        .withColumn("start_tok", F.col("chunk_id") * CHUNK_STRIDE)
        .withColumn(
            "chunk_len",
            F.least(F.lit(CHUNK_TOKENS).cast("long"), F.col("n_tokens") - F.col("start_tok")),
        )
        .withColumn(
            "first_token",
            F.element_at("toks", (F.col("start_tok") + 1).cast("int")),
        )
        .select(
            "doc_id", "chunk_id", "n_tokens", "start_tok", "chunk_len",
            "first_token",
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# Deterministic shard manifest: shard = md5-hash(doc_id) mod N_SHARDS.
# Re-ingested, re-partitioned, or re-ordered input produces the identical
# manifest — the property that lets any worker (or a resumed job) find a
# document's shard without a lookup table.
# ---------------------------------------------------------------------------

_SHARD_ORACLE = f"""
WITH s AS (
  SELECT {hash60_sql("CAST(doc_id AS VARCHAR)", salt="shard")} % {N_SHARDS}
             AS shard_id,
         doc_id, lang,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
)
SELECT shard_id,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       count(DISTINCT lang) AS n_langs
FROM s
GROUP BY shard_id
ORDER BY shard_id
"""


@REGISTRY.register(
    "training_shard_manifest",
    oracle=_SHARD_ORACLE,
    description=f"deterministic md5 mod-{N_SHARDS} shard assignment: per-shard manifest",
    tags=("sharding", "hash", "aggregate"),
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    shard = F.pmod(
        hash60(F.col("doc_id").cast("string"), salt="shard"), F.lit(N_SHARDS)
    )
    return (
        docs.select(
            shard.alias("shard_id"),
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("n_toks"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# Length-decile packing report WITHOUT a global sort. Definition (what the
# oracle computes directly): rank every doc by (n_tokens, doc_id), decile
# of rank r out of n is ((r-1)*10) DIV n + 1; report per-decile doc and
# token totals. The Spark plan gets the same answer from the token-length
# HISTOGRAM alone: a length whose ranks span (s, e] contributes
# |(s, e] ∩ [lo_d, hi_d]| docs to decile d, where
#   lo_d = ((d-1)*n + 9) DIV 10 + 1,   hi_d = (d*n + 9) DIV 10
# — exact integer interval intersection, no row-level rank ever
# materialized. (Ties within a length split across a boundary by doc_id,
# but every row in the span has the same length, so the per-decile
# aggregates are independent of which ties land where.)
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents
),
r AS (
  SELECT n_toks,
         row_number() OVER (ORDER BY n_toks, doc_id) AS rn,
         count(*) OVER () AS n
  FROM t
)
SELECT CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile,
       count(*) AS n_docs,
       CAST(min(n_toks) AS BIGINT) AS min_tokens,
       CAST(max(n_toks) AS BIGINT) AS max_tokens,
       CAST(sum(n_toks) AS BIGINT) AS sum_tokens
FROM r
GROUP BY decile
ORDER BY decile
"""


@REGISTRY.register(
    "doc_length_deciles",
    oracle=_DECILE_ORACLE,
    description="token-length decile packing report from the length histogram (no global sort)",
    tags=("text", "histogram", "packing", "scale"),
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("len")
    )
    hist = docs.groupBy("len").agg(F.count("*").alias("cnt"))
    # cumulative window over the histogram only: one row per distinct
    # length (bounded by the max document length, not the corpus size)
    wcum = Window.orderBy("len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the corpus total n is the last cumulative value — a whole-frame max
    # over the same tiny histogram, NOT a second aggregate over documents
    # (a separate hist.agg(sum) subtree would re-scan the corpus: Spark
    # does not share unreferenced subplans without an explicit cache)
    whole = Window.partitionBy(F.lit(1))
    h = (
        hist.withColumn("cum_end", F.sum("cnt").over(wcum))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt"))
        .withColumn("n", F.max("cum_end").over(whole))
    )
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    j = h.crossJoin(F.broadcast(deciles))
    lo = F.expr("((decile - 1) * n + 9) DIV 10 + 1")
    hi = F.expr("(decile * n + 9) DIV 10")
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum_end"), hi)
        - F.greatest(F.col("cum_start") + 1, lo)
        + 1,
    )
    return (
        j.withColumn("overlap", overlap)
        .filter(F.col("overlap") > 0)
        .groupBy("decile")
        .agg(
            F.sum("overlap").alias("n_docs"),
            F.min("len").alias("min_tokens"),
            F.max("len").alias("max_tokens"),
            F.sum(F.col("len") * F.col("overlap")).alias("sum_tokens"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Z-order layout statistics: the curve math behind functions/zorder.py's
# write-time layout, oracle-checked bit-for-bit. Buckets are the top bits
# of the 32-bit Morton interleave of (customer key, order day); the
# per-bucket customer/day ranges are what parquet min/max stats would
# carry per file after a z-ordered write — narrow in BOTH dimensions,
# which is the whole point (tests/test_zorder.py measures the actual
# file-skipping effect; this query pins the arithmetic).
# ---------------------------------------------------------------------------

_Z_BUCKET_SHIFT = 4096  # keep the top 20 of 32 z-bits as the bucket id

_ZORDER_ORACLE = f"""
WITH z AS (
  SELECT o_custkey,
         epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
         {zvalue_sql(
             "o_custkey",
             "epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000",
         )} AS zv
  FROM orders
)
SELECT zv // {_Z_BUCKET_SHIFT} AS z_bucket,
       count(*) AS n_orders,
       min(o_custkey) AS min_custkey,
       max(o_custkey) AS max_custkey,
       CAST(min(day) AS BIGINT) AS min_day,
       CAST(max(day) AS BIGINT) AS max_day
FROM z
GROUP BY z_bucket
ORDER BY z_bucket
"""


@REGISTRY.register(
    "zorder_bucket_stats",
    oracle=_ZORDER_ORACLE,
    description="Morton z-curve bucket ranges over (custkey, order day): layout-skipping report",
    tags=("layout", "zorder", "scale"),
)
def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    day = "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000)"
    z = F.expr(zvalue_sql("o_custkey", day))
    return (
        o.select(
            "o_custkey",
            F.expr(day).cast("long").alias("day"),
            z.alias("zv"),
        )
        .groupBy(F.expr(f"zv DIV {_Z_BUCKET_SHIFT}").alias("z_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# Storage-layout queries that register the engine's two scan-elimination
# techniques as DRIVER-GATED surface (both were previously exercised only
# by tests, tests/test_sources.py):
#
#   partition_pruned_event_stats — hive-style partitionBy layout; a filter
#     on the partition column prunes whole directories at PLANNING time
#     (the scan never lists the other partitions' files). At 100 TB this
#     is the difference between reading 2 of N partitions and reading N.
#
#   bucketed_join_sales_by_segment — both join sides written bucketBy the
#     join key: the one shuffle each side would need is paid ONCE at
#     write time, and every later join/aggregation on that key is
#     exchange-free (tests/test_plans.py asserts the executed plan has a
#     SortMergeJoin with ZERO shuffle exchanges). This is Spark's answer
#     to the reference's hash-partitioned in-memory multimap
#     (/root/reference/src/mapreduce.c:145-153): co-location by key, but
#     durable and cluster-wide instead of per-process.
#
# Both detour through real writes per invocation (session-lived,
# atexit-reclaimed tmpdir / overwritten managed tables), so the driver's
# hash covers the full write -> catalog/layout -> read -> aggregate loop,
# not just the final aggregation.
# ---------------------------------------------------------------------------

_PART_PRUNE_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
ORDER BY event_type
"""


@REGISTRY.register(
    "partition_pruned_event_stats",
    oracle=_PART_PRUNE_ORACLE,
    description="hive-partitioned parquet layout: planning-time partition pruning round trip",
    tags=("layout", "partition-pruning", "source", "roundtrip"),
)
def partition_pruned_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_sm_spark.session import session_tmpdir
    from mapreduce_sm_spark.sources.sinks import write_parquet

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    d = session_tmpdir("evpart_")
    write_parquet(ev, d, partition_by=["event_type"])
    # explicit schema: an EMPTY input writes a partition dir with no data
    # files, and schema inference then fails (UNABLE_TO_INFER_SCHEMA);
    # the written schema is the pre-write frame's by construction
    back = spark.read.schema(ev.schema).parquet(d).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


_BUCKETED_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@REGISTRY.register(
    "bucketed_join_sales_by_segment",
    oracle=_BUCKETED_JOIN_ORACLE,
    description="both sides bucketed on the join key: exchange-free sort-merge join round trip",
    tags=("layout", "bucketing", "join", "roundtrip"),
)
def bucketed_join_sales_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import re

    from mapreduce_sm_spark.sources.sinks import write_bucketed_table

    # per-sf table names: repeated runs against different scale dirs must
    # not collide in the shared session catalog; sanitize EVERY
    # non-identifier char (a hyphenated dir would otherwise produce an
    # unparseable unquoted table name). write_bucketed_table additionally
    # pid-suffixes the name so concurrent PROCESSES never collide either
    # (ADVICE r07) — always read via the returned actual name.
    sfx = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/")))
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    t_ord = write_bucketed_table(
        orders, f"bkt_orders_{sfx}", ["o_custkey"], 8, ["o_custkey"]
    )
    t_cust = write_bucketed_table(
        cust, f"bkt_customer_{sfx}", ["c_custkey"], 8, ["c_custkey"]
    )
    o, c = spark.table(t_ord), spark.table(t_cust)
    # MERGE hint pins the sort-merge strategy (a broadcast would ALSO be
    # shuffle-free here but would not exercise the bucketing co-location
    # this query exists to register); with both sides bucketed+sorted on
    # the key, the SMJ needs neither exchange nor sort.
    joined = o.hint("merge").join(c, o["o_custkey"] == c["c_custkey"])
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "total_cents"
            ),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch shaping (r16). Trainers pad every sequence in a
# batch to the batch's longest member; batching documents of wildly
# different lengths together burns FLOPs on pad tokens. The standard
# mitigation is length bucketing: group sequences into width-W length
# buckets and batch within a bucket, so padding is bounded by W-1 per
# row. This operator quantifies the decision: per bucket, real tokens
# vs tokens padded to the global budget (naive batching) vs tokens
# padded to the bucket ceiling (bucketed batching), waste in exact
# per-mille. All integer arithmetic — tie-free across engines.
#
# 100 TB posture: one corpus scan, row-local tokenize + integer bucket
# math, a single partial-aggregable groupBy on a <= _PAD_SEQ/_PAD_W
# (8-value) key — map-side combine collapses every input partition to
# <= 8 rows before the shuffle. No join, no window over the corpus.
# ---------------------------------------------------------------------------

_PAD_SEQ = 128  # training sequence length (tokens); fixture docs are 10-110
_PAD_W = 16  # length-bucket width

_PAD_ORACLE = f"""
WITH t AS (
  SELECT least(len(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')),
               {_PAD_SEQ}) AS tok
  FROM documents
),
b AS (
  SELECT tok,
         least({_PAD_SEQ},
               greatest({_PAD_W}, ((tok + {_PAD_W - 1}) // {_PAD_W}) * {_PAD_W}))
             AS bucket_hi
  FROM t
)
SELECT bucket_hi,
       count(*)::BIGINT AS n_docs,
       sum(tok)::BIGINT AS real_tokens,
       (count(*) * {_PAD_SEQ})::BIGINT AS padded_naive,
       (count(*) * bucket_hi)::BIGINT AS padded_bucketed,
       ((count(*) * bucket_hi - sum(tok)) * 1000
           // (count(*) * bucket_hi))::BIGINT AS waste_pm
FROM b
GROUP BY bucket_hi
ORDER BY bucket_hi
"""


@REGISTRY.register(
    "length_bucket_padding_stats",
    oracle=_PAD_ORACLE,
    description="length-bucketed batch shaping: per width-16 token "
    "bucket, real tokens vs naive-padded vs bucket-padded token counts "
    "and exact per-mille padding waste — the measurement behind the "
    "bucketed-batching decision",
    tags=("sharding", "text", "scale"),
)
def length_bucket_padding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_sm_spark.functions.text import tokenize_words

    docs = table(spark, sf_dir, "documents").select("text")
    tok = F.least(
        F.size(tokenize_words("text")), F.lit(_PAD_SEQ)
    ).alias("tok")
    # integer ceil-to-width: ((tok + W-1) DIV W) * W, kept in longs
    bucket = F.least(
        F.lit(_PAD_SEQ).cast("long"),
        F.greatest(
            F.lit(_PAD_W).cast("long"),
            F.expr(f"((tok + {_PAD_W - 1}) DIV {_PAD_W}) * {_PAD_W}"),
        ),
    )
    return (
        docs.select(tok)
        .select("tok", bucket.alias("bucket_hi"))
        .groupBy("bucket_hi")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("real_tokens"),
            (F.count("*") * _PAD_SEQ).cast("long").alias("padded_naive"),
            (F.count("*") * F.col("bucket_hi")).cast("long").alias(
                "padded_bucketed"
            ),
        )
        .select(
            "bucket_hi",
            "n_docs",
            "real_tokens",
            "padded_naive",
            "padded_bucketed",
            F.expr(
                "(padded_bucketed - real_tokens) * 1000 DIV padded_bucketed"
            )
            .cast("long")
            .alias("waste_pm"),
        )
        .orderBy("bucket_hi")
    )

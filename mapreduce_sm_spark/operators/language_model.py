"""N-gram language-model statistics over the documents corpus (§2.C):
bigram conditional probabilities and Zipf rank/frequency diagnostics —
the counting passes a data pipeline runs to build n-gram LMs for
perplexity filtering and to sanity-check corpus token distributions.

Token grammar is the shared wordcount scanner (functions/text.py), so
these compose with the rest of the text stack.

100 TB posture:
- bigrams are built array-side (transform over token indices, codegen'd)
  so the explode emits exactly one row per adjacent pair — no self-join
  of an exploded token stream on (doc_id, pos), which would shuffle the
  60x-exploded corpus twice. One shuffle into the (w1,w2) count; the
  conditional-probability window runs on the aggregated vocab-sized
  frame, not the corpus.
- zipf ranks only the global top-k, fetched via TakeOrderedAndProject
  (no full sort, no single-partition global window over the vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_sm_spark.functions.text import (
    WORD_TOKEN_RE_SQL,
    tokenize_words,
)
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_TOKS_CTE = f"""
toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')) AS w,
         generate_subscripts(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}'), 1) AS pos
  FROM documents
)
"""


def _adjacent_pairs_col(tok_col: str):
    """array<struct<w1,w2>> of adjacent pairs of an ALREADY-MATERIALIZED
    token-array column. The column indirection is load-bearing: passing
    the tokenizer expression itself would re-evaluate the regexp inside
    every element_at call of the lambda (Catalyst does not CSE across
    higher-order-function lambda boundaries), turning one regexp pass per
    doc into ~2(n-1) — measured 9x slower on the sf0.1 doc_bi build."""
    t = F.col(tok_col)
    n = F.size(t)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")
        ),
    )

# The oracle builds bigrams with a lead() window over positioned tokens —
# semantically identical to the engine's array-side adjacent pairing.
_BIGRAM_ORACLE = f"""
WITH {_TOKS_CTE},
bi AS (
  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
agg AS (
  SELECT w1, w2, count(*) AS cnt FROM bi
  WHERE w2 IS NOT NULL GROUP BY w1, w2
),
probs AS (
  -- P(w2|w1) over ALL bigrams of w1, computed before the cnt cutoff
  SELECT w1, w2, cnt,
         cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY w1))::DOUBLE AS p_cond
  FROM agg
)
SELECT w1, w2, cnt, p_cond
FROM probs
WHERE cnt >= 3
ORDER BY cnt DESC, w1, w2
LIMIT 300
"""


@REGISTRY.register(
    "bigram_lm_counts",
    oracle=_BIGRAM_ORACLE,
    description="bigram counts + conditional probability P(w2|w1), top 300",
    tags=("text", "ngram", "aggregate"),
)
def bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # tokenize ONCE into a materialized column before pairing: inlining
    # the tokenizer into the transform lambda re-runs regexp_extract_all
    # inside every element_at call — ~2(n-1) full-text regexp passes per
    # doc instead of 1 (measured 9x on the doc_bi build, r16 opt round)
    base = docs.select(tokenize_words("text").alias("t"))
    bi = base.select(F.explode(_adjacent_pairs_col("t")).alias("b")).select(
        "b.w1", "b.w2"
    )
    agg = bi.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    p = (
        F.col("cnt").cast("double")
        / F.sum("cnt").over(Window.partitionBy("w1")).cast("double")
    )
    return (
        agg.withColumn("p_cond", p)
        .filter(F.col("cnt") >= 3)
        .orderBy(F.desc("cnt"), "w1", "w2")
        .limit(300)
    )


_ZIPF_ORACLE = f"""
WITH {_TOKS_CTE},
wc AS (SELECT w AS word, count(*) AS cnt FROM toks GROUP BY w),
ranked AS (
  SELECT word, cnt,
         row_number() OVER (ORDER BY cnt DESC, word) AS rnk,
         max(cnt) OVER () AS top_cnt
  FROM wc
)
SELECT rnk, word, cnt,
       cnt::DOUBLE * rnk::DOUBLE / top_cnt::DOUBLE AS zipf_product
FROM ranked
WHERE rnk <= 50
ORDER BY rnk
"""


@REGISTRY.register(
    "zipf_token_stats",
    oracle=_ZIPF_ORACLE,
    description="top-50 token frequencies with Zipf product cnt*rank/top",
    tags=("text", "aggregate", "statistics"),
)
def zipf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokenize_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    # top-k first (TakeOrderedAndProject), THEN rank the 50 survivors —
    # no global window over the full vocabulary.
    top = wc.orderBy(F.desc("cnt"), "word").limit(50)
    w_rank = Window.orderBy(F.desc("cnt"), "word")
    ranked = top.select(
        F.row_number().over(w_rank).alias("rnk"),
        "word",
        "cnt",
        F.max("cnt").over(Window.partitionBy()).alias("top_cnt"),
    )
    return ranked.select(
        "rnk",
        "word",
        "cnt",
        (
            F.col("cnt").cast("double")
            * F.col("rnk").cast("double")
            / F.col("top_cnt").cast("double")
        ).alias("zipf_product"),
    ).orderBy("rnk")


# ---------------------------------------------------------------------------
# PMI collocations: pointwise mutual information of adjacent word pairs —
# ln( p(w1,w2) / (p(w1) p(w2)) ). The standard collocation miner a
# corpus pipeline runs to find multiword expressions worth preserving as
# units during tokenization.
#
# Engine-portable by construction (r05 hardening): ln() comes from libm
# and can differ in the last ulp across engines/versions, and the old
# `ORDER BY pmi DESC ... LIMIT 100` made the top-100 CUT itself a
# double-boundary. Since ln is monotone, ranking by the PMI *ratio*
# r = (cnt_ab * N_uni^2) / (N_bi * cnt_a * cnt_b) is the same ranking —
# and r is an exact rational of integer counts. Both engines emit
# floor(1e6 * r) via exact integer arithmetic (Spark DECIMAL(38,0) `div`,
# DuckDB HUGEINT `//` — both truncating division on positives), so the
# ordering, the cut, and every emitted value are integer-exact. A reader
# wanting nats applies ln(ppm/1e6) client-side.
#
# 100 TB shape: bigram and unigram counts are the same two shuffles as
# bigram_lm_counts; the unigram side joins back on w1 then w2 (vocab-
# sized equality joins); the corpus totals are a 1-row broadcast.
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5

_PMI_ORACLE = f"""
WITH {_TOKS_CTE},
bi AS (
  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bc AS (
  SELECT w1, w2, count(*) AS cnt_ab FROM bi
  WHERE w2 IS NOT NULL GROUP BY w1, w2
),
uc AS (SELECT w AS word, count(*) AS cnt FROM toks GROUP BY w),
tot AS (
  SELECT (SELECT sum(cnt) FROM uc)::HUGEINT AS n_uni,
         (SELECT sum(cnt_ab) FROM bc)::HUGEINT AS n_bi
)
SELECT b.w1, b.w2, b.cnt_ab,
       CAST((1000000::HUGEINT * b.cnt_ab * t.n_uni * t.n_uni)
            // (t.n_bi * a.cnt * c.cnt) AS BIGINT) AS pmi_ratio_ppm
FROM bc b
JOIN uc a ON b.w1 = a.word
JOIN uc c ON b.w2 = c.word
CROSS JOIN tot t
WHERE b.cnt_ab >= {_PMI_MIN_COUNT}
ORDER BY pmi_ratio_ppm DESC, b.w1, b.w2
LIMIT 100
"""


@REGISTRY.register(
    "pmi_collocations",
    oracle=_PMI_ORACLE,
    description="top-100 adjacent-pair collocations by exact-integer PMI ratio (ppm)",
    tags=("text", "ngram", "statistics"),
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # tokenize-once column indirection — see _adjacent_pairs_col
    base = docs.select(tokenize_words("text").alias("t"))
    bc = (
        base.select(F.explode(_adjacent_pairs_col("t")).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt_ab"))
    )
    uc = (
        base.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    tot = uc.agg(F.sum("cnt").alias("n_uni")).crossJoin(
        bc.agg(F.sum("cnt_ab").alias("n_bi"))
    )
    a = uc.select(F.col("word").alias("w1"), F.col("cnt").alias("cnt_a"))
    c = uc.select(F.col("word").alias("w2"), F.col("cnt").alias("cnt_b"))
    # floor(1e6 * cnt_ab * n_uni^2 / (n_bi * cnt_a * cnt_b)) in exact
    # DECIMAL(38,0) integer arithmetic (`div` truncates; all terms
    # positive, so truncation == floor — same as the oracle's HUGEINT //).
    # Magnitudes: n_uni^2 * cnt_ab * 1e6 stays far below 1e38 for any
    # corpus whose token count fits in ~1e12.
    ppm = F.expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * cnt_ab * n_uni * n_uni) "
        "div (CAST(n_bi AS DECIMAL(38,0)) * cnt_a * cnt_b)"
    )
    return (
        bc.filter(F.col("cnt_ab") >= _PMI_MIN_COUNT)
        .join(a, "w1")
        .join(c, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "cnt_ab", ppm.alias("pmi_ratio_ppm"))
        .orderBy(F.desc("pmi_ratio_ppm"), "w1", "w2")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Per-document LM surprisal — the perplexity-style quality filter this
# module's docstring motivates. Scores every document by the average
# add-one-smoothed bigram surprisal under the corpus's OWN bigram LM
# (self-supervised, like production perplexity pruning: the filter model
# is trained on the corpus being filtered).
#
# Engine-portable by construction (the behavioral.py:246 exact-grid
# discipline, applied to logarithms): -log2 p would be libm-dependent,
# so the emitted statistic is the WHOLE-BIT floor of the surprisal,
# computed in pure integer arithmetic:
#
#   p = (c12 + 1) / (c1 + V)          (add-one smoothing; p < 1 always
#                                      because c1 >= c12 and V >= 2)
#   floor(-log2 p) = floor(log2(den/num)) = floor(log2(den DIV num))
#                  = length(bin(den DIV num)) - 1
#
# The middle equality holds because for integer q = den DIV num the real
# ratio den/num lies in [q, q+1), and no power of two can sit strictly
# inside (q, q+1) above q — so the integer division loses nothing at
# whole-bit granularity. Both engines render bin() minimally, so the
# per-bigram bits, the per-doc sums, and the top-40 cut are all
# integer-exact; the single avg division is the one double emitted
# (bit-identical: one division of two exact integers).
#
# 100 TB shape: the corpus is exploded to per-doc bigram MULTISETS first
# (one shuffle keyed (doc_id,w1,w2) with map-side combine), then joined
# to the bigram-vocabulary-sized LM tables on their own keys; the vocab
# size V is the only broadcast scalar. No corpus-scale window, no
# driver-side math.
# ---------------------------------------------------------------------------

# the WITH-parts up to per_doc, shared with corpus_ops.lm_curation_report
_SURPRISAL_CTES = f"""{_TOKS_CTE},
bi AS (
  SELECT doc_id, w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
doc_bi AS (
  SELECT doc_id, w1, w2, count(*)::BIGINT AS k
  FROM bi WHERE w2 IS NOT NULL GROUP BY doc_id, w1, w2
),
c12 AS (SELECT w1, w2, sum(k)::BIGINT AS c12 FROM doc_bi GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1),
vocab AS (SELECT count(DISTINCT w)::BIGINT AS v FROM toks),
scored AS (
  SELECT d.doc_id, d.k,
         (length(bin((c1.c1 + vocab.v) // (c12.c12 + 1))) - 1)::BIGINT AS bits
  FROM doc_bi d
  JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
  JOIN c1 ON d.w1 = c1.w1
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, sum(k)::BIGINT AS n_bigrams, sum(k * bits)::BIGINT AS total_bits
  FROM scored GROUP BY doc_id
)"""

_SURPRISAL_ORACLE = f"""
WITH {_SURPRISAL_CTES}
SELECT doc_id, n_bigrams, total_bits,
       total_bits::DOUBLE / n_bigrams::DOUBLE AS avg_bits
FROM per_doc
ORDER BY avg_bits DESC, doc_id
LIMIT 40
"""


@REGISTRY.register(
    "doc_lm_surprisal",
    oracle=_SURPRISAL_ORACLE,
    description="per-doc bigram-LM surprisal in exact whole bits "
    "(integer floor of -log2 p), top-40 most surprising documents",
    tags=("text", "ngram", "quality", "scale"),
    headline=True,  # r14: #3 most expensive registered query — graded by
    # the 2x gate every sitting (VERDICT r13 item 3)
)
def doc_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _doc_surprisal_frame(spark, sf_dir)
        .orderBy(F.desc("avg_bits"), "doc_id")
        .limit(40)
    )


def _doc_surprisal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, total_bits, avg_bits) for every document with
    at least one bigram — the full scoring relation behind
    doc_lm_surprisal's top-40 cut, shared with
    corpus_ops.lm_curation_report's quality gate."""
    docs = table(spark, sf_dir, "documents")
    from pyspark import StorageLevel

    from mapreduce_sm_spark.session import release_caches, track_caches

    # tokenize-once column indirection — see _adjacent_pairs_col
    base = docs.select("doc_id", tokenize_words("text").alias("t"))
    # doc_bi feeds BOTH the scoring join and the cascaded LM aggregates;
    # without a persist Catalyst computes the explode+aggregate subtree
    # once per consumer (three corpus explode passes in the executed
    # plan). Cache the finest aggregate so the corpus is exploded ONCE —
    # the c12/c1 cascade then runs over the cached multiset.
    release_caches("lm.surprisal")
    doc_bi = (
        base.select("doc_id", F.explode(_adjacent_pairs_col("t")).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    track_caches("lm.surprisal", doc_bi)
    # materialization barrier (the dedup_ngram_jaccard lesson): the LM
    # broadcast-build jobs and the scoring join read doc_bi concurrently
    # under AQE, and concurrent FIRST readers of a lazy cache each
    # recompute the explode+aggregate subtree (measured 7-17 s swings at
    # sf0.1 without the barrier; stable ~6-8 s with it)
    doc_bi.count()
    c12 = doc_bi.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = base.select(F.explode("t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    # floor(-log2 p) in pure integer arithmetic — see derivation above
    bits = (
        F.length(F.bin(F.expr("(c1 + v) div (c12 + 1)"))) - F.lit(1)
    ).cast("long")
    # fold the unigram prefix counts into the bigram LM table FIRST —
    # both are vocabulary-sized — so the corpus-sized doc_bi frame is
    # shuffled into exactly ONE join (on the bigram key), not two
    lm = c12.join(c1, ["w1"])
    per_doc = (
        doc_bi.join(lm, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "k", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("bits")).alias("total_bits"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        (
            F.col("total_bits").cast("double")
            / F.col("n_bigrams").cast("double")
        ).alias("avg_bits"),
    )

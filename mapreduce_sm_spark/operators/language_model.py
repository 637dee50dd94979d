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
    t = tokenize_words("text")
    n = F.size(t)
    # adjacent pairs built array-side: one output row per bigram
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")
        ),
    )
    bi = docs.select(F.explode(pairs).alias("b")).select("b.w1", "b.w2")
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
# log( p(w1,w2) / (p(w1) p(w2)) ). The standard collocation miner a
# corpus pipeline runs to find multiword expressions worth preserving as
# units during tokenization. All counts are exact integers; the only
# float math is the final ratio + ln, rounded to 6 digits in both
# engines (libm ln can differ in the last ulp across engines).
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
  SELECT (SELECT sum(cnt) FROM uc)::DOUBLE AS n_uni,
         (SELECT sum(cnt_ab) FROM bc)::DOUBLE AS n_bi
)
SELECT b.w1, b.w2, b.cnt_ab,
       round(ln((b.cnt_ab::DOUBLE / t.n_bi)
                / ((a.cnt::DOUBLE / t.n_uni) * (c.cnt::DOUBLE / t.n_uni))),
             6) AS pmi
FROM bc b
JOIN uc a ON b.w1 = a.word
JOIN uc c ON b.w2 = c.word
CROSS JOIN tot t
WHERE b.cnt_ab >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, b.w1, b.w2
LIMIT 100
"""


@REGISTRY.register(
    "pmi_collocations",
    oracle=_PMI_ORACLE,
    description="top-100 adjacent-pair collocations by pointwise mutual information",
    tags=("text", "ngram", "statistics"),
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = tokenize_words("text")
    n = F.size(t)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")
        ),
    )
    bc = (
        docs.select(F.explode(pairs).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt_ab"))
    )
    uc = (
        docs.select(F.explode(t).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    tot = uc.agg(F.sum("cnt").cast("double").alias("n_uni")).crossJoin(
        bc.agg(F.sum("cnt_ab").cast("double").alias("n_bi"))
    )
    a = uc.select(F.col("word").alias("w1"), F.col("cnt").alias("cnt_a"))
    c = uc.select(F.col("word").alias("w2"), F.col("cnt").alias("cnt_b"))
    pmi = F.round(
        F.log(
            (F.col("cnt_ab").cast("double") / F.col("n_bi"))
            / (
                (F.col("cnt_a").cast("double") / F.col("n_uni"))
                * (F.col("cnt_b").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    return (
        bc.filter(F.col("cnt_ab") >= _PMI_MIN_COUNT)
        .join(a, "w1")
        .join(c, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "cnt_ab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(100)
    )

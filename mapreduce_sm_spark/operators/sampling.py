"""Deterministic sampling & dataset-split operators (north-star §2.C —
what a training-data pipeline actually runs before training).

All sampling here is HASH-MOD sampling: a row is selected iff
hash60(key) % D < rate*D. Unlike rand()/TABLESAMPLE this is
- reproducible across runs, engines, partitionings, and cluster sizes,
- stable under data growth (a doc keeps its split forever — no train/test
  leakage when the corpus is re-snapshotted),
- exactly replayable by the DuckDB oracle.
That is the standard production technique for train/val/test assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.functions.hashing import hash60, hash60_sql
from mapreduce_sm_spark.functions.text import WORD_TOKEN_RE_SQL, tokenize_words
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import release_caches, table, track_caches

_MOD = 10000

# --- plain deterministic sample -------------------------------------------

_SAMPLE_RATE = 0.10  # 10%

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {hash60_sql("'sample|' || doc_id::VARCHAR")} % {_MOD} < {int(_SAMPLE_RATE * _MOD)}
ORDER BY doc_id
"""


@REGISTRY.register(
    "sample_documents_hashmod",
    oracle=_SAMPLE_ORACLE,
    description="deterministic 10% hash-mod sample (engine/run/partition stable)",
    tags=("sampling",),
)
def sample_documents_hashmod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    key = F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))
    return (
        docs.filter(hash60(key) % _MOD < int(_SAMPLE_RATE * _MOD))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# --- train/val/test split ---------------------------------------------------

_VAL_PCT, _TEST_PCT = 0.10, 0.10  # remainder -> train

_SPLIT_CASE_SQL = f"""
CASE
  WHEN {hash60_sql("'split|' || doc_id::VARCHAR")} % {_MOD} < {int(_VAL_PCT * _MOD)} THEN 'val'
  WHEN {hash60_sql("'split|' || doc_id::VARCHAR")} % {_MOD} < {int((_VAL_PCT + _TEST_PCT) * _MOD)} THEN 'test'
  ELSE 'train'
END
"""

_SPLIT_ORACLE = f"""
SELECT {_SPLIT_CASE_SQL} AS split, lang, count(*) AS n_docs,
       min(doc_id) AS first_doc
FROM documents
GROUP BY split, lang
ORDER BY split, lang
"""


@REGISTRY.register(
    "train_val_test_split",
    oracle=_SPLIT_ORACLE,
    description="leakage-proof train/val/test assignment via salted hash-mod",
    tags=("sampling", "split"),
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = hash60(
        F.concat(F.lit("split|"), F.col("doc_id").cast("string"))
    ) % _MOD
    split = (
        F.when(bucket < int(_VAL_PCT * _MOD), "val")
        .when(bucket < int((_VAL_PCT + _TEST_PCT) * _MOD), "test")
        .otherwise("train")
    )
    return (
        docs.groupBy(split.alias("split"), "lang")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("split", "lang")
    )


# --- weighted dataset mixture ----------------------------------------------
# Per-source sampling rates (the "mix wikipedia at 2x, web at 0.3x" knob).
# Rates are a plain dict -> CASE expression; selection stays hash-mod so
# the mixture is reproducible and each source's subset is stable.

_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}  # others: 0.1
_MIX_DEFAULT = 0.10


def _rate_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {int(r * _MOD)}" for s, r in _MIX_RATES.items()
    )
    return f"(CASE {whens} ELSE {int(_MIX_DEFAULT * _MOD)} END)"


_MIX_ORACLE = f"""
SELECT source, count(*) AS n_selected, min(doc_id) AS first_doc
FROM documents
WHERE {hash60_sql("'mix|' || doc_id::VARCHAR")} % {_MOD} < {_rate_sql()}
GROUP BY source
ORDER BY source
"""


@REGISTRY.register(
    "dataset_mixture_weights",
    oracle=_MIX_ORACLE,
    description="weighted per-source corpus mixture via hash-mod rates",
    tags=("sampling", "mixture"),
)
def dataset_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = hash60(
        F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))
    ) % _MOD
    rate = F.lit(int(_MIX_DEFAULT * _MOD))
    for s, r in reversed(list(_MIX_RATES.items())):
        rate = F.when(F.col("source") == s, int(r * _MOD)).otherwise(rate)
    return (
        docs.filter(bucket < rate)
        .groupBy("source")
        .agg(F.count("*").alias("n_selected"), F.min("doc_id").alias("first_doc"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PRIORITY SAMPLING (weight-proportional without replacement) — the
# missing member of the sampling family: hash-mod sampling is uniform;
# training-data mixtures want "sample documents proportional to length /
# quality weight", and the estimator question that follows ("what total
# weight does my sample represent?") needs an unbiased answer. Public
# literature: Duffield, Lund, Thorup, "Priority sampling for estimation
# of arbitrary subset sums" (JACM 2007): priority q_i = w_i / u_i with
# u_i uniform; keep the k largest priorities; with tau = the (k+1)-th
# priority, sum of max(w_i, tau) over the sample is an UNBIASED
# estimator of total weight (and of any subset sum) — within a factor
# of optimal variance among all k-sample schemes.
#
# Determinism discipline: u_i comes from the repo's shared 60-bit hash
# (u_i ~ (h_i+1)/2^60), so priorities are the exact rationals
# w_i * 2^60 / (h_i + 1) — computed as truncating integer division in
# DECIMAL(38,0) `div` / HUGEINT `//` (the pmi_ratio_ppm discipline) with
# doc_id as the total tiebreak. Every emitted value, including the DLT
# estimate itself, is therefore replayed bit-for-bit by the oracle — a
# weighted sampler with a full value-hash contract, no literal-TRUE
# booleans.
#
# 100 TB posture: the k+1 largest priorities are a TakeOrdered (per-
# partition top-(k+1), single tiny reduce — no global sort, no shuffle
# of the corpus); the weight total is one partial-aggregable sum. The
# scheme is mergeable for the same reason as KMV: the top-k of a union
# is computable from per-shard top-k synopses.
# ---------------------------------------------------------------------------

_PRIO_K = 64
_PRIO_M = 1 << 60
_PRIO_SALT = "psample"


_PRIORITY_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars AS w,
         {hash60_sql("'" + _PRIO_SALT + "|' || doc_id::VARCHAR")} AS h
  FROM documents
),
q AS (
  SELECT doc_id, w,
         (w::HUGEINT * {_PRIO_M}::HUGEINT) // (h + 1)::HUGEINT AS q
  FROM d
),
top AS (
  SELECT doc_id, w, q,
         row_number() OVER (ORDER BY q DESC, doc_id) AS rnk
  FROM q
  QUALIFY rnk <= {_PRIO_K + 1}
),
-- DLT: with n <= k every item is sampled and tau is defined as 0, making
-- the estimator sum(max(w, 0)) = sum(w) EXACT; min(q) here would be >= w
-- for every sampled row and strictly overestimate (ADVICE r09)
tau AS (SELECT CASE WHEN count(*) <= {_PRIO_K} THEN 0::HUGEINT
               ELSE min(q) END AS tau FROM top),
samp AS (SELECT doc_id, w, rnk FROM top WHERE rnk <= {_PRIO_K}),
tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS exact_total_weight FROM documents),
est AS (
  -- q is already in WEIGHT units (q = w/u = w*2^60/(h+1)), so the DLT
  -- estimator is sum over the sample of max(w_i, tau) directly
  SELECT CAST(sum(GREATEST(s.w::HUGEINT, t.tau)) AS BIGINT) AS est_total_weight
  FROM samp s, tau t
)
SELECT CAST(s.rnk AS BIGINT) AS rank, s.doc_id, CAST(s.w AS BIGINT) AS weight,
       e.est_total_weight, t.exact_total_weight
FROM samp s, est e, tot t
ORDER BY rank
"""


@REGISTRY.register(
    "priority_sample_documents",
    oracle=_PRIORITY_ORACLE,
    description="Duffield-Lund-Thorup priority sample (weight ~ n_chars) + unbiased subset-sum estimate, exact-integer replayable",
    tags=("sampling", "weighted", "sketch", "scale", "contract"),
)
def priority_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-64 priority sample of documents weighted by n_chars:
    (rank, doc_id, weight, est_total_weight, exact_total_weight) — the
    DLT estimate rides along so the sample is self-describing."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    return priority_sample(docs)


def priority_sample(docs: DataFrame, k: int = _PRIO_K) -> DataFrame:
    """DLT priority sample of a (doc_id, w) frame — the registered query's
    core, split out so the n <= k exact mode is unit-testable."""
    from pyspark.sql import Window

    key = F.concat(F.lit(_PRIO_SALT + "|"), F.col("doc_id").cast("string"))
    q = F.expr(
        f"CAST(w AS DECIMAL(38,0)) * CAST({_PRIO_M} AS DECIMAL(38,0))"
        " div CAST(h + 1 AS DECIMAL(38,0))"
    )
    # TakeOrdered(k+1): per-partition top-(k+1), one tiny reduce
    top = (
        docs.select("doc_id", "w", hash60(key).alias("h"))
        .select("doc_id", "w", q.alias("q"))
        .orderBy(F.col("q").desc(), "doc_id")
        .limit(k + 1)
    )
    win = Window.orderBy(F.col("q").desc(), "doc_id")  # 65 rows: safe window
    ranked = top.select(
        "doc_id", "w", "q", F.row_number().over(win).cast("long").alias("rank")
    )
    # tau = the (k+1)-th priority — except when the corpus has <= k rows:
    # then ALL rows are sampled and DLT prescribes tau = 0, so the
    # estimator collapses to sum(w) exactly (ADVICE r09; mirrors the KMV
    # exact-mode branch). q >= w always, so a min-of-sample tau would
    # strictly overestimate on tiny inputs.
    tau = ranked.agg(
        F.when(
            F.count("*") <= k, F.lit(0).cast("decimal(38,0)")
        )
        .otherwise(F.min("q"))
        .alias("tau")
    )
    samp = ranked.filter(F.col("rank") <= k)
    est = (
        samp.crossJoin(F.broadcast(tau))
        .agg(
            # q (and so tau) is already in WEIGHT units — see the oracle
            F.expr(
                "CAST(sum(GREATEST(CAST(w AS DECIMAL(38,0)), tau)) AS BIGINT)"
            ).alias("est_total_weight")
        )
    )
    tot = docs.agg(F.sum("w").cast("long").alias("exact_total_weight"))
    return (
        samp.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "doc_id",
            F.col("w").cast("long").alias("weight"),
            "est_total_weight",
            "exact_total_weight",
        )
        .orderBy("rank")
    )


# --- source-mixture (data-mixing) sample ------------------------------------
#
# The data-mixing step of LLM corpus assembly: downsample every source to
# a common token budget so no single source dominates training (the
# "balanced mixture" special case of temperature-based source weighting —
# public technique, cf. multilingual-corpus sampling in the XLM-R /
# mC4 line of work). Budget B = the smallest source's token count, so the
# target rate for source s is B / tokens_s <= 1.
#
# Determinism + engine portability: membership is hash-mod per document,
# and the rate comparison is EXACT — instead of comparing against the
# double B/tokens_s, both engines test
#
#     (hash60('mix|' || doc_id) % 1e6) * tokens_s  <  B * 1e6
#
# i.e. the rational inequality cross-multiplied into BIGINT (products
# stay < 2^63 for any source below ~9e12 tokens at the 1e6 grid; a
# 100 TB deployment bumps the grid into DECIMAL(38,0) the same way
# pmi_collocations does). Every emitted stat is an exact integer, and
# the realized rate is reported in exact ppm via integer division.
#
# 100 TB shape: one corpus pass computes per-doc token counts, one
# source-sized aggregate gets the budgets, and the kept-set is a filter
# joined against the BROADCAST per-source table — the corpus is never
# shuffled, only scanned.

_MIX_GRID = 1_000_000

_MIXTURE_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, source,
         len(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}'))::BIGINT AS toks
  FROM documents
),
per_src AS (SELECT source, sum(toks)::BIGINT AS tokens_s FROM dt GROUP BY source),
budget AS (SELECT min(tokens_s)::BIGINT AS b FROM per_src),
kept AS (
  SELECT dt.doc_id, dt.source, dt.toks
  FROM dt JOIN per_src USING (source) CROSS JOIN budget
  WHERE ({hash60_sql("'mix|' || dt.doc_id::VARCHAR")} % {_MIX_GRID}) * per_src.tokens_s
        < budget.b * {_MIX_GRID}
)
SELECT k.source,
       count(*)::BIGINT AS n_docs_kept,
       sum(k.toks)::BIGINT AS tokens_kept,
       (b.b * {_MIX_GRID}) // p.tokens_s AS rate_ppm
FROM kept k JOIN per_src p USING (source) CROSS JOIN budget b
GROUP BY k.source, p.tokens_s, b.b
ORDER BY k.source
"""


@REGISTRY.register(
    "source_mixture_sample",
    oracle=_MIXTURE_ORACLE,
    description="balanced data-mixing sample: every source hash-downsampled "
    "to the smallest source's token budget (exact integer rate test)",
    tags=("sampling", "mixing", "scale"),
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from mapreduce_sm_spark.session import release_caches, track_caches

    docs = table(spark, sf_dir, "documents")
    # dt feeds the per-source totals, the budget scalar AND the kept-set
    # filter; uncached, each consumer re-scans the corpus and re-runs the
    # tokenize-count regexp (three corpus passes in the executed plan).
    # dt is 3 narrow columns, one row per doc — cache it so the corpus
    # text is scanned and tokenized exactly once.
    release_caches("sampling.mixture")
    dt = docs.select(
        "doc_id",
        "source",
        F.size(tokenize_words("text")).cast("long").alias("toks"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    track_caches("sampling.mixture", dt)
    per_src = dt.groupBy("source").agg(F.sum("toks").alias("tokens_s"))
    budget = per_src.agg(F.min("tokens_s").alias("b"))
    key = F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))
    kept = (
        dt.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(budget))
        .filter(
            (hash60(key) % _MIX_GRID) * F.col("tokens_s")
            < F.col("b") * _MIX_GRID
        )
    )
    return (
        kept.groupBy("source", "tokens_s", "b")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("toks").alias("tokens_kept"),
        )
        .select(
            "source",
            "n_docs_kept",
            "tokens_kept",
            F.expr(f"(b * {_MIX_GRID}) div tokens_s").alias("rate_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Per-source unigram divergence (r15) — distributional mixture
# diagnostics: how far each source's token distribution sits from the
# corpus distribution, as an EXACT integer statistic. Mixture weighting
# (dataset_mixture_weights, source_mixture_sample) treats sources as
# populations; this measures whether they actually are distinct ones —
# a source distributionally identical to the corpus adds diversity
# nothing (the DoReMi-adjacent signal), while an outlier source is
# either valuable domain signal or contamination to inspect. Statistic:
# per-mille unigram histograms (floor(c * 1000 / n) — identical floor
# in both engines), L2^2 distance over the FULL corpus vocabulary, plus
# each source's most-divergent present token.
#
# The absent-token mass is folded in ALGEBRAICALLY — for tokens a
# source never emits, (0 - pm)^2 = pm^2, so
#   L2^2 = sum_present[(spm - pm)^2 - pm^2] + sum_all[pm^2]
# with the second term a corpus-level SCALAR — no source x vocabulary
# cross join, no dense histogram materialization.
#
# Plan shape: ONE corpus token explode into the canonical wordcount
# exchange groupBy(source, w); everything downstream is vocab- or
# source-sized (s_tot and the two scalars broadcast; the only other
# exchange joins the per-source and corpus histograms on w). 100 TB
# posture: per-term values are bounded by 2e6 (pm <= 1000), so the
# int64 sum holds to ~4.6e12 distinct tokens — three orders past a
# Heaps-law vocabulary at 2e13 corpus tokens. A source whose documents
# are all empty emits no tokens and is absent from the report (it has
# no distribution to diverge), documented here.
# ---------------------------------------------------------------------------

_SRC_DIV_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')) AS w
  FROM documents
),
sw AS (SELECT source, w, count(*)::BIGINT AS c FROM toks GROUP BY source, w),
s_tot AS (SELECT source, sum(c)::BIGINT AS n FROM sw GROUP BY source),
cw AS (SELECT w, sum(c)::BIGINT AS c FROM sw GROUP BY w),
c_tot AS (SELECT sum(c)::BIGINT AS t FROM cw),
cpm AS (SELECT w, (c * 1000) // t AS pm FROM cw, c_tot),
allsq AS (SELECT coalesce(sum(pm * pm), 0)::BIGINT AS s2 FROM cpm),
terms AS (
  SELECT sw.source, sw.w, ((sw.c * 1000) // s_tot.n) AS spm, cpm.pm
  FROM sw JOIN s_tot USING (source) JOIN cpm USING (w)
),
ranked AS (
  SELECT source, w, abs(spm - pm) AS d,
         row_number() OVER (
           PARTITION BY source ORDER BY abs(spm - pm) DESC, w
         ) AS rn
  FROM terms
)
SELECT t.source,
       (SELECT n FROM s_tot WHERE s_tot.source = t.source) AS n_tokens,
       (sum((t.spm - t.pm) * (t.spm - t.pm) - t.pm * t.pm)
        + (SELECT s2 FROM allsq))::BIGINT AS l2sq_pm2,
       max(CASE WHEN r.rn = 1 THEN r.w END) AS top_token,
       max(CASE WHEN r.rn = 1 THEN r.d END)::BIGINT AS top_diff_pm
FROM terms t
JOIN ranked r ON r.source = t.source AND r.w = t.w
GROUP BY t.source
ORDER BY t.source
"""


@REGISTRY.register(
    "source_unigram_divergence",
    oracle=_SRC_DIV_ORACLE,
    description="per-source unigram-distribution divergence from the "
    "corpus: exact integer per-mille L2^2 over the full vocabulary "
    "(absent-token mass folded algebraically) + the most-divergent "
    "token per source — mixture diagnostics",
    tags=("text", "sampling", "quality", "scale"),
)
def source_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("source", "text")
    # sw is the ONLY corpus-scale computation and it has three consumers
    # (s_tot, cw/cpm/allsq, terms) — without the persist Catalyst would
    # replay the corpus explode once per consumer (the doc_lm_surprisal
    # lesson). The persisted frame is vocab x sources sized, not corpus
    # sized; the bounded source-sized result is collected below so the
    # cache's lifetime is scoped to this call (the tokenizer-family
    # eager pattern — this operator is in the tripwire's explicit
    # eager set, tests/test_plans.py).
    sw = (
        docs.select("source", F.explode(tokenize_words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    try:
        s_tot = sw.groupBy("source").agg(F.sum("c").alias("n"))
        cw = sw.groupBy("w").agg(F.sum("c").alias("cc"))
        c_tot = cw.agg(F.sum("cc").alias("t"))
        cpm = cw.crossJoin(F.broadcast(c_tot)).select(
            "w", F.expr("cc * 1000 DIV t").alias("pm")
        )
        allsq = cpm.agg(
            F.coalesce(F.sum(F.col("pm") * F.col("pm")), F.lit(0))
            .cast("long")
            .alias("s2")
        )
        terms = (
            sw.join(F.broadcast(s_tot), "source")
            .withColumn("spm", F.expr("c * 1000 DIV n"))
            .join(cpm, "w")
            .select("source", "w", "n", "spm", "pm")
        )
        win = Window.partitionBy("source").orderBy(
            F.abs(F.col("spm") - F.col("pm")).desc(), F.col("w")
        )
        ranked = terms.withColumn("rn", F.row_number().over(win))
        out = (
            ranked.groupBy("source")
            .agg(
                F.max("n").cast("long").alias("n_tokens"),
                F.sum(
                    (F.col("spm") - F.col("pm")) * (F.col("spm") - F.col("pm"))
                    - F.col("pm") * F.col("pm")
                )
                .cast("long")
                .alias("_present"),
                F.max(F.when(F.col("rn") == 1, F.col("w"))).alias("top_token"),
                F.max(F.when(F.col("rn") == 1, F.abs(F.col("spm") - F.col("pm"))))
                .cast("long")
                .alias("top_diff_pm"),
            )
            .crossJoin(F.broadcast(allsq))
            .select(
                "source",
                "n_tokens",
                (F.col("_present") + F.col("s2")).cast("long").alias("l2sq_pm2"),
                "top_token",
                "top_diff_pm",
            )
            .orderBy("source")
        )
        rows = out.collect()
    finally:
        sw.unpersist()
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# DSIR-style importance selection (r16). Data Selection via Importance
# Resampling (Xie et al., 2023) scores each raw document by how much
# more likely it is under a TARGET-domain language model than under the
# raw-corpus model, then keeps the high-scoring docs. The published
# recipe uses hashed-ngram LM log-likelihood ratios and stochastic
# resampling; this operator keeps the structure but moves it onto the
# house exact integer grid so both engines agree bit-for-bit: unigram
# per-mille distributions for target (the doc_id%10 fixture slice) and
# raw, doc score = sum over tokens of c_w * (pm_target[w] - pm_raw[w])
# (the linearized log-ratio), and DETERMINISTIC threshold selection
# (score > 0 = "more target-like than raw") instead of resampling.
# Reported per source: train size, selected size, exact per-mille
# selection rate, and score mass.
#
# 100 TB posture: ONE corpus tokenize into the (doc_id, w, c) multiset,
# persisted because it feeds two consumers (the vocab aggregate and the
# per-doc scoring join) — the doc_lm_surprisal multi-consumer lesson,
# plan-pinned in tests/test_plans.py. Everything downstream is
# vocab-sized (pm join is a shuffle on w; totals are one broadcast
# scalar row) or doc-sized (the score rollup and report). No window
# over the corpus, no global sort, no driver data collect.
# ---------------------------------------------------------------------------

_DSIR_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, (doc_id % 10 = 0) AS ev, w, count(*)::BIGINT AS c
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')) AS w
        FROM documents)
  GROUP BY doc_id, w
),
vocab AS (
  SELECT w,
         coalesce(sum(c) FILTER (WHERE ev), 0)::BIGINT AS ct,
         coalesce(sum(c) FILTER (WHERE NOT ev), 0)::BIGINT AS cr
  FROM dt GROUP BY w
),
tot AS (SELECT coalesce(sum(ct), 0) AS nt, coalesce(sum(cr), 0) AS nr FROM vocab),
pm AS (
  SELECT w,
         CASE WHEN nt > 0 THEN ct * 1000 // nt ELSE 0 END AS pm_t,
         CASE WHEN nr > 0 THEN cr * 1000 // nr ELSE 0 END AS pm_r
  FROM vocab, tot
),
scores AS (
  SELECT dt.doc_id, sum(dt.c * (pm.pm_t - pm.pm_r))::BIGINT AS score
  FROM dt JOIN pm USING (w) WHERE NOT dt.ev
  GROUP BY dt.doc_id
),
train AS (SELECT doc_id, source FROM documents WHERE doc_id % 10 <> 0),
sel AS (
  SELECT t.source, coalesce(s.score, 0)::BIGINT AS score
  FROM train t LEFT JOIN scores s USING (doc_id)
)
SELECT source,
       count(*)::BIGINT AS n_train,
       sum(CASE WHEN score > 0 THEN 1 ELSE 0 END)::BIGINT AS n_selected,
       (sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) * 1000
           // count(*))::BIGINT AS selected_pm,
       coalesce(sum(CASE WHEN score > 0 THEN score END), 0)::BIGINT
           AS sum_score_selected,
       coalesce(max(score), 0)::BIGINT AS max_score
FROM sel
GROUP BY source
ORDER BY source
"""


@REGISTRY.register(
    "dsir_importance_selection",
    oracle=_DSIR_ORACLE,
    description="DSIR-style importance selection: docs scored by the "
    "exact integer unigram importance ratio vs the target slice, "
    "threshold-selected, per-source yield report (Xie et al. 2023, on "
    "the house per-mille grid with deterministic selection)",
    tags=("sampling", "mixing", "text", "scale"),
)
def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from mapreduce_sm_spark.session import release_caches, track_caches

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    release_caches("sampling.dsir")
    # the only corpus tokenize: (doc_id, w, c) multiset, two consumers
    dt = (
        docs.select(
            "doc_id", F.explode(tokenize_words("text")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn("ev", F.col("doc_id") % 10 == 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    track_caches("sampling.dsir", dt)
    vocab = dt.groupBy("w").agg(
        F.coalesce(
            F.sum(F.when(F.col("ev"), F.col("c"))), F.lit(0)
        ).cast("long").alias("ct"),
        F.coalesce(
            F.sum(F.when(~F.col("ev"), F.col("c"))), F.lit(0)
        ).cast("long").alias("cr"),
    )
    tot = vocab.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("nt"),
        F.coalesce(F.sum("cr"), F.lit(0)).cast("long").alias("nr"),
    )
    pm = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        F.expr("CASE WHEN nt > 0 THEN ct * 1000 DIV nt ELSE 0 END")
        .cast("long")
        .alias("pm_t"),
        F.expr("CASE WHEN nr > 0 THEN cr * 1000 DIV nr ELSE 0 END")
        .cast("long")
        .alias("pm_r"),
    )
    scores = (
        dt.filter(~F.col("ev"))
        .join(pm, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * (F.col("pm_t") - F.col("pm_r")))
            .cast("long")
            .alias("score")
        )
    )
    train = docs.select("doc_id", "source").filter(F.col("doc_id") % 10 != 0)
    sel = train.join(scores, "doc_id", "left").select(
        "source", F.coalesce("score", F.lit(0)).cast("long").alias("score")
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            one(F.col("score") > 0).alias("n_selected"),
            F.sum(F.when(F.col("score") > 0, F.col("score")))
            .alias("_sum_sel"),
            F.coalesce(F.max("score"), F.lit(0))
            .cast("long")
            .alias("max_score"),
        )
        .select(
            "source",
            "n_train",
            "n_selected",
            F.expr("n_selected * 1000 DIV n_train")
            .cast("long")
            .alias("selected_pm"),
            F.coalesce("_sum_sel", F.lit(0))
            .cast("long")
            .alias("sum_score_selected"),
            "max_score",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (r16, late). Multilingual /
# multi-source pre-training flattens the source distribution with a
# temperature exponent: sample source s proportional to n_s^alpha,
# alpha < 1 (mT5 / XLM-R's exponential smoothing; alpha in [0.2, 0.7]).
# dataset_mixture_weights covers fixed HAND-ASSIGNED rates; this
# operator computes the SIZE-DERIVED weights themselves — the step that
# produces such a rate table from corpus statistics.
#
# alpha is fixed at 0.5, deliberately: n^0.5 is the one sub-linear
# power computable EXACTLY on both engines. pow(n, 0.3) goes through
# libm exp/log whose last-bit rounding the JVM and DuckDB do not
# promise to share, but IEEE 754 sqrt is correctly rounded everywhere.
# The weight is the exact integer floor(100 * sqrt(n_tokens)) =
# isqrt(10^4 * n_tokens), computed as floor(sqrt((10^4 n)::DOUBLE))
# followed by a +/-1 integer correction: the double conversion's
# relative error is ~1e-16, so the candidate is off by at most 1, and
# the correction compares exact int64 values in an overflow-free
# subtraction form (see _isqrt_sql) — exact for every non-negative
# int64 input, so the only domain bound is 10^4 * n_tokens fitting
# int64: n_tokens <= ~9.2e14 per source (~35x a 100 TB corpus).
#
# 100 TB posture: one partial-aggregable per-source token-count
# aggregate over a row-local array length (the corpus is never
# exploded); everything after operates on the <= |sources|-row frame
# (the scalar total via a broadcast one-row cross join).
# ---------------------------------------------------------------------------

_TEMP_SCALE = 10_000  # weight = isqrt(10^4 * n) = floor(100 * sqrt(n))
_TEMP_EPOCH = 10_000  # docs drawn per epoch in the expectation column


def _isqrt_sql(x: str) -> str:
    """Exact integer sqrt of a non-negative BIGINT expression.

    The up-correction compares x - s0^2 >= 2*s0 + 1 rather than
    (s0+1)^2 <= x: the candidate s0 never exceeds isqrt(2^63-1) =
    3037000499 (the double conversion's relative error is ~1e-16, far
    under the 1 it would take to round past it), so s0^2 and 2*s0+1
    always fit in int64 while (s0+1)^2 overflows at the top of the
    domain — this form is exact for EVERY non-negative int64 input."""
    s0 = f"floor(sqrt(({x})::DOUBLE))::BIGINT"
    return (
        f"(CASE WHEN ({x}) - {s0} * {s0} >= 2 * {s0} + 1 THEN {s0} + 1 "
        f"WHEN {s0} * {s0} > ({x}) THEN {s0} - 1 "
        f"ELSE {s0} END)"
    )


_TEMP_ORACLE = f"""
WITH sz AS (
  SELECT source,
         sum(len(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')))::BIGINT
             AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_tokens,
         {_isqrt_sql(f"n_tokens * {_TEMP_SCALE}")} AS wgt
  FROM sz
),
tot AS (SELECT sum(wgt)::BIGINT AS tw FROM w)
SELECT source, n_tokens, wgt,
       (wgt * 1000000 // tw)::BIGINT AS share_ppm,
       (wgt * {_TEMP_EPOCH} // tw)::BIGINT AS docs_per_epoch
FROM w CROSS JOIN tot ORDER BY source
"""


def _isqrt_col(x):
    """Spark twin of _isqrt_sql — identical overflow-free correction."""
    s0 = F.floor(F.sqrt(x.cast("double"))).cast("long")
    return (
        F.when(x - s0 * s0 >= 2 * s0 + 1, s0 + 1)
        .when(s0 * s0 > x, s0 - 1)
        .otherwise(s0)
    )


@REGISTRY.register(
    "temperature_mixture_weights",
    oracle=_TEMP_ORACLE,
    description="mT5/XLM-R temperature mixture (alpha = 0.5): per-source "
    "sampling weights proportional to sqrt(token count), exact via "
    "integer-corrected IEEE sqrt — the size-derived rate table "
    "dataset_mixture_weights consumes",
    tags=("sampling", "mixture"),
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "text")
    release_caches("sampling.temperature")  # one-generation discipline
    sz = (
        docs.select("source", F.size(tokenize_words("text")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    # cache the |sources|-row rollup: the scalar total and the output
    # projection are two consumers, and an uncached frame would run the
    # corpus token-count scan once PER consumer (the doc_lm_surprisal
    # lesson — plan-pinned to one hash exchange in tests/test_plans.py)
    w = sz.select(
        "source",
        "n_tokens",
        _isqrt_col(F.col("n_tokens") * _TEMP_SCALE).alias("wgt"),
    ).cache()
    w.count()  # materialization barrier
    track_caches("sampling.temperature", w)
    tot = w.agg(F.sum("wgt").cast("long").alias("tw"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            "wgt",
            F.expr("wgt * 1000000 DIV tw").cast("long").alias("share_ppm"),
            F.expr(f"wgt * {_TEMP_EPOCH} DIV tw")
            .cast("long")
            .alias("docs_per_epoch"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Token-budget allocation (r16, late): the epoch planner the
# data-constrained scaling literature implies (Muennighoff et al. 2023:
# under a fixed compute/token budget, small high-value sources repeat
# for multiple epochs but repetition saturates — cap it — while large
# sources absorb the rest). Formally: capacitated proportional
# allocation (water-filling). Given per-source token counts n_s, the
# budget B = 2 * sum(n_s), weights w_s = isqrt(10^4 n_s) (the
# registered temperature weights — sub-linear, so small sources draw
# outsized shares and HIT the cap) and caps c_s = 4 n_s (the 4-epoch
# repetition ceiling), find the allocation alloc_s = min(c_s, t * w_s)
# whose water level t exhausts B over uncapped sources.
#
# Exact algorithm, identical in both engines: sort sources by cap/
# weight ratio — which for THIS (cap, weight) pair is c/w =
# (4/100) * sqrt(n), strictly monotone in n, so the exact ratio order
# IS (n_tokens, source): no float sort key exists anywhere. Greedy
# prefix capping with the standard criterion (row i caps iff
# c_i * S_{i-1} <= R_{i-1} * w_i over the remaining budget R and
# suffix weight S), made explicitly prefix-closed via a cumulative AND
# (a running min over the predicate), then the uncapped remainder
# splits proportionally by exact wide-integer floor division
# (DECIMAL(38,0) / HUGEINT — products like w * R overflow int64 at
# corpus scale; the tf_cosine wide-div idiom). The capping induction
# keeps R non-negative, so every emitted value is a non-negative exact
# integer. Zero-token sources carry cap 0 / weight 0 and fall out
# capped-at-zero with no special case.
#
# 100 TB posture: ONE row-local token-count rollup (the corpus is
# never exploded); every subsequent pass — prefix windows, the capped
# rollup, the allocation — runs on the <= |sources|-row frame with
# broadcast one-row scalar joins. The unpartitioned windows sit above
# that Aggregate (the plan-tripwire-sanctioned bounded shape).
# ---------------------------------------------------------------------------

_TB_BUDGET_X = 2  # B = 2x the corpus
_TB_EPOCH_CAP = 4  # c_s = 4 epochs


def _tb_widediv_sql(num: str, den: str) -> str:
    return f"(({num})::HUGEINT // ({den})::HUGEINT)::BIGINT"


_TB_ORACLE = f"""
WITH sz AS (
  SELECT source,
         sum(len(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')))::BIGINT
             AS n
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n, {_isqrt_sql(f"n * {_TEMP_SCALE}")} AS wgt,
         {_TB_EPOCH_CAP} * n AS cap
  FROM sz
),
tot AS (
  SELECT {_TB_BUDGET_X} * coalesce(sum(n), 0)::BIGINT AS b,
         coalesce(sum(wgt), 0)::BIGINT AS wtot
  FROM w
),
p AS (
  SELECT source, n, wgt, cap, b, wtot,
         sum(cap) OVER ord - cap AS pc_prev,
         sum(wgt) OVER ord - wgt AS pw_prev
  FROM w CROSS JOIN tot
  WINDOW ord AS (ORDER BY n, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f AS (
  SELECT *,
         CASE WHEN cap::HUGEINT * (wtot - pw_prev)
                   <= (b - pc_prev)::HUGEINT * wgt
              THEN 1 ELSE 0 END AS pred
  FROM p
),
g AS (
  SELECT *,
         min(pred) OVER (ORDER BY n, source
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS capped
  FROM f
),
s AS (
  SELECT coalesce(sum(cap * capped), 0)::BIGINT AS pc_k,
         coalesce(sum(wgt * capped), 0)::BIGINT AS pw_k
  FROM g
),
a AS (
  SELECT g.source, g.n, g.wgt, g.cap,
         CASE WHEN g.capped = 1 THEN g.cap
              ELSE {_tb_widediv_sql("g.wgt::HUGEINT * (g.b - s.pc_k)",
                                    "g.wtot - s.pw_k")}
         END AS alloc,
         (g.capped = 1) AS capped
  FROM g CROSS JOIN s
)
SELECT source, n AS n_tokens, wgt, cap, alloc,
       (alloc * 1000 // greatest(n, 1))::BIGINT AS epochs_pm, capped
FROM a ORDER BY source
"""


@REGISTRY.register(
    "token_budget_allocation",
    oracle=_TB_ORACLE,
    description="capacitated water-filling epoch planner: a 2x-corpus "
    "token budget split proportionally to the temperature weights with "
    "a 4-epoch repetition cap per source — exact greedy prefix capping "
    "(no float sort key: the ratio order reduces to token-count order) "
    "+ wide-integer proportional remainder",
    tags=("sampling", "mixture", "scale"),
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("source", "text")
    release_caches("sampling.budget")  # one-generation discipline
    sz = (
        docs.select("source", F.size(tokenize_words("text")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("n"))
    )
    # cached |sources|-row rollup: totals, prefix windows, the capped
    # rollup and the final projection all re-read this frame — uncached,
    # each consumer would repeat the corpus token-count scan
    w = sz.select(
        "source",
        "n",
        _isqrt_col(F.col("n") * _TEMP_SCALE).alias("wgt"),
        (F.lit(_TB_EPOCH_CAP) * F.col("n")).cast("long").alias("cap"),
    ).cache()
    w.count()  # materialization barrier
    track_caches("sampling.budget", w)
    zero = F.lit(0).cast("long")
    tot = w.agg(
        (F.lit(_TB_BUDGET_X) * F.coalesce(F.sum("n"), zero))
        .cast("long")
        .alias("b"),
        F.coalesce(F.sum("wgt"), zero).cast("long").alias("wtot"),
    )
    ord_w = Window.orderBy("n", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "wgt",
        "cap",
        "b",
        "wtot",
        (F.sum("cap").over(ord_w) - F.col("cap")).alias("pc_prev"),
        (F.sum("wgt").over(ord_w) - F.col("wgt")).alias("pw_prev"),
    )
    pred = F.expr(
        "CASE WHEN CAST(cap AS DECIMAL(38,0)) * (wtot - pw_prev)"
        " <= CAST(b - pc_prev AS DECIMAL(38,0)) * wgt THEN 1 ELSE 0 END"
    )
    g = p.withColumn("pred", pred).withColumn(
        "capped", F.min("pred").over(ord_w)
    )
    s = g.agg(
        F.coalesce(F.sum(F.col("cap") * F.col("capped")), zero)
        .cast("long")
        .alias("pc_k"),
        F.coalesce(F.sum(F.col("wgt") * F.col("capped")), zero)
        .cast("long")
        .alias("pw_k"),
    )
    alloc = F.expr(
        "CASE WHEN capped = 1 THEN cap ELSE"
        " CAST(((CAST(wgt AS DECIMAL(38,0)) * (b - pc_k)"
        "   - (CAST(wgt AS DECIMAL(38,0)) * (b - pc_k)) % (wtot - pw_k))"
        "  / (wtot - pw_k)) AS BIGINT) END"
    )
    return (
        g.crossJoin(F.broadcast(s))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "wgt",
            "cap",
            alloc.alias("alloc"),
            (F.col("capped") == 1).alias("capped"),
        )
        .select(
            "source",
            "n_tokens",
            "wgt",
            "cap",
            "alloc",
            F.expr("alloc * 1000 DIV greatest(n_tokens, 1)")
            .cast("long")
            .alias("epochs_pm"),
            "capped",
        )
        .select(
            "source", "n_tokens", "wgt", "cap", "alloc", "epochs_pm", "capped"
        )
        .orderBy("source")
    )

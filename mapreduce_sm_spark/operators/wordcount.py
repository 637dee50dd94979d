"""wordcount — the reference's flagship job, Spark-first.

Reference semantics (/root/reference/examples/wordcount/wordcount.c:56-124):
tokens are maximal runs matching [A-Za-z][A-Za-z']*, uppercased in place;
reduce sums per-token 1s; output ordered by count DESC rendered "%s\t%d".
Ties are unspecified in the reference (comparator returns 0 — SURVEY §5.2);
our spec adds `word ASC` as a deterministic tiebreak.

Spark plan: parquet scan (text column only — column pruning) ->
regexp_extract_all + explode (flatMap) -> partial+final HashAggregate
(map-side combine the reference lacked, mapreduce.c:292-303) ->
range-partitioned total-order sort. At 100 TB: the only shuffle is the
aggregate exchange on `word`; token skew (stopwords) is absorbed by the
partial aggregation — each partition pre-sums its hot words before the
exchange, so the shuffle carries one row per (partition, word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.functions.text import WORD_TOKEN_RE_SQL, tokenize_words
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import fan_out, table

_ORACLE = f"""
SELECT word, count(*) AS cnt
FROM (
    SELECT unnest(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')) AS word
    FROM documents
)
GROUP BY word
ORDER BY cnt DESC, word ASC
"""


@REGISTRY.register(
    "wordcount",
    oracle=_ORACLE,
    description="reference flagship 1: tokenize+upper -> count per word -> order by count desc",
    headline=True,
    tags=("reference", "aggregate", "sort"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents").select("text"))
    return (
        docs.select(F.explode(tokenize_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
    )


def wordcount_pipeline(spark: SparkSession, sf_dir: str):
    """The same job expressed through the Pipeline API (plans/pipeline.py),
    proving the five-slot surface reproduces the reference's job spec."""
    from mapreduce_sm_spark.plans import Pipeline, SortSpec

    return (
        Pipeline(lambda: table(spark, sf_dir, "documents").select("text"))
        .map(lambda df: df.select(F.explode(tokenize_words("text")).alias("word")))
        .reduce(["word"], [F.count("*").alias("cnt")])
        .sort(SortSpec("cnt", ascending=False), SortSpec("word", ascending=True))
        .to_df()
    )


# ---------------------------------------------------------------------------
# Custom-DataSource round trip: wordcount -> reference-format "%s\t%d"
# text -> read back through the `refmr` Python DataSource
# (sources/refmr_source.py, the engine's output_writer/file_reader
# extension-point parity) with a comparison filter PUSHED INTO the
# source's line scanner -> per-initial rollup. The oracle never sees the
# text detour, so a parse bug, a lost row, or a wrong pushdown in the
# custom source fails the exact hash.
# ---------------------------------------------------------------------------

_ROUNDTRIP_MIN_CNT = 100

_ROUNDTRIP_ORACLE = f"""
WITH wc AS (
  SELECT word, count(*) AS cnt
  FROM (
    SELECT unnest(regexp_extract_all(upper(text), '{WORD_TOKEN_RE_SQL}')) AS word
    FROM documents
  )
  GROUP BY word
)
SELECT substr(word, 1, 1) AS initial,
       count(*) AS n_words,
       CAST(sum(cnt) AS BIGINT) AS total_cnt
FROM wc
WHERE cnt >= {_ROUNDTRIP_MIN_CNT}
GROUP BY initial
ORDER BY initial
"""


@REGISTRY.register(
    "custom_source_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    description="wordcount -> formatted text -> refmr Python DataSource (pushdown) -> rollup",
    tags=("source", "datasource", "roundtrip"),
)
def custom_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_sm_spark.session import session_tmpdir
    from mapreduce_sm_spark.sources.refmr_source import read_formatted_text
    from mapreduce_sm_spark.sources.sinks import write_formatted_text

    wc = wordcount(spark, sf_dir)
    # the text detour must outlive this (lazy) DataFrame: a session-lived
    # (atexit-reclaimed) tmpdir, not a context-managed one
    d = session_tmpdir("refmr_roundtrip_")
    write_formatted_text(wc, "%s\t%d", ["word", "cnt"], d)
    back = read_formatted_text(spark, d, fmt="wordcount")
    return (
        back.filter(F.col("value") >= _ROUNDTRIP_MIN_CNT)
        .groupBy(F.substring("key", 1, 1).alias("initial"))
        .agg(
            F.count("*").alias("n_words"),
            F.sum("value").alias("total_cnt"),
        )
        .orderBy("initial")
    )

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
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

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

"""Similarity search over embedding columns (north-star extension §2.C).

  ann_bruteforce_topk    — exact cosine top-k: the correctness baseline
  ann_lsh_topk           — random-hyperplane LSH bucketing: the scale path
  embedding_similar_pairs— threshold pair mining inside label blocks

Scale posture (100 TB):
- brute force: the query set is broadcast; each executor scans its shard of
  the corpus computing codegen'd zip_with/aggregate dot products, keeping a
  per-partition top-k (TakeOrderedAndProject after the window) — no shuffle
  of the corpus itself.
- LSH: corpus is bucketed by 8 deterministic sign-hyperplanes; a query only
  probes its own bucket -> candidate set shrinks ~2^8 before any distance
  math. Hyperplane signs come from a seeded LCG so the DuckDB oracle
  reproduces buckets exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_sm_spark.functions.vectors import cosine_similarity, cosine_sql
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_DIM = 64
_N_QUERIES = 20  # vec_id < 20 are the query vectors
_TOP_K = 5


_BF_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < {_N_QUERIES}),
     c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings)
SELECT q_id, c_id, cos, rn AS rank
FROM (
  SELECT q_id, c_id,
         round({cosine_sql('qv', 'cv')}, 6) AS cos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round({cosine_sql('qv', 'cv')}, 6) DESC, c_id ASC) AS rn
  FROM q JOIN c ON q_id <> c_id
)
WHERE rn <= {_TOP_K}
ORDER BY q_id, rank
"""


@REGISTRY.register(
    "ann_bruteforce_topk",
    oracle=_BF_ORACLE,
    description="exact cosine top-5 neighbors for 20 query vectors",
    headline=True,
    tags=("similarity",),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", sim.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .orderBy("q_id", "rank")
    )


# --- LSH: 8 deterministic sign hyperplanes over the 64 dims ---------------

def _hyperplanes(n_planes: int = 8, dim: int = _DIM, seed: int = 7) -> list[list[int]]:
    """±1 hyperplane components from a fixed LCG (language-portable)."""
    planes = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) & 0x7FFFFFFF
            row.append(1 if (state >> 16) & 1 else -1)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()


def _bucket_spark(vec_col) -> F.Column:
    bits = []
    for j, plane in enumerate(_PLANES):
        signs = F.array(*[F.lit(float(s)) for s in plane])
        proj = F.aggregate(
            F.zip_with(vec_col, signs, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _bucket_sql(vec: str) -> str:
    terms = []
    for j, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(f"{float(s)}" for s in plane) + "]"
        proj = (
            f"list_reduce(list_transform(list_zip({vec}, {arr}), "
            f"p -> (p[1]::DOUBLE) * p[2]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_LSH_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS qv, bucket FROM b WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS c_id, embedding AS cv, bucket FROM b)
SELECT q_id, c_id, cos, rn AS rank
FROM (
  SELECT q_id, c_id,
         round({cosine_sql('qv', 'cv')}, 6) AS cos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round({cosine_sql('qv', 'cv')}, 6) DESC, c_id ASC) AS rn
  FROM q JOIN c ON q.bucket = c.bucket AND q_id <> c_id
)
WHERE rn <= {_TOP_K}
ORDER BY q_id, rank
"""


@REGISTRY.register(
    "ann_lsh_topk",
    oracle=_LSH_ORACLE,
    description="LSH (sign-hyperplane) bucketed approximate top-k",
    tags=("similarity", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _bucket_spark(F.col("embedding")).alias("bucket")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"), "bucket"
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        c.join(F.broadcast(q), (q.bucket == c.bucket) & (F.col("q_id") != F.col("c_id")))
        .select("q_id", "c_id", sim.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .orderBy("q_id", "rank")
    )


_PAIRS_THRESHOLD = 0.40

_PAIRS_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({cosine_sql('a.embedding', 'b.embedding')}, 6) >= {_PAIRS_THRESHOLD}
ORDER BY vec_a, vec_b
"""


@REGISTRY.register(
    "embedding_similar_pairs",
    oracle=_PAIRS_ORACLE,
    description="embedding-cosine near-pair mining within label blocks",
    tags=("similarity", "dedup"),
)
def embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label"),
        F.col("embedding").alias("va"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("vb"),
    )
    sim = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "label", sim.alias("cos"))
        .filter(F.col("cos") >= _PAIRS_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )

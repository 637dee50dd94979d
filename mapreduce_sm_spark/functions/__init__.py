"""Column-expression building blocks (JVM-side, whole-stage-codegen friendly).

Everything here returns pyspark Column expressions built from built-in
functions — no Python row-at-a-time UDFs — so the hot path stays inside
Tungsten codegen. The same computations are expressible in ANSI SQL for the
DuckDB oracle (see each function's `oracle` note).
"""

from mapreduce_sm_spark.functions.hashing import hash60, hash60_sql
from mapreduce_sm_spark.functions.text import tokenize_words, WORD_TOKEN_RE
from mapreduce_sm_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "hash60",
    "hash60_sql",
    "tokenize_words",
    "WORD_TOKEN_RE",
    "cosine_similarity",
    "dot",
    "l2_norm",
]

"""Operator inventory — importing this package registers every query.

Modules map to SURVEY.md §2 rows:
  wordcount / string_match  — the reference's two flagship jobs (§2.A)
  relational                — joins/aggs/setops/limits the reference lacks (§2.B)
  subqueries                — EXISTS / scalar-subquery / OR-predicate shapes (§2.B)
  reshape                   — pivot/unpivot, date arithmetic, moment stats (§2.B)
  analytic                  — window functions (§2.B)
  events                    — JSON + time-window (tumbling/sliding/session) (§2.B/§2.C)
  dedup                     — exact + MinHash/SimHash/Jaccard/embedding (§2.C)
  similarity                — brute-force + LSH ANN over embeddings (§2.C)
  text_analysis             — lang-id, quality, token counts, fingerprints (§2.C)
  multimodal                — binary-column decode plumbing (§2.C)
"""

from mapreduce_sm_spark.operators import (  # noqa: F401
    wordcount,
    string_match,
    relational,
    subqueries,
    reshape,
    olap,
    scale,
    arrays,
    strings,
    sampling,
    analytic,
    events,
    streaming_ops,
    joins_advanced,
    udf_surface,
    dedup,
    similarity,
    text_analysis,
    multimodal,
)

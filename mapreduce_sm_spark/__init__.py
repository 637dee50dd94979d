"""mapreduce_sm_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `mayconbordin/mapreduce-sm` (a shared-memory C MapReduce runtime:
mmap text source -> user map UDF -> hash shuffle -> grouped reduce UDF ->
comparator sort -> formatted text sink; see /root/reference and SURVEY.md),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
plus the LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns) mandated by the project north star.

Nothing here is a port of the reference's C code — Spark owns scheduling,
shuffle, sort and spill; this package only declares logical plans.
"""

from mapreduce_sm_spark.session import get_spark, stop_spark
from mapreduce_sm_spark.registry import REGISTRY, Query

__all__ = ["get_spark", "stop_spark", "REGISTRY", "Query"]

__version__ = "0.1.0"

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual inventory lives in ``mapreduce_sm_spark.registry``; operator
modules register themselves on import (one entry per SURVEY.md §2 row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_sm_spark.registry import load_all_operators

_REGISTRY = load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (wordcount — the reference's headline job) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from mapreduce_sm_spark.operators.wordcount import wordcount

    return wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _REGISTRY.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted keys -> rows-only check)."""
    return _REGISTRY.oracle_sql()

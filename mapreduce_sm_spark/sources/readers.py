"""Source connectors (SURVEY §2.B row 1: the reference supports exactly one
source — a single mmap'd local text file, /root/reference/src/mapreduce.c:167-222).

Spark generalizes that to splittable, schema-aware, predicate-pushdown
sources. `read_text` is the faithful equivalent (one string column per
line, with an optional line_no — the reference keys string_match output by
line number); the others are the formats any real pipeline needs.

Scale notes: all readers return lazy DataFrames; file listing/splitting is
Spark's (maxPartitionBytes governs split size). line numbers via
zipWithIndex are a narrow transformation (no shuffle) but pin the plan to
an RDD scan; only request them when the query needs reference-style keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType


def read_text(
    spark: SparkSession, path: str, with_line_numbers: bool = False
) -> DataFrame:
    """Lines of text ≡ the reference's splitter output (task chunks of
    lines, wordcount.c:24-54) — Spark assigns splits natively.

    with_line_numbers=True adds a global 0-based line_no column (true line
    numbers — the reference's per-character counter bug, SURVEY App. A.3,
    is deliberately not reproduced)."""
    if not with_line_numbers:
        return spark.read.text(path)
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    schema = StructType(
        [StructField("value", StringType()), StructField("line_no", LongType())]
    )
    return spark.createDataFrame(rdd.map(lambda t: (t[0], t[1])), schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other columnar warehouse format Spark reads natively, with
    the same vectorized scan + predicate pushdown + column pruning as
    parquet (PushedFilters show in .explain identically)."""
    return spark.read.orc(path)

"""string_match — the reference's second flagship job.

Reference semantics (/root/reference/examples/string_match/string_match.c:77-133):
emit every line containing a search word case-insensitively (strcasestr ≡
ILIKE '%w%'), keyed by line number, ordered ascending, rendered "%d:%s".
The reference's per-character "line number" is a bug (SURVEY App. A.3); our
line_no is the true row id (doc_id in the documents fixture).

Spark plan: parquet scan with the contains-filter evaluated right above the
scan (and doc_id/text the only columns read) -> range sort on line_no.
At 100 TB this is a pure map-side scan+filter — zero shuffles before the
output sort; with an unsorted sink requirement dropped it is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# The reference run used "english" against its private corpus
# (/root/reference/examples/string_match/run.sh:3); the fixture corpus is a
# synthetic word soup, so the canonical search word is one that actually
# occurs: "data".
SEARCH_WORD = "data"

_ORACLE = f"""
SELECT doc_id AS line_no, text AS line
FROM documents
WHERE contains(lower(text), '{SEARCH_WORD}')
ORDER BY line_no ASC
"""


@REGISTRY.register(
    "string_match",
    oracle=_ORACLE,
    description="reference flagship 2: case-insensitive substring filter, keyed by line number",
    headline=True,
    tags=("reference", "filter", "sort"),
)
def string_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(F.contains(F.lower(F.col("text")), F.lit(SEARCH_WORD)))
        .select(F.col("doc_id").alias("line_no"), F.col("text").alias("line"))
        .orderBy(F.col("line_no").asc())
    )

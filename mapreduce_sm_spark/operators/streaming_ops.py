"""Registry entries that drive the REAL Structured Streaming engine
(readStream -> stateful op -> availableNow -> memory sink) and surface the
final answer as a DataFrame, so the driver's oracle gate covers the
streaming path end-to-end — not just a batch twin of its logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mapreduce_sm_spark.registry import REGISTRY

_STATEFUL_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       (CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@REGISTRY.register(
    "stream_stateful_user_totals",
    oracle=_STATEFUL_ORACLE,
    description="applyInPandasWithState per-user running totals (real streaming run)",
    tags=("streaming", "stateful", "pandas-udf"),
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_sm_spark.streaming.stateful import run_stateful_user_totals

    # unique sink name per sf_dir: repeated runs must not collide
    qname = "stateful_totals_" + os.path.basename(sf_dir.rstrip("/")).replace(
        ".", "_"
    )
    return run_stateful_user_totals(
        spark, os.path.join(sf_dir, "events.parquet"), query_name=qname
    ).orderBy("user_id")

"""Zero-cost pipeline observability via Spark's Observation API.

`df.observe(...)` attaches aggregate metrics (row counts, null counts,
sums) that are computed DURING the action that consumes the frame — no
second scan, no extra job. This is how a 100 TB pipeline gets
data-quality counters (rows in/out, nulls seen, bytes of text) for free
on every run; a separate metrics query would double the I/O.

The reference engine's only observability is a wall-clock printf
(mapreduce.c:496-501); this is the Spark-native generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a frame.

    Returns (frame, observation). Run any action on the returned frame,
    then read `observation.get` — a dict of the metric values measured
    over exactly the rows that action processed.

        df2, obs = observed(df, "ingest",
                            n=F.count(F.lit(1)),
                            null_ts=F.count(F.lit(1)) - F.count("ts"))
        df2.write.parquet(path)
        stats = obs.get  # {"n": ..., "null_ts": ...}
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs


def quality_metrics(*cols: str) -> dict[str, Column]:
    """Standard per-column quality counters: total rows plus a null count
    per listed column — the minimal profile every ingest should record."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols:
        out[f"n_null_{c}"] = F.count(F.lit(1)) - F.count(c)
    return out

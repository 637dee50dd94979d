"""Behavioral / clickstream analytics over the events table (§2.B/§2.C):
gap-based batch sessionization, ordered funnel conversion, weekly
retention cohorts, and per-type z-score anomaly detection.

These are the event-log shapes a training-data pipeline runs to segment
and filter interaction logs before sampling. All pure column
expressions — JVM-side, codegen'd, no Python in the hot path.

Reference parity: the reference engine (mapreduce.c:167-512) expresses
only map/combine/reduce/sort; these queries are the §2.B "relational
completion" analogues built from window functions + joins, with DuckDB
oracles for every one.

100 TB posture, per query:
- sessionize: one shuffle on user_id; the lag/running-sum window and the
  (user_id, session_idx) aggregate share that partitioning, so Catalyst
  plans a single Exchange. Per-user state is a sort of that user's
  events — bounded by per-user activity, the natural unit.
- funnel: three conditional-min aggregates over user_id, each a partial
  agg before its shuffle; stage frames shrink to |users| rows and the
  final counts are 1-row broadcasts.
- retention: distinct (user, week) then a join on user_id against the
  |users|-row first-seen frame; both sides hash-partition on user_id.
- anomaly z-score: component sums per event_type (5 groups -> tiny), the
  5-row stats frame broadcast back, per-row z in codegen, one final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import ts_str, ts_str_sql, date_str, date_str_sql
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# ---------------------------------------------------------------------------
# Gap-based sessionization (batch analogue of session_window_events):
# a session breaks after >30 min of inactivity. Timestamp comparisons are
# exact microsecond interval arithmetic in both engines; durations are
# epoch-microsecond differences (no truncation ambiguity).
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM seq
)
SELECT user_id,
       session_idx::BIGINT AS session_idx,
       {ts_str_sql('min(ts)')} AS session_start,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
       (CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR))::DOUBLE AS sum_value
FROM sess
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


@REGISTRY.register(
    "sessionize_events",
    oracle=_SESSIONIZE_ORACLE,
    description="gap-based (30 min) batch sessionization: lag + running sum -> per-session rollup",
    tags=("window", "sessionization", "behavioral"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id", "ts", "event_id", "value", is_new.alias("is_new")
    ).select(
        "user_id",
        "ts",
        "value",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            ts_str(F.min("ts")).alias("session_start"),
            F.count("*").alias("n_events"),
            # fixture ts is TIMESTAMP_NTZ; unix_micros requires TIMESTAMP —
            # session TZ is pinned UTC (session.py) so the cast preserves
            # the instant exactly
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            ).alias("duration_us"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "session_idx")
    )


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click (strictly after the user's first view)
# -> purchase (strictly after that click). Classic 3-stage conversion.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click_after_view,
       (SELECT count(*) FROM p) AS n_purchase_after_click,
       (SELECT count(*) FROM c)::DOUBLE
           / nullif((SELECT count(*) FROM v), 0)::DOUBLE AS view_to_click,
       (SELECT count(*) FROM p)::DOUBLE
           / nullif((SELECT count(*) FROM c), 0)::DOUBLE AS click_to_purchase
"""


@REGISTRY.register(
    "funnel_view_click_purchase",
    oracle=_FUNNEL_ORACLE,
    description="3-stage ordered funnel: first view -> later click -> later purchase",
    tags=("join", "behavioral"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count("*").alias("n_view"))
    nc = c.agg(F.count("*").alias("n_click_after_view"))
    np_ = p.agg(F.count("*").alias("n_purchase_after_click"))
    # three 1-row frames; the cross joins are broadcast-trivial
    out = nv.crossJoin(nc).crossJoin(np_)
    return out.select(
        "n_view",
        "n_click_after_view",
        "n_purchase_after_click",
        (
            F.col("n_click_after_view").cast("double")
            / F.nullif(F.col("n_view"), F.lit(0)).cast("double")
        ).alias("view_to_click"),
        (
            F.col("n_purchase_after_click").cast("double")
            / F.nullif(F.col("n_click_after_view"), F.lit(0)).cast("double")
        ).alias("click_to_purchase"),
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts: cohort = ISO week of a user's first event;
# a cell counts distinct cohort users active in week cohort+offset.
# Both engines truncate weeks to Monday, so bucket edges agree; offsets
# divide an exact multiple of 7 days.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = f"""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
)
SELECT {date_str_sql('f.cw')} AS cohort_week,
       CAST(date_diff('day', f.cw, a.aw) / 7 AS INT) AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@REGISTRY.register(
    "retention_cohorts_weekly",
    oracle=_RETENTION_ORACLE,
    description="weekly cohort retention matrix: first-seen week x activity-week offset",
    tags=("join", "behavioral", "aggregate"),
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("aw")
    ).distinct()
    joined = active.join(first_seen, "user_id")
    return (
        joined.groupBy(
            date_str("cw").alias("cohort_week"),
            (F.datediff("aw", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Z-score anomaly detection per event_type. Mean/stddev come from exact
# decimal component sums (the stats_moments_lineitem pattern); the derived
# per-row z is still a chain of float ops whose last ulps can differ
# between engines, so every emitted float — and the z fed to the |z| > 2
# cut — is rounded to 6 digits on BOTH sides (the round(...,6) discipline
# the similarity queries use). r03 post-mortem: the unrounded version
# agreed to 9 digits but failed the driver's exact hash.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH comp AS (
  SELECT event_type,
         count(*)::DOUBLE AS n,
         (CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR))::DOUBLE AS sx,
         (CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS VARCHAR))::DOUBLE AS sxx
  FROM events GROUP BY event_type
),
stats AS (
  SELECT event_type, n, sx / n AS mean,
         sqrt((sxx - sx * sx / n) / (n - 1)) AS std
  FROM comp
)
SELECT e.event_type,
       count(*) AS n_events,
       sum(CASE WHEN round(abs((e.value - s.mean) / s.std), 6) > 2
                THEN 1 ELSE 0 END) AS n_anomalies,
       max(round(abs((e.value - s.mean) / s.std), 6)) AS max_abs_z,
       round(min(s.mean), 6) AS mean_value,
       round(min(s.std), 6) AS std_value
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


@REGISTRY.register(
    "anomaly_zscore_events",
    oracle=_ZSCORE_ORACLE,
    description="per-type z-score outlier counts from exact component sums",
    tags=("aggregate", "statistics", "behavioral"),
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,4)")
    comp = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    stats = comp.select(
        "event_type",
        (sx / n).alias("mean"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))).alias("std"),
    )
    z = F.round(F.abs((F.col("value") - F.col("mean")) / F.col("std")), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(z > 2, 1).otherwise(0)).alias("n_anomalies"),
            F.max(z).alias("max_abs_z"),
            F.round(F.min("mean"), 6).alias("mean_value"),
            F.round(F.min("std"), 6).alias("std_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Time-windowed event dedup (batch twin of the streaming
# dropDuplicatesWithinWatermark query): a telemetry pipeline drops
# repeats of the same (user, event_type, value) arriving within 5
# minutes of the previous occurrence — double-clicks, retry storms,
# at-least-once delivery. One shuffle on the dedup key; per-key state is
# a lag window over that key's events.
# ---------------------------------------------------------------------------

_EVENT_DEDUP_ORACLE = """
WITH seq AS (
  SELECT event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type, value
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       sum(CASE WHEN prev_ts IS NOT NULL
                     AND ts <= prev_ts + INTERVAL 5 MINUTE
                THEN 1 ELSE 0 END) AS n_dropped,
       count(*) - sum(CASE WHEN prev_ts IS NOT NULL
                                AND ts <= prev_ts + INTERVAL 5 MINUTE
                           THEN 1 ELSE 0 END) AS n_kept
FROM seq
GROUP BY event_type
ORDER BY event_type
"""


@REGISTRY.register(
    "dedup_events_time_window",
    oracle=_EVENT_DEDUP_ORACLE,
    description="drop repeated (user,type,value) events within 5 min: per-type keep/drop counts",
    tags=("dedup", "window", "behavioral"),
)
def dedup_events_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type", "value").orderBy(
        "ts", "event_id"
    )
    prev_ts = F.lag("ts").over(w)
    dup = F.when(
        prev_ts.isNotNull()
        & (F.col("ts") <= prev_ts + F.expr("INTERVAL 5 MINUTES")),
        1,
    ).otherwise(0)
    return (
        ev.select("event_type", dup.alias("dup"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("dup").alias("n_dropped"),
            (F.count("*") - F.sum("dup")).alias("n_kept"),
        )
        .orderBy("event_type")
    )

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
# Z-score anomaly detection per event_type, computed entirely in exact
# integer arithmetic so no emitted value and no decision boundary depends
# on double ulp agreement between engines (r03/r04 post-mortem: the
# round(z, 6) > 2 cut and the round-6 double outputs failed the driver's
# exact hash twice while passing the identical local gate — the boundary
# itself has to leave the double domain).
#
# Derivation: with v4 = value scaled to 1e-4 units (an exact integer —
# the fixture's value is a 2-decimal quantity, so value*1e4 sits ~4e-8
# from the integer grid and both engines' round() agree), the sample
# z-score condition |v - mean| / std > 2 is equivalent to
#
#   (n*v4 - sx4)^2 * (n - 1)  >  4 * n * (n*sxx8 - sx4^2)
#
# where sx4 = sum(v4), sxx8 = sum(v4^2): multiply through by n^2*(n-1)
# and by 1e8 to clear both denominators. Every term is an integer;
# Spark evaluates them in DECIMAL(38,0) (values stay < 1e33 even at
# sf10), the oracle in HUGEINT. A zero-variance group makes the RHS 0
# and the LHS 0 as well (all v equal), so no anomaly — matching the
# z-undefined-at-std=0 convention of the double version.
#
# Emitted stats are exact integers too: floor-scaled mean (1e-4 units)
# via integer division, plus min/max in the same units.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(round(value * 10000) AS HUGEINT) AS v4
  FROM events
),
comp AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(v4) AS HUGEINT) AS sx4,
         CAST(sum(v4 * v4) AS HUGEINT) AS sxx8,
         min(v4) AS min_q4,
         max(v4) AS max_q4
  FROM v GROUP BY event_type
)
SELECT v.event_type,
       CAST(min(c.n) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN (c.n * v.v4 - c.sx4) * (c.n * v.v4 - c.sx4)
                          * (c.n - 1)
                          > 4 * c.n * (c.n * c.sxx8 - c.sx4 * c.sx4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       CAST(min(c.sx4 // c.n) AS BIGINT) AS mean_q4,
       CAST(min(c.min_q4) AS BIGINT) AS min_q4,
       CAST(min(c.max_q4) AS BIGINT) AS max_q4
FROM v JOIN comp c ON v.event_type = c.event_type
GROUP BY v.event_type
ORDER BY v.event_type
"""


@REGISTRY.register(
    "anomaly_zscore_events",
    oracle=_ZSCORE_ORACLE,
    headline=True,
    description="per-type z-score outlier counts via exact integer cross-multiplied cut",
    tags=("aggregate", "statistics", "behavioral"),
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # exact integer grid: value is a 2-decimal quantity; *1e4 is ~4e-8
    # from an integer so HALF_UP (Spark) vs nearbyint (DuckDB) agree
    v4 = F.round(F.col("value") * 10000, 0).cast("long")
    v = ev.select("event_type", v4.alias("v4"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    comp = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v4").alias("sx4"),
        # v4^2 in decimal so the sum can't overflow long at high SF
        F.sum(F.col("v4").cast("decimal(19,0)") * F.col("v4").cast("decimal(19,0)")).alias("sxx8"),
        F.min("v4").alias("min_q4"),
        F.max("v4").alias("max_q4"),
    )
    # z > 2  <=>  (n*v4 - sx4)^2 * (n-1) > 4n * (n*sxx8 - sx4^2), exact
    lhs_root = dec("n") * dec("v4") - dec("sx4")
    lhs = lhs_root * lhs_root * (dec("n") - F.lit(1))
    rhs = F.lit(4) * dec("n") * (dec("n") * F.col("sxx8") - dec("sx4") * dec("sx4"))
    return (
        v.join(F.broadcast(comp), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n_events"),
            F.sum(F.when(lhs > rhs, 1).otherwise(0)).alias("n_anomalies"),
            F.min(F.expr("sx4 DIV n")).alias("mean_q4"),
            F.min("min_q4").alias("min_q4"),
            F.min("max_q4").alias("max_q4"),
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

# The 5-minute boundary test runs on int64 epoch-MICROS, not on
# timestamp/interval arithmetic: Spark timestamps are always micros, and
# the oracle casts through TIMESTAMP (micros) first, so even a fixture
# regenerated with nanosecond precision truncates identically on both
# sides (session.table() floors nanos DIV 1000 the same way). r04
# post-mortem: the `ts <= prev_ts + INTERVAL 5 MINUTE` form sat exactly
# on the boundary under fixture/engine drift and failed the exact hash.

_EVENT_DEDUP_ORACLE = """
WITH seq AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
         lag(epoch_us(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id, event_type, value
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
             AS prev_tsu
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN prev_tsu IS NOT NULL
                          AND tsu <= prev_tsu + 300000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(CASE WHEN prev_tsu IS NOT NULL
                                     AND tsu <= prev_tsu + 300000000
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM seq
GROUP BY event_type
ORDER BY event_type
"""


@REGISTRY.register(
    "dedup_events_time_window",
    oracle=_EVENT_DEDUP_ORACLE,
    headline=True,
    description="drop repeated (user,type,value) events within 5 min: per-type keep/drop counts",
    tags=("dedup", "window", "behavioral"),
)
def dedup_events_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session TZ is pinned UTC (session.py), so the NTZ->TZ cast is a
    # wall-clock no-op and unix_micros matches DuckDB's epoch_us exactly
    ev = table(spark, sf_dir, "events").withColumn(
        "tsu", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id", "event_type", "value").orderBy(
        "tsu", "event_id"
    )
    prev_tsu = F.lag("tsu").over(w)
    dup = F.when(
        prev_tsu.isNotNull()
        & (F.col("tsu") <= prev_tsu + F.lit(300_000_000)),
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

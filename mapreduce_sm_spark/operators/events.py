"""Event-table operators: JSON extraction and time windows
(tumbling / sliding / session) — the batch semantics that
streaming/windows.py reuses under Structured Streaming.

100 TB: tumbling/sliding windows are plain grouped aggregates on a derived
bucket key — one shuffle, partial-agg friendly. Session windows shuffle on
user_id; per-user state is bounded by the gap timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import ts_str, ts_str_sql
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       min(event_id) AS first_event
FROM events
GROUP BY k_bucket
ORDER BY k_bucket
"""


@REGISTRY.register(
    "json_extract_events",
    oracle=_JSON_ORACLE,
    description="JSON property extraction (get_json_object) + group",
    tags=("json",),
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
            "event_id",
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_event"))
        .orderBy("k_bucket")
    )


_TUMBLING_ORACLE = f"""
SELECT {ts_str_sql("time_bucket(INTERVAL '1 hour', ts)")} AS win_start,
       event_type, count(*) AS n, round((CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR))::DOUBLE, 4) AS sum_value
FROM events
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


@REGISTRY.register(
    "tumbling_window_events",
    oracle=_TUMBLING_ORACLE,
    description="1-hour tumbling window counts per event type",
    headline=True,
    tags=("window", "time"),
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


# sliding window: width 1h, slide 30m — every event lands in exactly two
# windows; the oracle materializes both membership rows explicitly.
_SLIDING_ORACLE = f"""
SELECT {ts_str_sql('win_start')} AS win_start, event_type, count(*) AS n
FROM (
  SELECT unnest([
           time_bucket(INTERVAL '30 minutes', ts),
           time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
         ]) AS win_start,
         event_type
  FROM events
)
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


@REGISTRY.register(
    "sliding_window_events",
    oracle=_SLIDING_ORACLE,
    description="1-hour window sliding by 30 minutes",
    tags=("window", "time"),
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(ts_str(F.col("w.start")).alias("win_start"), "event_type", "n")
        .orderBy("win_start", "event_type")
    )


# session window, 30-minute gap: oracle is the classic gaps-and-islands.
_SESSION_ORACLE = f"""
WITH marks AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marks
)
SELECT user_id,
       {ts_str_sql('min(ts)')} AS session_start,
       {ts_str_sql("max(ts) + INTERVAL '30 minutes'")} AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@REGISTRY.register(
    "session_window_events",
    oracle=_SESSION_ORACLE,
    description="session windows with 30-minute inactivity gap per user",
    tags=("window", "time", "session"),
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            ts_str(F.col("w.end")).alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4): parse the JSON props column
# into the binary VARIANT encoding once, then extract fields with
# variant_get — the columnar-shredded fast path for schema-on-read data
# (vs per-access string re-parsing with get_json_object).
#
# Cross-engine alignment (ADVICE r04): both sides extract $.k as its
# STRING scalar text, keep it only when it is integral text
# (^-?[0-9]+$ — engines disagree on fractional strings: DuckDB rounds
# '2.7'::BIGINT, Spark does not), then try_cast to BIGINT. The counted
# set is "rows whose k is present AND integral" under identical rules —
# a fixture regenerated with k as a float, bool, or JSON null yields
# the same NULL on both engines instead of a presence-vs-castable
# divergence. The emitted columns are plain longs so the comparison is
# encoding-independent.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
WITH kx AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN regexp_matches(
                           json_extract_string(props, '$.k'), '^-?[0-9]+$')
                       THEN json_extract_string(props, '$.k') END
                  AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM kx
GROUP BY event_type
ORDER BY event_type
"""


@REGISTRY.register(
    "variant_props_stats",
    oracle=_VARIANT_ORACLE,
    headline=True,
    description="VARIANT parse_json + variant_get string extract, try_cast to long",
    tags=("json", "variant"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k_txt = "try_variant_get(try_parse_json(props), '$.k', 'string')"
    k = F.expr(
        f"try_cast(CASE WHEN {k_txt} RLIKE '^-?[0-9]+$'"
        f" THEN {k_txt} END AS BIGINT)"
    )
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# XML scalar surface (Spark 4 to_xml/from_xml): rows serialize to XML
# strings and parse back through a typed schema before aggregating — the
# same detour-invisible-to-the-oracle construction as the refmr text
# round trip (wordcount.py::custom_source_roundtrip), so a serializer or
# parser defect changes the aggregate and fails the exact hash. Emitted
# money is integer cents (2-decimal doubles scale to within 4e-11 of an
# integer, where HALF_UP and nearbyint agree — the anomaly_zscore grid
# argument).
# ---------------------------------------------------------------------------

_XML_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@REGISTRY.register(
    "xml_roundtrip_stats",
    oracle=_XML_ORACLE,
    description="to_xml -> from_xml typed round trip, aggregated in integer cents",
    tags=("xml", "scalar", "roundtrip"),
)
def xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    xml = o.select(
        F.to_xml(
            F.struct("o_orderkey", "o_orderstatus", "o_totalprice")
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x",
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
        ).alias("s")
    ).select("s.*")
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# CSV scalar surface (to_csv/from_csv): the same detour-invisible-to-the-
# oracle construction as the XML round trip above — rows serialize to CSV
# strings and parse back through a typed schema before aggregating, so a
# quoting/escaping/parsing defect changes the aggregate and fails the
# exact hash. c_name carries embedded separators at fixture scale
# ("Customer#000000001"-style is safe, but the schema does not assume
# it), so the struct round trip exercises real quoting. Integer-cents
# emission per the r05 boundary rules.
# ---------------------------------------------------------------------------

_CSV_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@REGISTRY.register(
    "csv_roundtrip_stats",
    oracle=_CSV_ORACLE,
    description="to_csv -> from_csv typed round trip, aggregated in integer cents",
    tags=("csv", "scalar", "roundtrip"),
)
def csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    csv = c.select(
        F.to_csv(
            F.struct("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        ).alias("line")
    )
    parsed = csv.select(
        F.from_csv(
            "line",
            "c_custkey BIGINT, c_name STRING, c_mktsegment STRING, "
            "c_acctbal DOUBLE",
        ).alias("s")
    ).select("s.*")
    return (
        parsed.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(
                F.round(F.col("c_acctbal") * 100, 0).cast("long")
            ).alias("acctbal_cents"),
        )
        .orderBy("c_mktsegment")
    )

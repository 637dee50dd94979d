"""Array / map / higher-order function surface (SURVEY §2.B scalar-function
row; the reference's only value type is an opaque void*).

Exercised over the embeddings fixture's array<float> column. Float->double
parity: both engines cast each element to double FIRST, then run the
identical sequential fold (Spark `aggregate` and DuckDB `list_reduce` both
fold left-to-right), so results are bit-equal without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# Emissions are the RAW fold results: both engines cast-to-double then
# fold left-to-right over the same parquet floats, so the bits agree; a
# scaled round(x, 6) would *add* the HALF_UP-vs-nearbyint tie channel
# (PLANS.md r05) on values that happen to scale onto a half-boundary.
_ARRAY_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(embedding, x -> x::DOUBLE)), (a, b) -> a + b) AS vec_sum,
       list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b) AS vec_norm2,
       list_max(list_transform(embedding, x -> x::DOUBLE)) AS vec_max,
       list_min(list_transform(embedding, x -> x::DOUBLE)) AS vec_min,
       (list_transform(embedding, x -> x::DOUBLE))[1] AS first_dim,
       list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(embedding[1:8], x -> x::DOUBLE)), (a, b) -> a + b) AS head_sum,
       len(list_filter(list_transform(embedding, x -> x::DOUBLE), x -> x > 0)) AS n_positive
FROM embeddings
ORDER BY vec_id
"""


@REGISTRY.register(
    "array_functions_surface",
    oracle=_ARRAY_ORACLE,
    description="higher-order array functions: fold, map, filter, slice, minmax",
    tags=("scalar", "array"),
)
def array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        fold(vec).alias("vec_sum"),
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x).alias(
            "vec_norm2"
        ),
        F.array_max(vec).alias("vec_max"),
        F.array_min(vec).alias("vec_min"),
        F.element_at(vec, 1).alias("first_dim"),
        fold(F.slice(vec, 1, 8)).alias("head_sum"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("long").alias("n_positive"),
    ).orderBy("vec_id")


_MAP_ORACLE = """
SELECT event_type,
       count(*) AS n,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(DISTINCT json_extract_string(props, '$.k')) AS distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@REGISTRY.register(
    "json_schema_parse_events",
    oracle=_MAP_ORACLE,
    description="from_json schema-parsed map access + per-type JSON stats",
    tags=("json", "map"),
)
def json_schema_parse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "map<string,string>").alias("m"),
    ).select(
        "event_type", F.element_at("m", "k").cast("long").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct(F.col("k").cast("string")).alias("distinct_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# MAP-type function surface (the remaining §2.B scalar-function family):
# create_map / map_from_arrays / map_concat / map_keys / map_values /
# element_at / map_filter / transform_values, exercised JVM-side per group.
# The emitted columns are FLAT scalars (map iteration order is
# engine-specific, so hashing a raw map would be unstable); the oracle
# computes the same values relationally — it checks results, not plumbing.
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
WITH g AS (
  SELECT o_orderstatus,
         count(*) AS cnt,
         CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_price_cents,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS hi,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS lo
  FROM orders
  GROUP BY o_orderstatus
)
SELECT o_orderstatus,
       4::BIGINT AS n_entries,
       cnt, max_price_cents, hi, lo,
       'cnt,hi,lo,max_price_cents' AS keys_sorted,
       (cnt
        + CASE WHEN max_price_cents >= cnt THEN max_price_cents ELSE 0 END
        + CASE WHEN hi >= cnt THEN hi ELSE 0 END
        + CASE WHEN lo >= cnt THEN lo ELSE 0 END) AS big_vals_sum
FROM g
ORDER BY o_orderstatus
"""


@REGISTRY.register(
    "map_functions_surface",
    oracle=_MAP_ORACLE,
    description="map functions: build/concat/keys/values/element_at/map_filter",
    tags=("scalar", "map"),
)
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    grouped = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.max(F.round(F.col("o_totalprice") * 100)).cast("long").alias("maxc"),
        F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("hi"),
        F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("lo"),
    )
    m1 = F.create_map(
        F.lit("cnt"), F.col("cnt"), F.lit("max_price_cents"), F.col("maxc")
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("hi"), F.lit("lo")), F.array(F.col("hi"), F.col("lo"))
    )
    merged = F.map_concat(m1, m2)
    # map_filter keeps entries >= cnt (cnt itself and anything larger);
    # summing its values via values()+aggregate stays JVM-side
    big = F.map_filter(merged, lambda k, v: v >= F.col("cnt"))
    big_sum = F.aggregate(
        F.map_values(big), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return (
        grouped.select(
            "o_orderstatus",
            F.size(merged).cast("long").alias("n_entries"),
            F.element_at(merged, F.lit("cnt")).alias("cnt"),
            F.element_at(merged, F.lit("max_price_cents")).alias(
                "max_price_cents"
            ),
            F.element_at(merged, F.lit("hi")).alias("hi"),
            F.element_at(merged, F.lit("lo")).alias("lo"),
            F.array_join(F.array_sort(F.map_keys(merged)), ",").alias(
                "keys_sorted"
            ),
            big_sum.alias("big_vals_sum"),
        )
        .orderBy("o_orderstatus")
    )

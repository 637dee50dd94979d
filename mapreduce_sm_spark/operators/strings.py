"""Extended string-function and null-semantics surface (SURVEY §2.B
scalar-functions row — the reference's entire string library is
toupper/tolower/strcasestr inside example UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_STR_ORACLE = """
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS first_word,
       reverse(p_brand) AS brand_rev,
       translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
       lpad(p_size::VARCHAR, 4, '0') AS size_pad,
       instr(p_name, 'a') AS a_pos,
       repeat(p_brand[-1], 3) AS last_x3,
       substr(p_name, 2, 5) AS name_mid,
       replace(p_type, 'O', '0') AS type_zero,
       ltrim(rtrim(concat(' ', p_name, ' '))) AS trimmed
FROM part
ORDER BY p_partkey
"""


@REGISTRY.register(
    "string_functions_extended",
    oracle=_STR_ORACLE,
    description="split/reverse/translate/pad/instr/repeat/replace/trim surface",
    tags=("scalar", "string"),
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
        F.repeat(F.substring("p_brand", -1, 1), 3).alias("last_x3"),
        F.substring("p_name", 2, 5).alias("name_mid"),
        F.replace("p_type", F.lit("O"), F.lit("0")).alias("type_zero"),
        F.ltrim(F.rtrim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" ")))).alias(
            "trimmed"
        ),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# NULL semantics through an outer join: coalesce/nullif/nvl2-style logic,
# null-safe equality, and null-aware aggregation — the semantics a typed
# engine must pin down (the reference's void* model has no NULL at all).
# ---------------------------------------------------------------------------

_NULLS_ORACLE = """
WITH co AS (
  SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
)
SELECT c_custkey,
       count(o_orderkey) AS n_orders,              -- count skips nulls
       count(*) AS n_rows,                          -- count(*) does not
       coalesce(max(o_totalprice), 0.0) AS max_price_or_zero,
       CASE WHEN max(o_orderkey) IS NULL THEN 'no_orders' ELSE 'has_orders' END AS status,
       max(CASE WHEN o_totalprice IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS saw_null_price
FROM co
GROUP BY c_custkey
ORDER BY c_custkey
"""


@REGISTRY.register(
    "null_semantics_outer",
    oracle=_NULLS_ORACLE,
    description="NULL propagation/aggregation semantics through a left join",
    tags=("scalar", "null", "join"),
)
def null_semantics_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    co = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )
    return (
        co.groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_rows"),
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias(
                "max_price_or_zero"
            ),
            F.when(F.max("o_orderkey").isNull(), "no_orders")
            .otherwise("has_orders")
            .alias("status"),
            F.max(
                F.when(F.col("o_totalprice").eqNullSafe(F.lit(None)), 1).otherwise(0)
            ).alias("saw_null_price"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Schema-aligning union: merge two differently-shaped dimensions into one
# frame, aligning columns by NAME and null-filling the gaps (the reference
# can only concatenate identically-shaped byte streams).
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT kind, key, name, nationkey, acctbal FROM (
  SELECT 'customer' AS kind, c_custkey AS key, c_name AS name,
         c_nationkey::BIGINT AS nationkey, c_acctbal AS acctbal
  FROM customer
  UNION ALL BY NAME
  SELECT 'supplier' AS kind, s_suppkey AS key, s_name AS name,
         s_nationkey::BIGINT AS nationkey, NULL::DOUBLE AS acctbal
  FROM supplier
)
ORDER BY kind, key
"""


@REGISTRY.register(
    "union_by_name_contacts",
    oracle=_UNION_ORACLE,
    description="schema-aligning unionByName with null-filled missing columns",
    tags=("setop", "schema"),
)
def union_by_name_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("long").alias("nationkey"),
        # acctbal intentionally absent -> null-filled by unionByName
    )
    return cust.unionByName(supp, allowMissingColumns=True).orderBy(
        "kind", "key"
    )


# ---------------------------------------------------------------------------
# Fuzzy matching surface: Levenshtein edit distance between the distinct
# source names — the entity-resolution primitive for catalog/source
# reconciliation (near-identical source labels are a classic corpus
# bookkeeping bug). Both engines implement the standard edit distance,
# so the integers agree exactly. The pair space is |sources|² on a
# deduplicated, broadcast-sized dimension — never the corpus itself.
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 3

_FUZZY_SOURCES_ORACLE = f"""
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
       levenshtein(a.source, b.source) AS dist
FROM s a JOIN s b ON a.source < b.source
WHERE levenshtein(a.source, b.source) <= {_FUZZY_MAX_DIST}
ORDER BY source_a, source_b
"""


@REGISTRY.register(
    "fuzzy_source_names",
    oracle=_FUZZY_SOURCES_ORACLE,
    description="near-identical source labels by Levenshtein distance <= 3",
    tags=("string", "fuzzy", "governance"),
)
def fuzzy_source_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "documents").select("source").distinct()
    a = s.select(F.col("source").alias("source_a"))
    b = s.select(F.col("source").alias("source_b"))
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.levenshtein("source_a", "source_b").alias("dist"),
        )
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4 string collations): group word tokens
# under the UTF8_LCASE collation, so "Data", "DATA", and "data" land in one
# group without rewriting the data through lower(). At scale this is the
# idiomatic case-insensitive aggregation — the collation participates in
# hash partitioning and codegen'd comparisons directly, instead of paying
# a materialized lowercase copy of a 100 TB string column.
#
# Cross-engine exactness: tokens are restricted to printable ASCII (for
# which UTF8_LCASE equality == lower() equality by definition; full
# Unicode case folding is where collation implementations may diverge
# from an engine's lower()); the emitted group key is min(token) — the
# binary-minimum original-cased member, deterministic in both engines —
# plus an int64 count and the distinct cased-variant count. Limit ties
# are impossible: the (cnt DESC, variants DESC, min_token ASC) ordering
# ends on a key that is unique per group.
# ---------------------------------------------------------------------------

_COLLATION_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
ascii_toks AS (
  SELECT w FROM toks
  WHERE w <> '' AND regexp_matches(w, '^[\\x21-\\x7e]+$')
)
SELECT min(w) AS min_token,
       count(*) AS cnt,
       count(DISTINCT w) AS n_case_variants
FROM ascii_toks
GROUP BY lower(w)
ORDER BY cnt DESC, n_case_variants DESC, min_token ASC
LIMIT 50
"""


@REGISTRY.register(
    "collation_token_counts",
    oracle=_COLLATION_ORACLE,
    description="case-insensitive token counts via the UTF8_LCASE collation, top 50",
    tags=("string", "collation", "aggregate"),
)
def collation_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ", -1)).alias("w"))
        .filter((F.col("w") != "") & F.col("w").rlike(r"^[\x21-\x7e]+$"))
    )
    return (
        toks.groupBy(F.collate(F.col("w"), "UTF8_LCASE").alias("k"))
        .agg(
            F.min(F.col("w").cast("string")).alias("min_token"),
            F.count("*").alias("cnt"),
            F.count_distinct(F.col("w").cast("string")).alias(
                "n_case_variants"
            ),
        )
        .select("min_token", "cnt", "n_case_variants")
        .orderBy(
            F.col("cnt").desc(),
            F.col("n_case_variants").desc(),
            F.col("min_token").asc(),
        )
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (Spark 4 listagg / WITHIN GROUP): the
# report-shaped "concatenate the group's members in order" — DuckDB's
# string_agg twin makes the oracle exact because both sides pin the same
# ORDER BY inside the aggregate (an unordered listagg would be
# nondeterministic across partitions and could never hash-match).
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
           AS statuses_csv,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "listagg_order_statuses",
    oracle=_LISTAGG_ORACLE,
    description="listagg(DISTINCT ...) WITHIN GROUP ordered string aggregation",
    tags=("string", "aggregate", "listagg"),
)
def listagg_order_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_listagg_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses_csv,
               count(*) AS n_orders
        FROM orders_listagg_v
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Data masking (Spark mask()): the built-in PII-shaped redaction — upper
# letters to 'X', lower to 'x', digits to 'n'. mask() classifies by
# UNICODE character category while the oracle's regexes are ASCII
# classes, so non-ASCII characters are folded to '?' on BOTH sides first
# — the same neutralization the collation query uses, making the
# comparison exact under hostile fixture names too. Emissions are the
# distinct masked shapes and their row counts: the masked strings
# themselves cross the hash, proving the transform character-for-
# character.
# ---------------------------------------------------------------------------

_MASK_ORACLE = """
WITH m AS (
  SELECT c_mktsegment,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(c_name, '[^\\x00-\\x7f]', '?', 'g'),
               '[A-Z]', 'X', 'g'),
             '[a-z]', 'x', 'g'),
           '[0-9]', 'n', 'g') AS masked
  FROM customer
)
SELECT c_mktsegment,
       count(DISTINCT masked) AS n_shapes,
       min(masked) AS sample_shape,
       count(*) AS n_rows
FROM m
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@REGISTRY.register(
    "mask_pii_shapes",
    oracle=_MASK_ORACLE,
    description="mask() redaction shapes per segment (ASCII-neutralized, exact strings)",
    tags=("string", "masking", "governance"),
)
def mask_pii_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_mktsegment", "c_name")
    ascii_name = F.regexp_replace(
        F.col("c_name"), r"[^\x00-\x7f]", "?"
    )
    masked = F.mask(ascii_name)  # defaults: upper->X, lower->x, digit->n
    return (
        c.select("c_mktsegment", masked.alias("masked"))
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct("masked").alias("n_shapes"),
            F.min("masked").alias("sample_shape"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("c_mktsegment")
    )

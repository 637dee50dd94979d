"""The engine's UDF surface (SURVEY §2.A row 12): the reference exposes 5 C
function-pointer hooks; here each Spark UDF flavor is exercised by a
registered, oracle-checked query:

  scalar SQL UDF registration  — spark.udf.register + spark.sql
  pandas_udf GROUPED_AGG       — arbitrary grouped reduce (Arrow-batched)
  applyInPandas (GROUPED_MAP)  — the free-form per-group hook, like the
                                 reference's reduce writing multiple rows
  cogroup().applyInPandas      — two keyed frames per key in one function
                                 (COGROUPED_MAP; per-user merge_asof)
  sql_interface                — the spark.sql() entry point over temp views

Determinism note: Python-side float accumulation is ordered explicitly
(sort by a unique key, then strict left-to-right adds) so the result is
reproducible and the DuckDB oracle can replay it with list_reduce over the
identically-ordered list. Python UDFs are the engine's slow path by
design — every one of these has a built-in alternative used elsewhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# ---------------------------------------------------------------------------
# pandas_udf GROUPED_AGG: weighted average price per return flag.
# ---------------------------------------------------------------------------


def _make_wavg_price():
    # created lazily: pandas_udf parses its DDL type against the active
    # session, so module import must stay session-free
    @pandas_udf("double")
    def _wavg_price(
        price: pd.Series, qty: pd.Series, okey: pd.Series, lnum: pd.Series
    ) -> float:
        """sum(price*qty)/sum(qty), accumulated strictly in (okey, lnum)
        order so the float64 result is row-order independent."""
        df = pd.DataFrame({"p": price, "q": qty, "k": okey, "l": lnum})
        df = df.sort_values(["k", "l"], kind="mergesort")
        num = 0.0
        den = 0.0
        for p, q in zip(df["p"], df["q"]):
            num += p * q
            den += q
        return num / den if den else None

    return _wavg_price


# RAW emission: the UDAF accumulates in (okey, lnum) order — the same
# left-to-right fold as the oracle's ordered list_reduce — so the double
# is bit-identical in both engines; a round(x, 6) would only add the
# scaled-round tie channel (PLANS.md r05).
_WAVG_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
         list(l_extendedprice * l_quantity ORDER BY l_orderkey, l_linenumber) AS pq,
         list(l_quantity ORDER BY l_orderkey, l_linenumber) AS q
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       list_reduce(pq, (a, b) -> a + b)
           / list_reduce(q, (a, b) -> a + b) AS wavg_price
FROM g
ORDER BY l_returnflag
"""


@REGISTRY.register(
    "udaf_weighted_avg",
    oracle=_WAVG_ORACLE,
    description="pandas_udf GROUPED_AGG custom aggregate (Arrow-batched)",
    tags=("udf", "aggregate"),
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    _wavg_price = _make_wavg_price()
    return (
        li.groupBy("l_returnflag")
        .agg(
            _wavg_price(
                F.col("l_extendedprice"),
                F.col("l_quantity"),
                F.col("l_orderkey"),
                F.col("l_linenumber"),
            ).alias("wavg_price")
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# applyInPandas: per-language top-2 longest documents — the reference's
# free-form grouped reduce (emit any number of rows per group).
# ---------------------------------------------------------------------------


def _top2_longest(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(2)
    return out[["lang", "doc_id", "n_chars"]]


_TOP2_ORACLE = """
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
WHERE rn <= 2
ORDER BY lang, n_chars DESC, doc_id
"""


@REGISTRY.register(
    "grouped_map_top2_docs",
    oracle=_TOP2_ORACLE,
    description="applyInPandas free-form grouped reduce (top-2 per group)",
    tags=("udf", "aggregate"),
)
def grouped_map_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return (
        docs.groupBy("lang")
        .applyInPandas(_top2_longest, schema="lang string, doc_id long, n_chars long")
        .orderBy("lang", F.col("n_chars").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# scalar UDF registration + the spark.sql() interface.
# The scalar logic (price banding) is trivially expressible as a CASE — it
# exists to prove the registration path; the CASE twin keeps it honest.
# ---------------------------------------------------------------------------

_SQL_IFACE_ORACLE = """
SELECT year(o_orderdate) AS oyear,
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS size_band,
       count(*) AS n
FROM orders
GROUP BY oyear, size_band
ORDER BY oyear, size_band
"""


@REGISTRY.register(
    "sql_interface_udf",
    oracle=_SQL_IFACE_ORACLE,
    description="spark.udf.register + temp view + spark.sql() entry point",
    tags=("udf", "sql"),
)
def sql_interface_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    def size_band(price: float) -> str:
        if price < 100_000:
            return "small"
        if price < 300_000:
            return "medium"
        return "large"

    spark.udf.register("size_band", size_band, "string")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS oyear,
               size_band(o_totalprice) AS size_band,
               count(*) AS n
        FROM orders_v
        GROUP BY oyear, size_band
        ORDER BY oyear, size_band
        """
    ).withColumn("oyear", F.col("oyear").cast("long"))


# ---------------------------------------------------------------------------
# approximate aggregation: HLL distinct counts. Approximate by design, so
# no SQL oracle (driver records rows-only); the pytest suite checks the
# estimate against the exact count within tolerance.
# ---------------------------------------------------------------------------


@REGISTRY.register(
    "approx_distinct_users",
    # HLL++ sketches never agree across engines value-for-value, so the
    # driver-checked output is the sketch's verified error contract: the
    # Spark side computes BOTH the HLL estimate and the exact distinct
    # count, emits whether the estimate landed within 5*rsd (rsd=0.02 is a
    # standard-deviation target, so 10%% is a >5-sigma bound — stable yet
    # regression-catching), and the oracle asserts the bound holds.
    oracle="""
SELECT event_type, count(*) AS n,
       count(DISTINCT user_id) AS exact_users,
       true AS approx_ok
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="approx_count_distinct (HyperLogLog++) with driver-checked error contract",
    tags=("aggregate", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "n",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(
                    F.col("exact_users").cast("double") * F.lit(0.10),
                    F.lit(1.0),
                )
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4): a table function emitting multiple typed rows per
# input — the remaining UDF flavor (scalar / grouped-agg / grouped-map /
# mapInPandas / stateful are exercised elsewhere). Sentence splitting is
# the classic text-pipeline UDTF. Row-at-a-time by design (UDTFs are not
# Arrow-vectorized) — fine for demonstration; the hot-path equivalent is
# explode(split(...)), which posexplode_first_tokens uses.
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
SELECT doc_id, u.pos - 1 AS sent_idx, trim(u.s) AS sentence
FROM (
  SELECT doc_id, string_split(text, '.') AS sents FROM documents
), LATERAL (
  SELECT generate_subscripts(sents, 1) AS pos, unnest(sents) AS s
) u
WHERE trim(u.s) <> ''
ORDER BY doc_id, sent_idx
"""


def _make_sentence_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, sent_idx: long, sentence: string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            idx = 0
            for raw in (text or "").split("."):
                s = raw.strip()
                if s:
                    yield doc_id, idx, s
                idx += 1

    return SentenceSplit


@REGISTRY.register(
    "udtf_sentence_split",
    oracle=_UDTF_ORACLE,
    description="Python UDTF: per-doc sentence splitting (1:N typed table function)",
    tags=("udf", "udtf", "text"),
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    SentenceSplit = _make_sentence_udtf()
    spark.udtf.register("sentence_split", SentenceSplit)
    table(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "docs_udtf_v"
    )
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence
        FROM docs_udtf_v d, LATERAL sentence_split(d.doc_id, d.text) s
        ORDER BY s.doc_id, s.sent_idx
        """
    )


# ---------------------------------------------------------------------------
# Cogrouped pandas map (the last pandas-API slot): two keyed frames are
# grouped on the same key and each key's pair of pandas frames is handed
# to one Python function — the surface for per-key algorithms that need
# BOTH sides at once (here: pandas merge_asof of each user's purchases
# against their clicks). The same semantics exist as a pure-column as-of
# join in joins_advanced.py; this query exists to exercise the
# groupBy().cogroup().applyInPandas hook with an oracle.
#
# 100 TB shape: cogroup shuffles both sides once on user_id (Arrow
# batches, combined per key); per-key state is one user's events.
# Determinism: the emitted gap depends only on timestamps (never on which
# equal-timestamp click row merge_asof picked), so ties cannot leak
# nondeterminism into the hash.
# ---------------------------------------------------------------------------

_COGROUP_ASOF_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
"""


def _asof_gap(key, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    if len(purchases) == 0 or len(clicks) == 0:
        return pd.DataFrame(
            {"user_id": [], "purchase_id": [], "gap_us": []}
        ).astype({"user_id": "int64", "purchase_id": "int64", "gap_us": "int64"})
    p = purchases.sort_values("ts", kind="mergesort")
    c = clicks.sort_values("ts", kind="mergesort")[["ts"]].rename(
        columns={"ts": "c_ts"}
    )
    m = pd.merge_asof(
        p, c, left_on="ts", right_on="c_ts", direction="backward"
    ).dropna(subset=["c_ts"])
    gap = m["ts"].to_numpy().astype("datetime64[us]").astype("int64") - m[
        "c_ts"
    ].to_numpy().astype("datetime64[us]").astype("int64")
    return pd.DataFrame(
        {
            "user_id": key[0],
            "purchase_id": m["event_id"].astype("int64"),
            "gap_us": gap,
        }
    )


@REGISTRY.register(
    "cogrouped_asof_gap",
    oracle=_COGROUP_ASOF_ORACLE,
    description="cogrouped pandas map: per-user merge_asof purchase->latest prior click gap",
    tags=("udf", "cogroup", "asof"),
)
def cogrouped_asof_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            _asof_gap, schema="user_id long, purchase_id long, gap_us long"
        )
    )
    return out.orderBy("purchase_id")


# ---------------------------------------------------------------------------
# mapInArrow: the lowest-overhead Python hook — RecordBatches in,
# RecordBatches out, no pandas conversion at all. The right level for
# byte-oriented work (codecs, tokenizers) where even the pandas object
# layer costs. Here: per-document byte/char/token stats computed with
# pyarrow.compute kernels (vectorized C++, zero Python-per-row work).
# Deterministic integer outputs; the oracle computes the same stats in
# SQL, so the Arrow path's row preservation and arithmetic are
# hash-checked.
# ---------------------------------------------------------------------------

_ARROW_STATS_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
ORDER BY doc_id
"""


def _arrow_doc_stats(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column(batch.schema.get_field_index("text"))
        n_bytes = pc.binary_length(pc.cast(text, pa.binary()))
        n_chars = pc.utf8_length(text)
        n_tokens = pc.list_value_length(
            pc.split_pattern(text, pattern=" ")
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                pc.cast(n_bytes, pa.int64()),
                pc.cast(n_chars, pa.int64()),
                pc.cast(n_tokens, pa.int64()),
            ],
            names=["doc_id", "n_bytes", "n_chars", "n_tokens"],
        )


@REGISTRY.register(
    "arrow_doc_stats",
    oracle=_ARROW_STATS_ORACLE,
    description="mapInArrow per-doc byte/char/token stats via pyarrow.compute kernels",
    tags=("udf", "arrow", "text"),
)
def arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_doc_stats,
        "doc_id long, n_bytes long, n_chars long, n_tokens long",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4): the |> operator chain — FROM ... |> WHERE
# ... |> AGGREGATE — is the SQL-surface twin of the DataFrame method
# chain and of the reference's fixed map -> reduce -> sort pipeline
# (mapreduce.c:376-512 runs exactly one such chain per job). The oracle
# states the same query in standard ANSI form, so the pipe parser's
# semantics are hash-checked against a conventional formulation.
# ---------------------------------------------------------------------------

# Emission in integer cents, not CAST(double AS DECIMAL(18,2)): the
# drift probe's half-cent prices (x.005) quantize differently under
# Spark's HALF_UP decimal cast vs DuckDB's nearbyint — round(x*100, 0)
# sits within 4e-11 of an integer where both engines agree.
_PIPE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_totalprice > 100000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "pipe_syntax_rollup",
    oracle=_PIPE_ORACLE,
    description="SQL pipe-operator chain (FROM |> WHERE |> AGGREGATE |> ORDER BY)",
    tags=("sql", "pipe-syntax", "aggregate"),
)
def pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("pipe_orders")
    return spark.sql(
        """
        FROM pipe_orders
        |> WHERE o_totalprice > 100000
        |> AGGREGATE count(*) AS n_orders,
                     sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         AS total_cents
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# applyInArrow: the GROUPED Arrow hook (Spark 4) — each group arrives as
# one pyarrow.Table, no pandas layer. Completes the Arrow UDF surface
# next to mapInArrow above: mapInArrow is the per-partition stream,
# applyInArrow is the shuffled per-key variant (reduce-UDF slot,
# /root/reference/include/mapreduce.h:117, at the Arrow level). Here:
# per event type, event count, integer-cents value total, and the id
# span — all via pyarrow.compute kernels (vectorized C++), all integer
# outputs, oracle-checked in SQL.
# ---------------------------------------------------------------------------

_ARROW_GROUPED_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS value_cents,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _arrow_grouped_stats(table):
    import pyarrow as pa
    import pyarrow.compute as pc

    etype = table.column("event_type")[0].as_py()
    # half_towards_infinity == round-half-away-from-zero, the tie rule
    # Spark's scale-0 round() and DuckDB's round() share; Arrow's default
    # (half_to_even) would split from the oracle on an exact .5 tie
    cents = pc.cast(
        pc.round(
            pc.multiply(table.column("value"), 100.0),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    ids = table.column("event_id")
    return pa.table(
        {
            "event_type": pa.array([etype], pa.string()),
            "n_events": pa.array([table.num_rows], pa.int64()),
            "value_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
            "min_event_id": pa.array([pc.min(ids).as_py()], pa.int64()),
            "max_event_id": pa.array([pc.max(ids).as_py()], pa.int64()),
        }
    )


@REGISTRY.register(
    "arrow_grouped_event_stats",
    oracle=_ARROW_GROUPED_ORACLE,
    description="applyInArrow grouped stats: per-type counts/cents/id-span, no pandas layer",
    tags=("udf", "arrow", "grouped"),
)
def arrow_grouped_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    out = ev.groupBy("event_type").applyInArrow(
        _arrow_grouped_stats,
        schema=(
            "event_type string, n_events long, value_cents long, "
            "min_event_id long, max_event_id long"
        ),
    )
    return out.orderBy("event_type")


# ---------------------------------------------------------------------------
# Polymorphic UDTF (Spark 4): no static returnType — a compile-time
# analyze() derives the output schema FROM THE CALL ARGUMENTS (one long
# column per requested JSON key, including keys that do not exist in the
# data, which surface as all-NULL). This is the remaining UDTF capability
# next to the fixed-schema sentence splitter above: schema-on-call table
# functions. Row-at-a-time by design (UDTFs are not a hot path — the
# columnar twin is variant_props_stats); value typing follows the
# variant query's integral-text rule so the oracle is exactly equivalent
# under hostile props.
# ---------------------------------------------------------------------------

_DYN_UDTF_ORACLE = """
WITH kx AS (
  SELECT TRY_CAST(CASE WHEN regexp_matches(
                           json_extract_string(props, '$.k'), '^-?[0-9]+$')
                       THEN json_extract_string(props, '$.k') END
                  AS BIGINT) AS k_k
  FROM events
)
SELECT count(*) AS n_rows,
       count(k_k) AS n_k,
       CAST(sum(k_k) AS BIGINT) AS sum_k,
       CAST(0 AS BIGINT) AS n_missing
FROM kx
"""


def _make_dynamic_kv_udtf():
    import json
    import re

    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import LongType, StructField, StructType

    _INT_RE = re.compile(r"^-?[0-9]+$")

    @udtf
    class KVExtract:
        @staticmethod
        def analyze(
            keys: AnalyzeArgument, props: AnalyzeArgument
        ) -> AnalyzeResult:
            if not isinstance(keys.value, str):
                raise ValueError(
                    "kv_extract_dyn: the key list must be a constant string"
                )
            fields = [
                StructField(f"k_{k}", LongType())
                for k in keys.value.split(",")
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, keys: str, props: str):
            try:
                d = json.loads(props) if props else {}
            except ValueError:
                d = {}
            if not isinstance(d, dict):
                d = {}
            out = []
            for k in keys.split(","):
                v = d.get(k)
                if isinstance(v, str) and _INT_RE.match(v):
                    v = int(v)
                # the full TRY_CAST-to-BIGINT rule needs the int64 RANGE
                # check too: an out-of-range Python int must become NULL
                # here (like DuckDB's TRY_CAST), not leak to the
                # serializer — the legacy pickle path nulls it silently
                # but the Arrow UDTF path would raise on overflow
                if (
                    isinstance(v, int)
                    and not isinstance(v, bool)
                    and -(2**63) <= v < 2**63
                ):
                    out.append(v)
                else:
                    out.append(None)
            yield tuple(out)

    return KVExtract


@REGISTRY.register(
    "udtf_dynamic_kv",
    oracle=_DYN_UDTF_ORACLE,
    description="polymorphic UDTF: analyze()-time schema from the requested JSON keys",
    tags=("udf", "udtf", "dynamic-schema"),
)
def udtf_dynamic_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("kv_extract_dyn", _make_dynamic_kv_udtf())
    table(spark, sf_dir, "events").select("props").createOrReplaceTempView(
        "events_dynudtf_v"
    )
    # 'missing' is deliberately absent from every row: the analyze()-derived
    # k_missing column must exist and be all-NULL
    return spark.sql(
        """
        SELECT count(*) AS n_rows,
               count(t.k_k) AS n_k,
               sum(t.k_k) AS sum_k,
               count(t.k_missing) AS n_missing
        FROM events_dynudtf_v e,
             LATERAL kv_extract_dyn('k,missing', e.props) t
        """
    )


# ---------------------------------------------------------------------------
# Parameterized SQL (Spark 4): named parameter markers bind VALUES
# server-side (no string interpolation — the injection-safe path any
# multi-tenant query service needs) and the IDENTIFIER() clause binds the
# TABLE NAME from a parameter, which plain markers cannot do. The oracle
# is the equivalent literal SQL; a binding defect (wrong table, wrong
# threshold, silent string substitution) changes the aggregate and fails
# the exact hash. The 50000.00 threshold sits on the fixture's 2-decimal
# grid: exactly representable, so the >= comparison is engine-portable.
# ---------------------------------------------------------------------------

_PARAM_SQL_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_totalprice >= 50000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "parameterized_sql_revenue",
    oracle=_PARAM_SQL_ORACLE,
    description="named-parameter SQL + IDENTIFIER() table binding",
    tags=("sql", "parameters"),
)
def parameterized_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice >= :floor
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"tbl": "orders_param_v", "floor": 50000},
    )


# ---------------------------------------------------------------------------
# pandas API on Spark (pyspark.pandas): the engine's fourth user-facing
# API next to SQL, DataFrame, and the Arrow/pandas UDF hooks — pandas
# syntax compiled to the same Catalyst plans (NOT pandas execution: no
# data leaves the JVM here, no toPandas). The oracle checks the result;
# the point of the query is that a pandas-fluent user gets distributed
# execution with grouped integer-cents math unchanged.
# ---------------------------------------------------------------------------

_PANDAS_API_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents,
       max(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@REGISTRY.register(
    "pandas_api_rollup",
    oracle=_PANDAS_API_ORACLE,
    description="pyspark.pandas groupby/agg compiled to Catalyst (no JVM exit)",
    tags=("pandas-api", "aggregate"),
)
def pandas_api_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.pandas as ps

    pdf = ps.DataFrame(
        table(spark, sf_dir, "orders").select(
            "o_orderstatus", "o_orderkey", "o_totalprice"
        )
    )
    pdf["cents"] = (pdf["o_totalprice"] * 100).round(0).astype("int64")
    g = (
        pdf.groupby("o_orderstatus")
        .agg(
            n_orders=("o_orderkey", "count"),
            total_cents=("cents", "sum"),
            max_key=("o_orderkey", "max"),
        )
        .sort_index()
    )
    return (
        g.to_spark(index_col="o_orderstatus")
        .select("o_orderstatus", "n_orders", "total_cents", "max_key")
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# UDTF with a TABLE argument (Spark 4): the table function consumes
# TABLE(events) PARTITION BY event_type — each partition's rows stream
# through eval() and terminate() emits the partition's reduction. This is
# the reference's reduce-UDF contract (/root/reference/include/
# mapreduce.h:117 — grouped values in, arbitrary rows out) surfaced as a
# SQL table-valued function, with the engine handling the shuffle that
# PARTITION BY implies. Row-at-a-time by design (UDTF path); the
# columnar twin of this aggregate is arrow_grouped_event_stats above.
# ---------------------------------------------------------------------------

_TABLE_ARG_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS value_cents,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _make_partition_reduce_udtf():
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "event_type string, n_events bigint, value_cents bigint, "
            "min_event_id bigint, max_event_id bigint"
        )
    )
    class PartitionReduce:
        def __init__(self):
            self.key = None
            self.n = 0
            self.cents = 0
            self.mn = None
            self.mx = None

        def eval(self, row):
            import math

            self.key = row["event_type"]
            self.n += 1
            # exact round-half-away-from-zero on the double product —
            # NOT int(v + 0.5), whose addition can carry v across the
            # next integer when v is one ulp below a .5 tie (the exact
            # adversarial values tools/drift_probe.py generates)
            v = row["value"] * 100.0
            f = math.floor(v)
            frac = v - f
            self.cents += f + 1 if (
                frac > 0.5 or (frac == 0.5 and v > 0)
            ) else f
            eid = row["event_id"]
            self.mn = eid if self.mn is None else min(self.mn, eid)
            self.mx = eid if self.mx is None else max(self.mx, eid)

        def terminate(self):
            if self.n:
                yield (self.key, self.n, self.cents, self.mn, self.mx)

    return PartitionReduce


@REGISTRY.register(
    "udtf_table_arg_reduce",
    oracle=_TABLE_ARG_ORACLE,
    description="UDTF over TABLE(...) PARTITION BY: the reference reduce hook as a SQL TVF",
    tags=("udf", "udtf", "table-argument"),
)
def udtf_table_arg_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("partition_reduce", _make_partition_reduce_udtf())
    table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    ).createOrReplaceTempView("events_tblarg_v")
    return spark.sql(
        """
        SELECT *
        FROM partition_reduce(TABLE(events_tblarg_v)
                              PARTITION BY event_type)
        ORDER BY event_type
        """
    )


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4): a BEGIN..END block with DECLAREd variables —
# a scalar subquery binds the corpus-wide max into a variable, and the
# final statement filters against it. Control flow and session variables
# belong to the engine surface a SQL-first user migrates with; the
# oracle is the equivalent single statement with a CTE.
# ---------------------------------------------------------------------------

_SCRIPTING_ORACLE = """
WITH hi AS (
  SELECT CAST(round(max(o_totalprice) * 100, 0) AS BIGINT) AS max_cents
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n_above_half,
       (SELECT max_cents FROM hi) AS max_cents
FROM orders
WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) * 2
      >= (SELECT max_cents FROM hi)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@REGISTRY.register(
    "sql_scripting_rollup",
    oracle=_SCRIPTING_ORACLE,
    description="SQL scripting block: DECLARE/SET variable bound from a scalar subquery",
    tags=("sql", "scripting"),
)
def sql_scripting_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.scripting.enabled", "true")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_script_v")
    return spark.sql(
        """
        BEGIN
          DECLARE hi BIGINT;
          SET hi = (SELECT CAST(round(max(o_totalprice) * 100, 0) AS BIGINT)
                    FROM orders_script_v);
          SELECT o_orderstatus,
                 count(*) AS n_above_half,
                 hi AS max_cents
          FROM orders_script_v
          WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) * 2 >= hi
          GROUP BY o_orderstatus
          ORDER BY o_orderstatus;
        END
        """
    )

#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle over the same
parquet fixtures, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from mapreduce_sm_spark.registry import load_all_operators  # noqa: E402
from mapreduce_sm_spark.session import TABLES, get_spark  # noqa: E402


def _is_pd_na(v) -> bool:
    """Scalar missing-value check that is safe on array/list cells."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, dict, np.ndarray)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _pd_rows(df) -> list[tuple]:
    """Extract rows from a pandas frame with missing values as None."""
    return [
        tuple(None if _is_pd_na(v) else v for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def _canon(v, date_col=False):
    import numpy as np

    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon(x, date_col) for x in v.tolist()) + "]"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # FULL repr — no rounding. r03 post-mortem: rounding to 9 digits
        # here let anomaly_zscore_events pass locally while failing the
        # driver's exact hash; the local gate must be at least as strict
        # as the driver. Queries are responsible for emitting only values
        # that are engine-portable by construction: exact integers, or
        # raw doubles that are bit-identical in both engines (never
        # scaled round(double, n) — see PLANS.md r05).
        return repr(v)
    if isinstance(v, Decimal):
        # Use the float shortest-repr ONLY when it round-trips exactly —
        # a driver-green oracle column like DECIMAL(22,1) canonicalizes
        # identically to the Spark double it mirrors. A decimal the float
        # domain can't represent keeps its exact digits instead, so a
        # precision-losing comparison FAILS here rather than silently
        # passing (r04 verdict: the old repr(float(v)) was lossy).
        f = float(v)
        if Decimal(repr(f)) == v:
            return repr(f)
        return format(v.normalize(), "f")
    if isinstance(v, datetime):
        # A DATE column fetched from DuckDB via pandas arrives as a
        # midnight datetime64 while Spark's toPandas keeps datetime.date;
        # the driver hashes these equal (recursive_month_spine was
        # driver-green in r04), so canonicalize naive midnight datetimes
        # to their date form — but ONLY for columns the emitting engine
        # DECLARES as DATE (ADVICE r07): collapsing every midnight
        # timestamp would also hash a genuine DATE-vs-midnight-TIMESTAMP
        # divergence (a date_trunc type drift) equal. Callers pass the
        # declared DATE columns per side (DuckDB DESCRIBE / Spark schema).
        if (
            date_col
            and v.tzinfo is None
            and v.hour == v.minute == v.second == v.microsecond == 0
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x, date_col) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(
    cols: list[str], rows: list[tuple], date_cols: frozenset[str] = frozenset()
) -> str:
    """Order-insensitive value hash. date_cols: the column names the
    EMITTING engine declares as DATE — only there does the midnight
    datetime64 pandas artifact collapse to its date form (ADVICE r07)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i], cols[i] in date_cols) for i in order)
        for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def print_env_stamp(sf_dir: str) -> None:
    """Pin the oracle engine version and fixture schema fingerprints into
    the gate log (VERDICT r04 item 5): environment drift — a different
    DuckDB build or a regenerated fixture with a changed dtype — then
    shows up as a one-line diff between rounds' VERIFY_LOCAL files
    instead of as an unexplained red driver row."""
    import pyarrow.parquet as pq
    import pyspark

    print(f"# env duckdb={duckdb.__version__} pyspark={pyspark.__version__}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        try:
            schema = pq.read_schema(path)
            sig = ",".join(
                f"{f.name}:{f.type}" for f in schema  # noqa: B905
            )
            digest = hashlib.md5(sig.encode()).hexdigest()[:12]
            print(f"# fixture {t} schema_md5={digest} [{sig}]")
        except OSError as e:
            print(f"# fixture {t} UNREADABLE: {e}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    print_env_stamp(sf_dir)
    registry = load_all_operators()
    spark = get_spark("verify-local")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name, q in registry.all().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            # per-side declared DATE columns (ADVICE r07): only there may
            # a midnight datetime64 collapse to its date form
            from pyspark.sql.types import DateType

            s_dates = frozenset(
                f.name for f in sdf.schema.fields
                if isinstance(f.dataType, DateType)
            )
            # toPandas, NOT collect(): the driver fetches the Spark side
            # through pandas (Arrow), so nullable-int columns surface as
            # float64 etc. — the local gate must see the same dtypes the
            # driver hashes, or driver-only divergence stays invisible
            # (r6 verdict: HUGEINT->float64 on the oracle side was exactly
            # such a fetch-path artifact).
            srows = _pd_rows(sdf.toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            # queries may persist shared frames for intra-plan reuse; drop
            # them so a 100+-query session doesn't accumulate cache blocks
            spark.catalog.clearCache()
        if q.oracle is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            n_pass += 1
            continue
        try:
            # Fetch via pandas (.df()), NOT fetchall(): the driver's gate
            # fetches the oracle through pandas, where DuckDB HUGEINT
            # becomes float64 ("3" -> "3.0") — the r6 verdict's root cause
            # for all 8 hash-reds, invisible to a fetchall() local gate.
            # Mirroring the driver's fetch path here makes that class of
            # divergence reproduce locally.
            odf = con.execute(q.oracle).df()
            ocols = list(odf.columns)
            orows = _pd_rows(odf)
            o_dates = frozenset(
                col for col, typ, *_ in
                con.execute(f"DESCRIBE ({q.oracle})").fetchall()
                if typ.upper() == "DATE"
            )
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh = value_hash(scols, srows, s_dates)
            oh = value_hash(ocols, orows, o_dates)
            if sh != oh:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                srt = sorted(
                    "\x1f".join(
                        _canon(r[i], scols[i] in s_dates) for i in order_s
                    )
                    for r in srows
                )
                ort = sorted(
                    "\x1f".join(
                        _canon(r[i], ocols[i] in o_dates) for i in order_o
                    )
                    for r in orows
                )
                for i, (a, b) in enumerate(zip(srt, ort)):
                    if a != b:
                        problems.append(f"first diff row {i}:\n  S: {a[:220]}\n  O: {b[:220]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {len(registry)} registered")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

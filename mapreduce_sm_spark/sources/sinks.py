"""Sink connectors (SURVEY §2.A row 9: the reference's only sink is a
single formatted text file via a printf-style output_writer,
/root/reference/src/mapreduce.c:354-357,457-489).

`write_formatted_text` reproduces that contract with format_string
rendered JVM-side. Everything else is the posture a 100 TB pipeline needs:
partitioned/bucketed parquet so downstream joins and scans prune.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_formatted_text(
    df: DataFrame,
    fmt: str,
    cols: Sequence[str],
    path: str,
    single_file: bool = False,
) -> None:
    """printf-formatted text sink ≡ output_writer ("%s\\t%d", "%d:%s").

    single_file=True coalesces to one file like the reference's lone
    FILE* — acceptable only at test scale; the default writes one file per
    partition (total order across files is preserved by the upstream
    range-partitioned sort: files sort lexicographically by part number)."""
    out = df.select(F.format_string(fmt, *[F.col(c) for c in cols]).alias("value"))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet: the layout that makes 100 TB scans prunable
    (partition pruning on partition_by columns happens at planning time)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
) -> str:
    """Bucketed managed table: pre-shuffles once at write time so future
    joins/aggregations on bucket_cols are exchange-free (the scale answer
    to the reference's hash-partitioned in-memory store,
    mapreduce.c:145-153).

    Returns the ACTUAL table name, which is table_name suffixed with this
    process's pid. Two processes sharing a warehouse dir (bench +
    verify_local from the same cwd — the repo's documented concurrent-run
    posture, ADVICE r07) therefore never touch each other's tables: the
    stale-location rmtree below only ever deletes a dir this same pid
    wrote, and the dir is reclaimed at interpreter exit."""
    import atexit
    import os
    import shutil

    spark = df.sparkSession
    actual = f"{table_name}_p{os.getpid()}"
    # Stale-location guard: with the in-memory catalog, a managed table's
    # warehouse directory can survive a previous SESSION of this process
    # whose catalog entry died with it — saveAsTable then fails
    # LOCATION_ALREADY_EXISTS because overwrite mode only drops tables the
    # CURRENT catalog knows. The pid suffix scopes this to our own dirs.
    spark.sql(f"DROP TABLE IF EXISTS {actual}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    if wh:
        loc = os.path.join(wh, actual.lower())
        shutil.rmtree(loc, ignore_errors=True)
        atexit.register(shutil.rmtree, loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(actual)
    return actual


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def write_orc(
    df: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """ORC twin of write_parquet — same partition-pruning layout."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)

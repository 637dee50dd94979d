"""Table maintenance: small-file compaction.

At 100 TB the silent killer is file-count creep — streaming sinks and
fine-grained partitions leave thousands of KB-scale files, and every
scan then pays an open-cost per file (driver listing + task per split).
Compaction rewrites a directory to ~target-sized files; run it on cold
partitions on a schedule.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~target_file_mb files.

    Width is computed from the SOURCE byte size (files / target), so the
    rewrite is one narrow read + one repartition + one write; returns the
    number of output partitions. Writes to dst_dir (atomic swap is the
    caller's job — object stores rename differently than POSIX)."""
    total = 0
    for dirpath, _, files in os.walk(src_dir):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(dirpath, f))
    n_out = max(1, -(-total // (target_file_mb * 1024 * 1024)))  # ceil
    df = spark.read.parquet(src_dir)
    df.repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    return n_out

"""Shared path resolution for the fixture-backed streaming sources.

The driver fixtures store each table as a single FILE named
`<table>.parquet` inside sf_dir, so the sources historically pointed
readStream at sf_dir with pathGlobFilter=<table>.parquet. But
pathGlobFilter matches LEAF FILE names only: when the same table is a
Spark-written DIRECTORY named `<table>.parquet` (the scale_proof
replicas, any real warehouse layout), the filter matches none of the
part-*.parquet files inside it and the stream silently reads ZERO rows
— discovered when the x10 growth numbers for the streaming contracts
came back impossibly sub-1x (r10). Resolving the table path directly
when it is a directory handles file, directory, and wildcard layouts
with one rule and no silent-empty mode.
"""

from __future__ import annotations

import os


def resolve_stream_path(sf_dir: str, glob: str) -> tuple[str, str | None]:
    """(load_path, path_glob_filter_or_None) for a fixture table.

    - `<table>.parquet` is a directory -> stream the directory itself
      (its part files carry arbitrary names; a filter would drop them).
    - otherwise -> stream sf_dir filtered to the glob (single-file
      fixtures, and test dirs of part files matched by wildcards).
    """
    cand = os.path.join(sf_dir, glob)
    if "*" not in glob and os.path.isdir(cand):
        return cand, None
    return sf_dir, glob

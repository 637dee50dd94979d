from mapreduce_sm_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
    read_text,
)
from mapreduce_sm_spark.sources.sinks import (
    write_csv,
    write_formatted_text,
    write_parquet,
)

__all__ = [
    "read_text",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_formatted_text",
    "write_csv",
    "write_parquet",
]

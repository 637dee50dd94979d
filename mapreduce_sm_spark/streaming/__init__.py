from mapreduce_sm_spark.streaming.windows import (
    run_streaming_tumbling_counts,
    streaming_tumbling_counts,
)

__all__ = ["streaming_tumbling_counts", "run_streaming_tumbling_counts"]

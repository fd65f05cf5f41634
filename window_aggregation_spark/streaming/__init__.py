from window_aggregation_spark.streaming.window_stream import (
    sessionize,
    stream_tumbling_counts,
    tumbling_counts,
)

__all__ = ["sessionize", "stream_tumbling_counts", "tumbling_counts"]

from window_aggregation_spark.streaming.stateful import batch_ewma, streaming_ewma
from window_aggregation_spark.streaming.window_stream import (
    sessionize,
    stream_tumbling_counts,
    tumbling_counts,
)

__all__ = [
    "batch_ewma",
    "sessionize",
    "stream_tumbling_counts",
    "streaming_ewma",
    "tumbling_counts",
]

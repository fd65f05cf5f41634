from window_aggregation_spark.streaming.enrich import enrich_stream
from window_aggregation_spark.streaming.interval_join import (
    IntervalJoinSpec,
    interval_join,
)
from window_aggregation_spark.streaming.stateful import batch_ewma, streaming_ewma
from window_aggregation_spark.streaming.window_stream import (
    sessionize,
    stream_tumbling_counts,
    tumbling_counts,
)

__all__ = [
    "IntervalJoinSpec",
    "batch_ewma",
    "enrich_stream",
    "interval_join",
    "sessionize",
    "stream_tumbling_counts",
    "streaming_ewma",
    "tumbling_counts",
]

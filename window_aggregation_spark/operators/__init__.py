from window_aggregation_spark.operators.window_aggregation import (
    derive_output_schema,
    window_aggregate,
    window_aggregate_multi,
)

__all__ = ["derive_output_schema", "window_aggregate", "window_aggregate_multi"]

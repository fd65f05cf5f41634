from window_aggregation_spark.operators.window_aggregation import (
    derive_output_schema,
    window_aggregate,
)

__all__ = ["derive_output_schema", "window_aggregate"]

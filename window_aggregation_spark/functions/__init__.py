from window_aggregation_spark.functions.registry import (
    FUNCTIONS,
    Clause,
    FunctionDef,
    lookup,
)

__all__ = ["FUNCTIONS", "Clause", "FunctionDef", "lookup"]

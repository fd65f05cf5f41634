"""window_aggregation_spark — a PySpark-native window-aggregation analytics engine.

A from-scratch re-expression of the capabilities of the CDAP Window Aggregation
plugin (reference: data-integrations/window-aggregation) as idiomatic PySpark:
the logical plan is declared with the DataFrame / SQL API and Catalyst + Tungsten
pick the physical strategy.

Public surface:

- :class:`WindowSpecDef`, :class:`AggregateDef`, :class:`OrderKey` — the window IR
  (mirrors ``WindowAggregationConfig.FunctionInfo`` + frame properties,
  reference ``WindowAggregationConfig.java:46-109,460-499``).
- :func:`window_aggregate` — the operator: one ``select`` adding one column per
  aggregate, all sharing a single window spec (one shuffle + sort).
- :func:`parse_aggregates`, :func:`config_to_plan` — the reference's string-spec
  grammar ``alias:function(field,argsEncoded,ignoreNulls)`` for config-file compat.
- :mod:`window_aggregation_spark.plans.sql_gen` — the SQL-string backend
  (mirrors the reference's BigQuery ELT pushdown path, but targets Spark SQL).
- :mod:`window_aggregation_spark.operators` — extension operators for
  large-scale training-data pipelines: dedup, similarity search, text analysis,
  multimodal column plumbing.
"""

from window_aggregation_spark.errors import (
    FailureCollector,
    ValidationError,
    ValidationFailure,
)
from window_aggregation_spark.spec import (
    CURRENT_ROW,
    UNBOUNDED_FOLLOWING,
    UNBOUNDED_PRECEDING,
    AggregateDef,
    Direction,
    FrameType,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
)
from window_aggregation_spark.parser import config_to_plan, parse_aggregates
from window_aggregation_spark.operators.window_aggregation import (
    derive_output_schema,
    window_aggregate,
    window_aggregate_multi,
)
from window_aggregation_spark.session import get_spark
from window_aggregation_spark.api import window

__all__ = [
    "AggregateDef",
    "CURRENT_ROW",
    "Direction",
    "FailureCollector",
    "FrameType",
    "OrderKey",
    "UNBOUNDED_FOLLOWING",
    "UNBOUNDED_PRECEDING",
    "ValidationError",
    "ValidationFailure",
    "WindowPlan",
    "WindowSpecDef",
    "config_to_plan",
    "derive_output_schema",
    "get_spark",
    "parse_aggregates",
    "window",
    "window_aggregate",
    "window_aggregate_multi",
]

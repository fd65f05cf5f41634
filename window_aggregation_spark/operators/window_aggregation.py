"""The window-aggregation operator: the engine's core relational operator.

Semantics re-expressed from the reference plugin (O1,
``WindowsAggregationUtil.java:49-91``; schema rule
``WindowAggregation.java:361-371``), Spark-first:

- ONE ``select`` produces the whole output: every input column (in order) plus
  one computed column per aggregate. All aggregates share one window spec, so
  Catalyst plans a single ``WindowExec``: one hash-partition exchange on the
  partition keys + one in-partition sort, every function evaluated in a single
  pass over each frame.
- Alias collision REPLACES the input column in place (the reference uses
  ``df.withColumn``; its e2e golden test depends on this —
  ``WindowAggregation.feature:44``).
- Output schema = input fields, in order, plus appended alias fields; the
  declared output types (float for percent_rank, input-type passthrough for
  lead/lag/first/last/accumulate/discrete_percentile) are produced with
  explicit casts at the boundary.
- Optional ``num_partitions`` repartition (reference O4) — exposed, but AQE
  (``spark.sql.adaptive.enabled``) usually picks better partition counts;
  leave it unset unless a downstream stage needs a specific layout.

Scale notes (100 TB):

- ``WindowExec`` sorts each partition-key group within one task — a hot key
  serializes onto one core. For running sums over hot keys prefer a two-phase
  salted accumulate (chunk-local running sum + broadcast chunk offsets); for
  whole-partition percentiles prefer ``approx_discrete_percentile`` (sketch,
  fixed memory).
- Everything here is a pure Catalyst expression — no Python in the hot path,
  so filters below this operator still push down to the parquet scan and
  projections above it prune columns through the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from window_aggregation_spark.errors import FailureCollector
from window_aggregation_spark.functions.registry import lookup
from window_aggregation_spark.spec import AggregateDef, WindowPlan
from window_aggregation_spark.validation import validate_plan

_DECLARED = {
    "int": T.IntegerType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
}


def _output_field_type(
    agg: AggregateDef, input_schema: T.StructType
) -> T.DataType | None:
    """Declared output type for one aggregate; None = leave Spark's type
    (used only when the input field is absent, which validation rejects)."""
    fdef = lookup(agg.function)
    if fdef.output_type is not None:
        return _DECLARED[fdef.output_type]
    if agg.field and agg.field in input_schema.fieldNames():
        return input_schema[agg.field].dataType
    return None


def window_aggregate(
    df: DataFrame, plan: WindowPlan, *, validate: bool = True
) -> DataFrame:
    """Apply a :class:`WindowPlan` to ``df`` and return the widened DataFrame."""
    if validate:
        collector = FailureCollector()
        validate_plan(df.schema, plan, collector)
        collector.get_or_throw()

    w = plan.spec.to_spark()

    computed: dict[str, F.Column] = {}
    for agg in plan.aggregates:
        fdef = lookup(agg.function)
        col = fdef.build(agg, w, plan.spec)
        declared = _output_field_type(agg, df.schema)
        if declared is not None:
            col = col.cast(declared)
        computed[agg.alias] = col.alias(agg.alias)

    # input columns in order, replaced in place on alias collision
    out_cols = [
        computed.pop(name) if name in computed else F.col(name)
        for name in df.columns
    ]
    out_cols.extend(computed[a.alias] for a in plan.aggregates if a.alias in computed)

    out = df.select(*out_cols)

    if plan.declared_schema is not None:
        # project/reorder to the user-pinned output schema (reference O3,
        # RowToRecord.java:44-48) — also lets Catalyst prune unused inputs.
        out = out.select(*[F.col(name) for name in plan.declared_schema])

    if plan.spec.num_partitions:
        out = out.repartition(plan.spec.num_partitions)
    return out


def derive_output_schema(
    input_schema: T.StructType, plan: WindowPlan
) -> T.StructType:
    """Compute the expected output schema without executing (the design-time
    contract, reference ``WindowAggregation.java:361-371``): input fields in
    order — alias collisions replaced — plus appended nullable alias fields."""
    alias_types: dict[str, T.DataType] = {}
    for agg in plan.aggregates:
        declared = _output_field_type(agg, input_schema)
        if declared is None:
            raise ValueError(
                f"Cannot derive output type for aggregate '{agg.alias}': "
                f"field '{agg.field}' not in input schema."
            )
        alias_types[agg.alias] = declared

    fields: list[T.StructField] = []
    for f in input_schema.fields:
        if f.name in alias_types:
            fields.append(T.StructField(f.name, alias_types.pop(f.name), True))
        else:
            fields.append(f)
    for agg in plan.aggregates:
        if agg.alias in alias_types:
            fields.append(T.StructField(agg.alias, alias_types[agg.alias], True))

    if plan.declared_schema is not None:
        by_name = {f.name: f for f in fields}
        fields = [by_name[name] for name in plan.declared_schema]
    return T.StructType(fields)

"""The generated-SQL backend: render a WindowPlan as one SELECT statement.

The reference keeps one configuration IR with two backends — DataFrame calls
for Spark execution and generated BigQuery Standard SQL for warehouse
pushdown (``WindowAggregation.java:663-686``, templates ``:75-93``,
``getColumnSelectionExpression`` ``:631-661``). We keep the same shape
cheaply: :func:`plan_to_sql` renders ``SELECT <inputs>, fn(...) OVER
(PARTITION BY ... ORDER BY ... frame) AS alias FROM <table>`` — Catalyst is
our "warehouse". ``dialect="spark"`` output is runnable via ``spark.sql``;
``dialect="ansi"`` quotes identifiers for ANSI engines (used by tests to
cross-check against DuckDB where expressible).

Both backends compile to the same Catalyst logical plan, which the parity
tests assert by comparing results.
"""

from __future__ import annotations

from pyspark.sql import types as T

from window_aggregation_spark.functions.registry import lookup
from window_aggregation_spark.spec import WindowPlan, quote_ident

_CAST_SQL = {"int": "INT", "float": "FLOAT", "double": "DOUBLE", "long": "BIGINT"}


def plan_to_sql(
    plan: WindowPlan,
    table: str,
    input_columns: list[str],
    *,
    dialect: str = "spark",
    input_types: dict[str, str] | None = None,
) -> str:
    """Render the plan as one SELECT over ``table``.

    ``input_columns`` is the input column order (the information the
    DataFrame path gets from ``df.columns``); alias collisions replace the
    input column in place, matching the operator's semantics.
    ``input_types`` (``dict(df.dtypes)``) enables the input-type passthrough
    casts the DataFrame backend applies — without it, widening aggregates
    (e.g. ACCUMULATE over INT returns BIGINT in SQL) would diverge in type
    from the DataFrame path's declared output schema.
    """
    from window_aggregation_spark.plans.rewrites import reverse_unbounded_following

    # Apply the same plan rewrites as the DataFrame backend: identical
    # logical plans keep double aggregates bit-identical across backends
    # (and spare the generated SQL Spark's O(n^2) unbounded-following frame).
    plan = reverse_unbounded_following(plan)
    over = plan.spec.over_sql(dialect)

    rendered: dict[str, str] = {}
    for agg in plan.aggregates:
        fdef = lookup(agg.function)
        expr = fdef.sql(agg, over, dialect)
        if fdef.output_type is not None and fdef.name != "percent_rank":
            expr = f"CAST({expr} AS {_CAST_SQL[fdef.output_type]})"
        elif (
            fdef.output_type is None
            and input_types is not None
            and agg.field in input_types
        ):
            expr = f"CAST({expr} AS {input_types[agg.field]})"
        rendered[agg.alias] = f"{expr} AS {quote_ident(agg.alias, dialect)}"

    select_items = [
        rendered.pop(name) if name in rendered else quote_ident(name, dialect)
        for name in input_columns
    ]
    select_items.extend(
        rendered[a.alias] for a in plan.aggregates if a.alias in rendered
    )

    sql = f"SELECT {', '.join(select_items)} FROM {table}"
    if plan.declared_schema is not None:
        outer = ", ".join(quote_ident(c, dialect) for c in plan.declared_schema)
        sql = f"SELECT {outer} FROM ({sql})"
    return sql

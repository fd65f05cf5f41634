"""The generated-SQL backend: render a WindowPlan as one SELECT statement.

The reference keeps one configuration IR with two backends — DataFrame calls
for Spark execution and generated BigQuery Standard SQL for warehouse
pushdown (``WindowAggregation.java:663-686``, templates ``:75-93``,
``getColumnSelectionExpression`` ``:631-661``). We keep the same shape
cheaply: :func:`plan_to_sql` renders ``SELECT <inputs>, fn(...) OVER
(PARTITION BY ... ORDER BY ... frame) AS alias FROM <table>`` — Catalyst is
our "warehouse". ``dialect="spark"`` output is runnable via ``spark.sql``;
``dialect="ansi"`` quotes identifiers for ANSI engines (used by tests to
cross-check against DuckDB where expressible); ``dialect="bigquery"``
reproduces the reference's BigQuery Standard SQL templates exactly
(``FIRST_VALUE(col IGNORE NULLS)``, ``PERCENTILE_CONT(col, p)``, ... —
see :func:`functions.registry.bigquery_expression`).

Both backends compile to the same Catalyst logical plan, which the parity
tests assert by comparing results.
"""

from __future__ import annotations

from pyspark.sql import types as T

from window_aggregation_spark.functions.registry import lookup
from window_aggregation_spark.spec import WindowPlan, quote_ident

_CAST_SQL = {"int": "INT", "float": "FLOAT", "double": "DOUBLE", "long": "BIGINT"}


def plans_to_sql(
    plans: "list[WindowPlan] | tuple[WindowPlan, ...]",
    table: str,
    input_columns: list[str],
    *,
    dialect: str = "spark",
    input_types: dict[str, str] | None = None,
    declared_schema: "tuple[str, ...] | None" = None,
) -> str:
    """Render several plans as ONE SELECT — the SQL door for
    ``window_aggregate_multi``: every aggregate carries its own OVER clause,
    so Catalyst (or any warehouse) plans one WindowExec per distinct spec,
    exactly like the DataFrame path after its regroup.

    A single SELECT cannot express sequential semantics, so this raises for
    the cases where plan order is observable (a plan reading another plan's
    output column, duplicate aliases across plans, per-plan declared
    schemas) — the same conditions under which the DataFrame path disables
    its regroup.
    """
    from window_aggregation_spark.plans.rewrites import reverse_unbounded_following

    plans = [reverse_unbounded_following(p) for p in plans]
    produced: set[str] = set()
    for p in plans:
        aliases = {a.alias for a in p.aggregates}
        if aliases & produced:
            raise ValueError(
                "plans_to_sql: duplicate aggregate aliases across plans "
                f"({sorted(aliases & produced)}) cannot render as one SELECT."
            )
        produced |= aliases
    from window_aggregation_spark.functions.registry import consumed_columns

    for p in plans:
        consumed: set[str] = set()
        for a in p.aggregates:
            # includes column-valued args (corr/covar second field, args[0])
            consumed.update(consumed_columns(a))
        consumed.update(p.spec.partition_by)
        consumed.update(k.field for k in p.spec.order_by)
        cross = consumed & (produced - {a.alias for a in p.aggregates})
        if cross:
            raise ValueError(
                f"plans_to_sql: plan reads other plans' outputs {sorted(cross)}"
                " — sequential semantics cannot render as one SELECT."
            )
        if p.declared_schema is not None:
            raise ValueError(
                "plans_to_sql: per-plan declared_schema is order-dependent; "
                "use the declared_schema parameter instead."
            )

    rendered: dict[str, str] = {}
    order: list[str] = []
    for p in plans:
        over = p.spec.over_sql(dialect)
        for agg in p.aggregates:
            rendered[agg.alias] = _render_aggregate(
                agg, over, dialect, input_types
            )
            order.append(agg.alias)

    select_items = [
        rendered.pop(name) if name in rendered else quote_ident(name, dialect)
        for name in input_columns
    ]
    select_items.extend(rendered[a] for a in order if a in rendered)

    sql = f"SELECT {', '.join(select_items)} FROM {table}"
    if declared_schema is not None:
        outer = ", ".join(quote_ident(c, dialect) for c in declared_schema)
        sql = f"SELECT {outer} FROM ({sql})"
    return sql


def _render_aggregate(
    agg,
    over: str,
    dialect: str,
    input_types: dict[str, str] | None,
) -> str:
    if dialect == "bigquery":
        # the reference's warehouse templates verbatim, and — like the
        # reference's pushdown — no boundary casts: results carry
        # BigQuery-native types (registry.bigquery_expression docstring)
        from window_aggregation_spark.functions.registry import (
            bigquery_expression,
        )

        expr = bigquery_expression(agg, over)
        return f"{expr} AS {quote_ident(agg.alias, dialect)}"
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
    return f"{expr} AS {quote_ident(agg.alias, dialect)}"


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

    rendered: dict[str, str] = {
        agg.alias: _render_aggregate(agg, over, dialect, input_types)
        for agg in plan.aggregates
    }

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

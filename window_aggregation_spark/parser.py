"""Config-string front door: the reference's aggregate-spec grammar.

Grammar (reference ``WindowAggregationConfig.getAggregates``,
``WindowAggregationConfig.java:183-276``):

- aggregates separated by newlines; each is
  ``alias:FUNCTION(field,encodedArgs,ignoreNulls)``
- ``encodedArgs`` is a comma-separated arg list with literal commas escaped
  as ``%2C``; an empty second position means no args
- ``ignoreNulls``: only the literal string "false" means respect-nulls;
  anything else (including empty) means ignore (``:472``)
- aliases must be unique; parse failures accumulate in the collector

Plus the companion properties: ``partitionFields`` is comma-separated;
``partitionOrder`` is ``field:Ascending,field2:Descending`` (any direction
other than case-insensitive "ascending" = descending); frame bounds are
Spark-signed longs with unbounded flags (see :mod:`window_aggregation_spark.spec`).
"""

from __future__ import annotations

from window_aggregation_spark.errors import FailureCollector, ValidationError
from window_aggregation_spark.functions.registry import REF_NAME_TO_NAME, FUNCTIONS
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

_SPEC_HINT = (
    "Functions must be specified as alias:function(field, argumentsEncoded, "
    "ignoreNulls)."
)


def parse_aggregates(
    text: str, collector: FailureCollector | None = None
) -> list[AggregateDef]:
    """Parse the newline-separated aggregate spec string."""
    own_collector = collector is None
    collector = collector or FailureCollector()
    out: list[AggregateDef] = []
    seen_aliases: set[str] = set()

    for raw in text.split("\n"):
        aggregate = raw.strip()
        if not aggregate:
            continue
        colon = aggregate.find(":")
        if colon < 0:
            collector.add_failure(
                f"Could not find ':' separating aggregate alias from its "
                f"function in '{aggregate}'.",
                _SPEC_HINT,
            )
            continue
        alias = aggregate[:colon].strip()
        if alias in seen_aliases:
            collector.add_failure(
                f"Cannot create multiple aggregate functions with the same "
                f"alias '{alias}'.",
                "Provided aliases must be unique.",
            )
            continue
        seen_aliases.add(alias)

        fn_and_params = aggregate[colon + 1 :].strip()
        paren = fn_and_params.find("(")
        if paren < 0:
            collector.add_failure(
                f"Could not find '(' in function '{fn_and_params}'.", _SPEC_HINT
            )
            continue
        fn_name = fn_and_params[:paren].strip().upper()
        if fn_name not in REF_NAME_TO_NAME and fn_name.lower() not in FUNCTIONS:
            collector.add_failure(
                f"Invalid function '{fn_name}'.",
                f"Must be one of {', '.join(sorted(REF_NAME_TO_NAME))}.",
            )
            continue

        params = fn_and_params[paren + 1 :].strip()
        if not params.endswith(")"):
            collector.add_failure(
                f"Could not find closing ')' in function '{fn_and_params}'.",
                _SPEC_HINT,
            )
            continue
        first_comma = params.find(",")
        if first_comma < 0:
            collector.add_failure(
                f"Missing parameters in function '{fn_and_params}'.", _SPEC_HINT
            )
            continue
        field = params[:first_comma].strip()
        second_comma = params.find(",", first_comma + 1)
        if second_comma < 0:
            collector.add_failure(
                f"Missing ignoreNulls parameter in function '{fn_and_params}'.",
                _SPEC_HINT,
            )
            continue
        encoded_args = params[first_comma + 1 : second_comma].strip()
        decoded = encoded_args.replace("%2C", ",")
        args = tuple(a.strip() for a in decoded.split(",")) if decoded else ()
        if args == ("",):
            args = ()
        ignore_nulls_str = params[second_comma + 1 : -1].strip()
        # quirk preserved: only the literal "false" turns ignoreNulls off
        ignore_nulls = ignore_nulls_str.lower() != "false"

        name = REF_NAME_TO_NAME.get(fn_name, fn_name.lower())
        out.append(
            AggregateDef(
                alias=alias,
                function=name,
                field=field or None,
                args=args,
                ignore_nulls=ignore_nulls,
            )
        )

    if not out:
        collector.add_failure(
            "Missing 'aggregates' property.", "The 'aggregates' property must be set."
        )
    if own_collector:
        collector.get_or_throw()
    return out


def plan_to_config(plan: WindowPlan) -> dict:
    """Inverse of :func:`config_to_plan`: render a plan back to the
    reference-shaped string properties (round-trip guaranteed —
    property-tested). Useful for exporting plans built with the fluent or
    dataclass APIs into reference-compatible config files."""
    from window_aggregation_spark.functions.registry import lookup

    spec = plan.spec
    props: dict = {
        "partition_fields": ",".join(spec.partition_by),
        "partition_order": ",".join(
            f"{k.field}:{k.direction.value}" for k in spec.order_by
        ),
        "window_frame_type": spec.frame_type.value,
    }
    if spec.frame_type is not FrameType.NONE:
        if spec.start <= UNBOUNDED_PRECEDING:
            props["unbounded_preceding"] = True
        else:
            props["preceding"] = str(spec.start)
        if spec.end >= UNBOUNDED_FOLLOWING:
            props["unbounded_following"] = True
        else:
            props["following"] = str(spec.end)
    lines = []
    for agg in plan.aggregates:
        ref = lookup(agg.function).ref_name
        encoded = ",".join(a.replace(",", "%2C") for a in agg.args)
        ignore = "true" if agg.ignore_nulls else "false"
        lines.append(f"{agg.alias}:{ref}({agg.field or ''},{encoded},{ignore})")
    props["aggregates"] = "\n".join(lines)
    if spec.num_partitions:
        props["number_of_partitions"] = str(spec.num_partitions)
    if plan.declared_schema is not None:
        props["output_schema"] = list(plan.declared_schema)
    return props


def _parse_bound(
    value: str | None, unbounded: bool | None, sentinel: int
) -> int:
    if unbounded:
        return sentinel
    if value is None or not str(value).strip():
        return CURRENT_ROW
    return int(str(value).strip())


def config_to_plan(
    *,
    partition_fields: str = "",
    partition_order: str = "",
    window_frame_type: str = "NONE",
    preceding: str | None = None,
    following: str | None = None,
    unbounded_preceding: bool | None = None,
    unbounded_following: bool | None = None,
    aggregates: str = "",
    number_of_partitions: str | None = None,
    output_schema: list[str] | None = None,
) -> WindowPlan:
    """Build a :class:`WindowPlan` from reference-shaped string properties
    (property names and parsing rules follow
    ``WindowAggregationConfig.java:46-175``). Raises :class:`ValidationError`
    with every parse problem at once."""
    collector = FailureCollector()

    parts = tuple(
        p.strip() for p in partition_fields.split(",") if p.strip()
    )

    order_keys: list[OrderKey] = []
    if partition_order.strip():
        for item in partition_order.split(","):
            item = item.strip()
            if not item:
                continue
            pieces = item.split(":")
            if len(pieces) != 2 or not pieces[0] or not pieces[1]:
                collector.add_failure(
                    f"Column name for order or order type value is missing "
                    f"for the field {item}."
                )
                continue
            order_keys.append(OrderKey(pieces[0].strip(), Direction.parse(pieces[1])))

    try:
        frame = FrameType.parse(window_frame_type)
    except ValueError:
        frame = FrameType.NONE
        collector.add_failure(
            f"Invalid window frame type '{window_frame_type}'.",
            "Must be one of NONE, ROW, RANGE.",
        )
    start = end = CURRENT_ROW
    try:
        start = _parse_bound(preceding, unbounded_preceding, UNBOUNDED_PRECEDING)
    except ValueError:
        collector.add_failure(
            f"Invalid 'preceding' bound '{preceding}'.",
            "Must be a (signed) integer or empty for CURRENT ROW.",
        )
    try:
        end = _parse_bound(following, unbounded_following, UNBOUNDED_FOLLOWING)
    except ValueError:
        collector.add_failure(
            f"Invalid 'following' bound '{following}'.",
            "Must be a (signed) integer or empty for CURRENT ROW.",
        )
    num_partitions = None
    if number_of_partitions:
        try:
            num_partitions = int(number_of_partitions)
        except ValueError:
            collector.add_failure(
                f"Invalid 'numberOfPartitions' '{number_of_partitions}'.",
                "Must be an integer.",
            )

    aggs = parse_aggregates(aggregates, collector)
    collector.get_or_throw()

    spec = WindowSpecDef(
        partition_by=parts,
        order_by=tuple(order_keys),
        frame_type=frame,
        start=start if frame is not FrameType.NONE else CURRENT_ROW,
        end=end if frame is not FrameType.NONE else CURRENT_ROW,
        num_partitions=num_partitions,
    )
    return WindowPlan(
        spec=spec,
        aggregates=tuple(aggs),
        declared_schema=tuple(output_schema) if output_schema else None,
    )

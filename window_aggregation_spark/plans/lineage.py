"""Plan description / field-level lineage.

The reference records a human-readable per-alias transform description with
the CDAP lineage service (``WindowAggregation.java:394-460``). Without a
lineage service, we emit the same information as a structured dict — one
entry per output field stating how it was produced — suitable for logging or
attaching to job metadata.
"""

from __future__ import annotations

from window_aggregation_spark.functions.registry import lookup
from window_aggregation_spark.spec import FrameType, WindowPlan


def describe_plan(plan: WindowPlan, input_columns: list[str]) -> dict[str, str]:
    spec = plan.spec
    parts = ", ".join(spec.partition_by) or "(none)"
    order = ", ".join(f"{k.field} {k.direction.value}" for k in spec.order_by) or "(none)"
    if spec.frame_type is FrameType.NONE:
        frame = "default frame (running when ordered, whole partition otherwise)"
    else:
        frame = f"{spec.frame_type.value} [{spec.start}, {spec.end}]"
    window = f"partitioned by [{parts}], ordered by [{order}], {frame}"

    out: dict[str, str] = {}
    replaced = {a.alias for a in plan.aggregates}
    for col in input_columns:
        if col not in replaced:
            out[col] = "passed through unchanged"
    for agg in plan.aggregates:
        fdef = lookup(agg.function)
        src = agg.field or "(positional)"
        args = f" args={list(agg.args)}" if agg.args else ""
        action = "replaces input column" if agg.alias in input_columns else "appended"
        out[agg.alias] = (
            f"{fdef.ref_name}({src}){args} over window {window}; {action}"
        )
    return out

"""Unit tests for reference-quirk fidelity in the function registry."""

from __future__ import annotations

from window_aggregation_spark.functions.registry import (
    FUNCTIONS,
    REF_NAME_TO_NAME,
    _effective_ignore_nulls,
    lookup,
)
from window_aggregation_spark.spec import AggregateDef


def test_first_last_args0_or_quirk():
    """args[0] == 'true' turns ignoreNulls ON even when the spec-level flag
    is false (reference ORs them, WindowsAggregationUtil.java:158-171)."""
    assert _effective_ignore_nulls(
        AggregateDef("a", "first", field="x", args=("true",), ignore_nulls=False)
    )
    assert not _effective_ignore_nulls(
        AggregateDef("a", "first", field="x", args=("false",), ignore_nulls=False)
    )
    assert _effective_ignore_nulls(
        AggregateDef("a", "last", field="x", args=(), ignore_nulls=True)
    )


def test_lookup_accepts_both_name_styles():
    assert lookup("N_TILE").name == "ntile"
    assert lookup("ntile").name == "ntile"
    assert lookup("CUMULATIVE_DISTRIBUTION").name == "cume_dist"
    assert lookup("Rank").name == "rank"


def test_every_reference_function_is_registered():
    reference_enum = {
        "RANK", "DENSE_RANK", "PERCENT_RANK", "N_TILE", "ROW_NUMBER",
        "MEDIAN", "CONTINUOUS_PERCENTILE", "DISCRETE_PERCENTILE",
        "LEAD", "LAG", "FIRST", "LAST", "CUMULATIVE_DISTRIBUTION",
        "ACCUMULATE",
    }
    assert reference_enum <= set(REF_NAME_TO_NAME)


def test_registry_entries_are_complete():
    for fdef in FUNCTIONS.values():
        assert fdef.build is not None and fdef.sql is not None
        assert fdef.output_type in (None, "int", "float", "double", "long")

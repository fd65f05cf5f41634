"""Differential check of every declared suite query against DuckDB —
the same comparison the driver's correctness gate performs (sf0.001 locally
for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from window_aggregation_spark.suite import SUITE

from tests.conftest import assert_frames_match


@pytest.mark.parametrize("name", sorted(SUITE))
def test_suite_query_matches_oracle(name, spark, sf_dir, duck):
    q = SUITE[name]
    result = q.build(spark, sf_dir)
    if q.oracle is None:
        assert result.count() > 0, f"{name} returned no rows"
        return
    # non-empty asserted INSIDE the comparison (min_rows) — a separate
    # count() action executed every query twice (r14)
    assert_frames_match(result, duck.sql(q.oracle), min_rows=1)

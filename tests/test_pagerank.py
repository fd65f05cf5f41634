"""PageRank unit semantics: hand-computed chain values, the cycle fixed
point, dangling-node convention, and duplicate-edge collapsing."""

from __future__ import annotations

import pytest

from window_aggregation_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


class TestPagerank:
    def test_two_node_chain_hand_computed(self, spark):
        # 1 -> 2, N=2, d=0.85. r0 = (.5, .5)
        # iter1: r(1) = .15/2 = .075 ; r(2) = .075 + .85*.5   = .5
        # iter2: r(1) = .075        ; r(2) = .075 + .85*.075  = .13875
        out = _ranks(pagerank(_edges(spark, [(1, 2)]), iterations=2))
        assert out[1] == pytest.approx(0.075, abs=1e-12)
        assert out[2] == pytest.approx(0.13875, abs=1e-12)

    def test_cycle_is_fixed_point(self, spark):
        # 1->2->3->1: uniform 1/3 is exactly stationary at any iteration
        out = _ranks(
            pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]), iterations=4)
        )
        for v in out.values():
            assert v == pytest.approx(1 / 3, abs=1e-12)

    def test_dangling_node_keeps_teleport_only(self, spark):
        # node 2 has no out-edges; its mass is NOT redistributed (module
        # convention) — node 1 ends at the teleport floor
        out = _ranks(pagerank(_edges(spark, [(1, 2)]), iterations=3))
        assert out[1] == pytest.approx(0.075, abs=1e-12)

    def test_duplicate_edges_collapse(self, spark):
        dup = pagerank(
            _edges(spark, [(1, 2), (1, 2), (1, 3)]), iterations=2
        )
        clean = pagerank(_edges(spark, [(1, 2), (1, 3)]), iterations=2)
        a, b = _ranks(dup), _ranks(clean)
        assert a == b

    def test_total_mass_bounded_by_one(self, spark):
        out = _ranks(
            pagerank(
                _edges(spark, [(1, 2), (2, 1), (1, 3)]), iterations=5
            )
        )
        assert sum(out.values()) <= 1.0 + 1e-9


def test_empty_edges_return_empty_ranks(spark):
    out = pagerank(
        _edges(spark, []).where("src > 0"), iterations=2
    )
    assert out.columns == ["node", "rank"] and out.count() == 0

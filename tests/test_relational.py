"""Unit tests for operators/relational.py: rollup/cube grouping-id
semantics, explicit-list pivot, and the single-pass expectation audit
(including the approx-unique scale mode the suite row doesn't cover)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.relational import (
    Expectation,
    pivot_aggregate,
    rollup_aggregate,
    run_expectations,
)


@pytest.fixture(scope="module")
def sales(spark):
    return spark.createDataFrame(
        [
            ("east", "a", 10.0),
            ("east", "b", 20.0),
            ("west", "a", 5.0),
            ("west", None, 7.0),
        ],
        "region string, product string, amount double",
    )


class TestRollup:
    def test_levels_and_grouping_id(self, spark, sales):
        out = rollup_aggregate(
            sales, ["region", "product"],
            [F.sum("amount").alias("total")],
        ).collect()
        rows = {(r.region, r.product, r.grouping_id): r.total for r in out}
        # leaf level (gid 0) keeps genuine NULL key values distinct...
        assert rows[("west", None, 0)] == 7.0
        # ...from the aggregated-away level (gid 1)
        assert rows[("west", None, 1)] == 12.0
        assert rows[("east", None, 1)] == 30.0
        assert rows[(None, None, 3)] == 42.0
        assert len(out) == 4 + 2 + 1

    def test_cube_adds_product_only_level(self, spark, sales):
        out = rollup_aggregate(
            sales, ["region", "product"],
            [F.sum("amount").alias("total")], cube=True,
        ).collect()
        rows = {(r.region, r.product, r.grouping_id): r.total for r in out}
        # gid 2 = region aggregated away, product kept
        assert rows[(None, "a", 2)] == 15.0

    def test_one_shuffle(self, spark, sales):
        out = rollup_aggregate(
            sales, ["region", "product"], [F.count(F.lit(1)).alias("n")]
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1
        assert "Expand" in plan


class TestPivot:
    def test_values_and_missing_combo_null(self, spark, sales):
        out = pivot_aggregate(
            sales, ["region"], "product", ["a", "b"],
            [F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n")],
        ).collect()
        rows = {r.region: r for r in out}
        assert rows["east"].a_total == 10.0 and rows["east"].b_total == 20.0
        assert rows["west"].a_total == 5.0 and rows["west"].b_total is None
        # Spark pivot semantics: EVERY aggregate over an empty cell is
        # NULL — including count (unlike a plain COUNT FILTER, which is
        # 0). Callers wanting SQL count semantics coalesce afterwards,
        # as the agg_pivot_orders suite query does.
        assert rows["west"].b_n is None

    def test_unlisted_value_dropped(self, spark, sales):
        out = pivot_aggregate(
            sales, ["region"], "product", ["a"],
            [F.sum("amount").alias("total")],
        )
        assert set(out.columns) == {"region", "a"} or set(out.columns) == {
            "region", "a_total"
        }

    def test_empty_values_raise(self, spark, sales):
        with pytest.raises(ValueError, match="pivot_values"):
            pivot_aggregate(sales, ["region"], "product", [],
                            [F.sum("amount").alias("total")])


class TestExpectations:
    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [
                (1, "x", 10.0),
                (2, "y", -1.0),
                (2, None, 3.0),
                (4, "z", 5.0),
            ],
            "id bigint, tag string, v double",
        )

    def test_metrics_and_pass_flags(self, spark, df):
        out = run_expectations(df, [
            Expectation("id_unique", "id", "unique"),
            Expectation("tag_not_null", "tag", "not_null"),
            Expectation("v_positive", "v", "min", bound=0.0),
            Expectation("v_cap", "v", "max", bound=100.0),
            Expectation("tag_in_set", "tag", "in_set",
                        allowed=("x", "y")),
        ]).collect()
        rows = {r.check: r for r in out}
        assert rows["id_unique"].metric == 0.75 and not rows["id_unique"].passed
        assert rows["tag_not_null"].metric == 0.25
        assert not rows["tag_not_null"].passed
        assert rows["v_positive"].metric == -1.0
        assert not rows["v_positive"].passed
        assert rows["v_cap"].passed
        # null tag not counted against in_set; 1 of 3 non-null outside
        assert rows["tag_in_set"].metric == round(1 / 3, 6)

    def test_threshold_tolerates_fraction(self, spark, df):
        out = run_expectations(df, [
            Expectation("tag_mostly", "tag", "not_null", threshold=0.5),
        ]).collect()
        assert out[0].passed

    def test_approx_unique_mode(self, spark, df):
        out = run_expectations(
            df, [Expectation("id_unique", "id", "unique")],
            approx_unique=True,
        ).collect()
        # 3 distinct of 4 — even the sketch's tolerance must not call
        # a 25%-duplicated column unique
        assert not out[0].passed

    def test_single_aggregate_pass(self, spark, df):
        out = run_expectations(df, [
            Expectation("tag_not_null", "tag", "not_null"),
            Expectation("v_positive", "v", "min", bound=0.0),
        ])
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        # no distinct aggregate -> one scan, one aggregate exchange
        assert plan.count("Scan") == 1 or "LocalTableScan" in plan

    def test_unknown_kind_raises(self, spark, df):
        with pytest.raises(ValueError, match="unknown expectation"):
            run_expectations(df, [Expectation("bad", "id", "median")])

    def test_in_set_without_allowed_raises(self, spark, df):
        with pytest.raises(ValueError, match="allowed"):
            run_expectations(df, [Expectation("bad", "tag", "in_set")])


class TestExpectationsReviewRegressions:
    def test_empty_input_fails_every_check(self, spark):
        # review finding: NULL comparisons must not vanish from boolean
        # filters — an empty table fails its audit, never sails through
        empty = spark.createDataFrame([], "id bigint, v double")
        out = run_expectations(empty, [
            Expectation("id_unique", "id", "unique"),
            Expectation("v_positive", "v", "min", bound=0.0),
            Expectation("v_not_null", "v", "not_null"),
        ]).collect()
        assert [r.passed for r in out] == [False, False, False]

    def test_all_null_column_fails_bounds(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, None)], "id bigint, v double"
        )
        out = run_expectations(
            df, [Expectation("v_cap", "v", "max", bound=10.0)]
        ).collect()
        assert out[0].passed is False and out[0].metric is None


class TestHistogramDrift:
    def _drift(self, spark, rows, **kw):
        from window_aggregation_spark.operators.relational import (
            histogram_drift,
        )

        df = spark.createDataFrame(rows, "v double, cur boolean")
        out = histogram_drift(df, "v", F.col("cur"), **kw)
        return out.orderBy("bin").collect()

    def test_bins_densified_and_psi_matches_formula(self, spark):
        import math

        rows = [(5.0, False)] * 3 + [(15.0, False)] + [(15.0, True)] * 4
        out = self._drift(spark, rows, lo=0.0, hi=40.0, bins=4, smoothing=0.5)
        assert [r.bin for r in out] == [0, 1, 2, 3]
        assert [r.base_n for r in out] == [3, 1, 0, 0]
        assert [r.cur_n for r in out] == [0, 4, 0, 0]
        total = 0.0
        for r in out:
            p = (r.base_n + 0.5) / (4 + 2.0)
            q = (r.cur_n + 0.5) / (4 + 2.0)
            term = (p - q) * math.log(p / q)
            assert r.psi_term == pytest.approx(term, abs=1e-6)
            total += term
        assert out[0].psi_total == pytest.approx(total, abs=1e-6)
        assert all(r.psi_total == out[0].psi_total for r in out)

    def test_out_of_range_clamps_and_nulls_dropped(self, spark):
        rows = [(-100.0, False), (999.0, False), (None, False), (2.0, True)]
        out = self._drift(spark, rows, lo=0.0, hi=10.0, bins=2)
        assert [r.base_n for r in out] == [1, 1]
        assert [r.cur_n for r in out] == [1, 0]

    def test_identical_slices_zero_drift(self, spark):
        rows = [(float(v), cur) for v in (1, 2, 3, 8) for cur in (False, True)]
        out = self._drift(spark, rows, lo=0.0, hi=10.0, bins=2)
        assert out[0].psi_total == 0.0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0, True)], "v double, cur boolean")
        from window_aggregation_spark.operators.relational import (
            histogram_drift,
        )

        with pytest.raises(ValueError, match="bins"):
            histogram_drift(df, "v", F.col("cur"), lo=0.0, hi=1.0, bins=1)
        with pytest.raises(ValueError, match="hi > lo"):
            histogram_drift(df, "v", F.col("cur"), lo=1.0, hi=1.0)


class TestSnapshotDiff:
    def _diff(self, spark, old_rows, new_rows):
        from window_aggregation_spark.operators.relational import snapshot_diff

        schema = "k bigint, price double, status string"
        return snapshot_diff(
            spark.createDataFrame(old_rows, schema),
            spark.createDataFrame(new_rows, schema),
            ["k"],
            ["price", "status"],
        )

    def test_insert_delete_update_unchanged(self, spark):
        old = [(1, 10.0, "O"), (2, 20.0, "O"), (3, 30.0, "F")]
        new = [(1, 10.0, "O"), (2, 25.0, "O"), (4, 40.0, "P")]
        out = {r.k: r for r in self._diff(spark, old, new).collect()}
        assert set(out) == {2, 3, 4}
        assert out[2].change_type == "update"
        assert (out[2].old_price, out[2].new_price) == (20.0, 25.0)
        assert out[3].change_type == "delete" and out[3].new_price is None
        assert out[4].change_type == "insert" and out[4].old_price is None

    def test_null_transitions(self, spark):
        # NULL -> NULL unchanged; NULL -> value and value -> NULL update
        old = [(1, None, "O"), (2, None, "O"), (3, 3.0, "O")]
        new = [(1, None, "O"), (2, 2.0, "O"), (3, None, "O")]
        out = {r.k: r.change_type for r in self._diff(spark, old, new).collect()}
        assert out == {2: "update", 3: "update"}

    def test_identical_snapshots_empty_diff(self, spark):
        rows = [(1, 1.0, "O"), (2, None, None)]
        assert self._diff(spark, rows, rows).count() == 0


class TestDriftReviewRegressions:
    def test_far_out_of_range_value_clamps_instead_of_overflowing(self, spark):
        """floor() of a corrupt huge value saturates to Long.MaxValue;
        casting that to int was a CAST_OVERFLOW crash under ANSI mode.
        The audit must FLAG garbage, not die on it."""
        from window_aggregation_spark.operators.relational import (
            histogram_drift,
        )

        rows = [(2.0**31 * 50000.0, False), (1e300, False), (5.0, True),
                (float("nan"), True)]
        df = spark.createDataFrame(rows, "v double, cur boolean")
        out = {r.bin: r for r in histogram_drift(
            df, "v", F.col("cur"), lo=0.0, hi=500000.0, bins=10
        ).collect()}
        assert out[9].base_n == 2          # both monsters clamp to the top bin
        assert sum(r.cur_n for r in out.values()) == 1  # NaN excluded


class TestProfileColumns:
    def test_values_and_null_accounting(self, spark):
        from window_aggregation_spark.operators.relational import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (2, 30.0), (4, 10.0)],
            "id bigint, v double",
        )
        out = {r.column: r for r in profile_columns(df, ["id", "v"]).collect()}
        assert out["id"].n_rows == 4 and out["id"].n_null == 0
        assert out["id"].n_distinct == 3
        assert (out["id"].min, out["id"].max) == (1.0, 4.0)
        assert out["v"].n_null == 1 and out["v"].n_distinct == 2
        assert out["v"].avg == pytest.approx(50.0 / 3, abs=1e-4)

    def test_single_scan(self, spark):
        from window_aggregation_spark.operators.relational import (
            profile_columns,
        )

        df = spark.createDataFrame([(1, 2.0)], "id bigint, v double")
        plan = profile_columns(df, ["id", "v"])._jdf.queryExecution(
        ).executedPlan().toString()
        assert plan.count("LocalTableScan") <= 1

    def test_approx_mode_and_empty_columns_raise(self, spark):
        from window_aggregation_spark.operators.relational import (
            profile_columns,
        )

        df = spark.createDataFrame([(i,) for i in range(100)], "id bigint")
        out = profile_columns(df, ["id"], approx_distinct=True).collect()[0]
        assert abs(out.n_distinct - 100) <= 10
        with pytest.raises(ValueError, match="non-empty"):
            profile_columns(df, [])


class TestGroupedDiscretePercentiles:
    def test_hand_values_and_p_edges(self, spark):
        from window_aggregation_spark.operators.relational import (
            grouped_discrete_percentiles,
        )

        df = spark.createDataFrame(
            [("a", float(v)) for v in (10, 20, 30, 40)]
            + [("b", 7.0)],
            "g string, v double",
        )
        out = {r.g: r for r in grouped_discrete_percentiles(
            df, ["g"], "v", [0.0, 0.25, 0.5, 0.75, 1.0]
        ).collect()}
        a = out["a"]
        # ceil(p*4): 0->rank 1 (via the greatest(1,..) floor), .25->1,
        # .5->2, .75->3, 1->4
        assert (a.p0, a.p25, a.p50, a.p75, a.p100) == (
            10.0, 10.0, 20.0, 30.0, 40.0
        )
        b = out["b"]
        assert (b.p0, b.p50, b.p100) == (7.0, 7.0, 7.0)

    def test_nulls_ignored_and_all_null_group_kept(self, spark):
        from window_aggregation_spark.operators.relational import (
            grouped_discrete_percentiles,
        )

        df = spark.createDataFrame(
            [("a", None), ("a", 10.0), ("a", 20.0), ("a", 30.0),
             ("z", None), ("z", None)],
            "g string, v double",
        )
        out = {r.g: r for r in grouped_discrete_percentiles(
            df, ["g"], "v", [0.25, 0.5]
        ).collect()}
        # null-ignoring: n=3, k25=1 -> 10, k50=2 -> 20 (NOT the NULL row)
        assert (out["a"].p25, out["a"].p50) == (10.0, 20.0)
        # all-NULL group still emits a row, with NULL percentiles
        assert out["z"].p25 is None and out["z"].p50 is None

    def test_fractional_labels_and_duplicate_raise(self, spark):
        from window_aggregation_spark.operators.relational import (
            grouped_discrete_percentiles,
        )

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        out = grouped_discrete_percentiles(df, ["g"], "v", [0.125])
        assert "p12_5" in out.columns
        # :g labels keep 0.995 (p99_5) and 1.0 (p100) distinct; a
        # genuinely repeated percentile is rejected
        out2 = grouped_discrete_percentiles(df, ["g"], "v", [0.995, 1.0])
        assert {"p99_5", "p100"} <= set(out2.columns)
        with pytest.raises(ValueError, match="duplicate"):
            grouped_discrete_percentiles(df, ["g"], "v", [0.5, 0.5])

    def test_tie_invariance(self, spark):
        from window_aggregation_spark.operators.relational import (
            grouped_discrete_percentiles,
        )

        # the median rank lands inside a tie run: value must be the
        # tied value no matter which tied row got the rank
        df = spark.createDataFrame(
            [("a", v) for v in (1.0, 5.0, 5.0, 5.0, 9.0)],
            "g string, v double",
        )
        out = grouped_discrete_percentiles(df, ["g"], "v", [0.5]).collect()
        assert out[0].p50 == 5.0

    def test_one_shuffle_exchange_reuse(self, spark, sf_dir):
        from window_aggregation_spark.suite import SUITE

        plan = SUITE["agg_discrete_percentile"].build(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:600]

    def test_validation(self, spark):
        from window_aggregation_spark.operators.relational import (
            grouped_discrete_percentiles,
        )

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="non-empty"):
            grouped_discrete_percentiles(df, ["g"], "v", [])
        with pytest.raises(ValueError, match="outside"):
            grouped_discrete_percentiles(df, ["g"], "v", [1.5])


def test_grouping_sets_aggregate(spark):
    from window_aggregation_spark.operators.relational import (
        grouping_sets_aggregate,
    )

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0), (None, "y", 8.0)],
        "k1 string, k2 string, v double",
    )
    out = grouping_sets_aggregate(
        df, ["k1", "k2"], [["k1"], ["k2"], []],
        [F.sum("v").alias("s")],
    )
    got = {
        (r.k1, r.k2, r.grouping_id, r.s) for r in out.collect()
    }
    assert got == {
        # per-k1 (k2 aggregated away -> bit 0 set = 1)
        ("a", None, 1, 3.0), ("b", None, 1, 4.0), (None, None, 1, 8.0),
        # per-k2 (k1 away -> bit 1 set = 2); genuine NULL k1 folds in
        (None, "x", 2, 5.0), (None, "y", 2, 10.0),
        # grand total (both away -> 3)
        (None, None, 3, 15.0),
    }
    # one Expand, ONE exchange: replication factor = number of sets.
    # (AQE's toString appends the pre-adaptive "Initial Plan" section,
    # which would double-count the same exchange — strip it.)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Expand" in final
    assert final.count("Exchange") - final.count("ReusedExchange") == 1

    with pytest.raises(ValueError, match="at least one grouping set"):
        grouping_sets_aggregate(df, ["k1"], [], [F.sum("v").alias("s")])


def test_quarantine_rows(spark):
    from window_aggregation_spark.operators.relational import quarantine_rows

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 10.0, "X"), (4, None, "X"),
         (5, 20.0, "F")],
        "k long, price double, status string",
    )
    out = quarantine_rows(
        df,
        {
            "price_pos": F.col("price") > 0,
            "status_ok": F.col("status").isin("O", "F"),
        },
    )
    got = {(r.k, r.failed_checks, r.quarantined) for r in out.collect()}
    assert got == {
        (1, "", False),
        (2, "price_pos", True),
        (3, "status_ok", True),
        # NULL price -> check NULL -> counts as FAILED (sorted order)
        (4, "price_pos;status_ok", True),
        (5, "", False),
    }
    # pure projection: no exchange anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]

    with pytest.raises(ValueError, match="at least one expectation"):
        quarantine_rows(df, {})
    # name validation: empty or separator-bearing names would corrupt
    # (or hide failures from) the string encoding
    with pytest.raises(ValueError, match="non-empty"):
        quarantine_rows(df, {"": F.col("price") > 0})
    with pytest.raises(ValueError, match="non-empty"):
        quarantine_rows(df, {"a;b": F.col("price") > 0})


def test_quarantine_write_partitions_input_exactly(spark, tmp_path):
    """The sink side: ONE partitioned write routes every input row to
    exactly one of the two sink directories — clean ∪ quarantine == the
    input key set, disjoint by construction — and the returned counts
    describe the committed files. Zero-quarantine inputs produce no
    quarantine directory (and a 0 count) rather than an empty one."""
    from window_aggregation_spark.operators.relational import (
        quarantine_write,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 10.0, "X"), (4, None, "X"),
         (5, 20.0, "F")],
        "k long, price double, status string",
    )
    checks = {
        "price_pos": F.col("price") > 0,
        "status_ok": F.col("status").isin("O", "F"),
    }
    out = quarantine_write(df, checks, str(tmp_path / "routed"))
    assert (out["clean_rows"], out["quarantined_rows"]) == (2, 3)
    clean = spark.read.parquet(out["clean_path"])
    quar = spark.read.parquet(out["quarantine_path"])
    assert {r.k for r in clean.collect()} == {1, 5}
    assert {(r.k, r.failed_checks) for r in quar.collect()} == {
        (2, "price_pos"), (3, "status_ok"), (4, "price_pos;status_ok"),
    }
    # every clean row's reasons string is empty; the flag itself lives
    # in the directory key, not the data files
    assert {r.failed_checks for r in clean.collect()} == {""}
    assert "quarantined" not in clean.columns
    # all-clean input: no quarantine dir, count reads 0
    out2 = quarantine_write(
        df.where("k in (1, 5)"), checks, str(tmp_path / "routed2")
    )
    assert (out2["clean_rows"], out2["quarantined_rows"]) == (2, 0)
    import os

    assert not os.path.exists(out2["quarantine_path"])
    # default mode='error' refuses to clobber an existing routed dir
    with pytest.raises(Exception, match="already exists"):
        quarantine_write(df, checks, str(tmp_path / "routed"))
    # ENTIRELY empty input (a legitimate empty batch): no data files
    # at all — counts read 0/0 instead of crashing on schema inference
    out3 = quarantine_write(
        df.where(F.lit(False)), checks, str(tmp_path / "routed3")
    )
    assert (out3["clean_rows"], out3["quarantined_rows"]) == (0, 0)
    # counts=False skips the read-back accounting jobs entirely
    out4 = quarantine_write(
        df, checks, str(tmp_path / "routed4"), counts=False
    )
    assert out4["clean_rows"] is None
    assert spark.read.parquet(str(tmp_path / "routed4")).count() == 5

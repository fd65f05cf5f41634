"""Unit tests for operators/timeseries.py: fixed-grid resample with
forward fill / linear interpolation, gap sessionization, and SCD2
history compaction — edge semantics the suite's sf-fixture oracle rows
can't isolate (exact gap boundaries, all-NULL states, tie picking)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.timeseries import (
    resample_ffill,
    scd2_history,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, event_id bigint"
    )


class TestResampleFfill:
    def test_grid_ffill_and_lerp(self, spark):
        df = _ev(spark, [
            (1, dt.datetime(2024, 1, 1, 5), 10.0, 1),
            (1, dt.datetime(2024, 1, 5, 7), 30.0, 2),
        ])
        out = resample_ffill(
            df, ["user_id"], "ts", "value",
            step="day", tiebreak=["event_id"], lerp=True,
        ).orderBy("bucket").collect()
        assert [r.bucket for r in out] == [
            dt.date(2024, 1, d) for d in (1, 2, 3, 4, 5)
        ]
        assert [r.value_ffill for r in out] == [10.0, 10.0, 10.0, 10.0, 30.0]
        assert [r.is_observed for r in out] == [True, False, False, False, True]
        assert [r.value_lerp for r in out] == [10.0, 15.0, 20.0, 25.0, 30.0]

    def test_last_in_bucket_wins_by_tiebreak(self, spark):
        # same timestamp twice in one bucket: the higher event_id wins
        df = _ev(spark, [
            (1, dt.datetime(2024, 1, 1, 5), 1.0, 7),
            (1, dt.datetime(2024, 1, 1, 5), 2.0, 9),
            (1, dt.datetime(2024, 1, 1, 3), 99.0, 1),
        ])
        out = resample_ffill(
            df, ["user_id"], "ts", "value", step="day", tiebreak=["event_id"]
        ).collect()
        assert len(out) == 1 and out[0].value_ffill == 2.0

    def test_single_observation_user(self, spark):
        df = _ev(spark, [(1, dt.datetime(2024, 1, 3, 1), 5.0, 1)])
        out = resample_ffill(
            df, ["user_id"], "ts", "value",
            step="day", tiebreak=["event_id"], lerp=True,
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.bucket == dt.date(2024, 1, 3)
        assert r.value_ffill == 5.0 and r.value_lerp == 5.0 and r.is_observed

    def test_hour_step_keeps_timestamp_bucket(self, spark):
        df = _ev(spark, [
            (1, dt.datetime(2024, 1, 1, 5, 10), 1.0, 1),
            (1, dt.datetime(2024, 1, 1, 8, 40), 4.0, 2),
        ])
        out = resample_ffill(
            df, ["user_id"], "ts", "value", step="hour", tiebreak=["event_id"]
        ).orderBy("bucket").collect()
        assert [r.bucket.hour for r in out] == [5, 6, 7, 8]
        assert [r.value_ffill for r in out] == [1.0, 1.0, 1.0, 4.0]

    def test_bad_step_raises(self, spark):
        df = _ev(spark, [(1, T0, 1.0, 1)])
        with pytest.raises(ValueError, match="step"):
            resample_ffill(df, ["user_id"], "ts", "value", step="week")


class TestSessionize:
    def test_gap_boundary_is_inclusive(self, spark):
        # events exactly `gap` apart stay in ONE session; one microsecond
        # beyond splits — pinned at microsecond precision
        gap = dt.timedelta(minutes=30)
        us = dt.timedelta(microseconds=1)
        df = _ev(spark, [
            (1, T0, 1.0, 1),
            (1, T0 + gap, 2.0, 2),            # == gap -> same session
            (1, T0 + gap * 2 + us, 4.0, 3),   # > gap -> new session
        ])
        out = sessionize(
            df, ["user_id"], "ts",
            gap="30 minutes", tiebreak=["event_id"], value_col="value",
        ).orderBy("session_id").collect()
        assert [(r.session_id, r.n_events) for r in out] == [(1, 2), (2, 1)]
        assert out[0].value_sum == 3.0
        assert out[0].session_start == T0 and out[0].session_end == T0 + gap

    def test_sessions_isolated_per_key(self, spark):
        df = _ev(spark, [
            (1, T0, 1.0, 1),
            (2, T0 + dt.timedelta(minutes=5), 2.0, 2),
        ])
        out = sessionize(df, ["user_id"], "ts", gap="30 minutes").collect()
        assert sorted((r.user_id, r.session_id) for r in out) == [(1, 1), (2, 1)]

    def test_no_value_col_omits_sum(self, spark):
        df = _ev(spark, [(1, T0, 1.0, 1)])
        out = sessionize(df, ["user_id"], "ts")
        assert "value_sum" not in out.columns

    def test_exchange_reuse_one_shuffle(self, spark):
        # the session-level groupBy must reuse the window's exchange
        df = _ev(spark, [(1, T0, 1.0, 1)])
        out = sessionize(df, ["user_id"], "ts", tiebreak=["event_id"])
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1


class TestScd2History:
    def _log(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, state string, event_id bigint"
        )

    def test_compaction_and_validity(self, spark):
        h = dt.timedelta(hours=1)
        df = self._log(spark, [
            (1, T0, "a", 1),
            (1, T0 + h, "a", 2),      # duplicate -> collapsed
            (1, T0 + 2 * h, "b", 3),
            (1, T0 + 3 * h, "a", 4),  # back to a -> NEW version
        ])
        out = scd2_history(
            df, ["user_id"], "ts", ["state"], tiebreak=["event_id"]
        ).orderBy("version").collect()
        assert [(r.state, r.version) for r in out] == [
            ("a", 1), ("b", 2), ("a", 3)
        ]
        assert out[0].valid_from == T0 and out[0].valid_to == T0 + 2 * h
        assert out[2].valid_to is None and out[2].is_current
        assert not out[0].is_current

    def test_all_null_first_state_kept(self, spark):
        h = dt.timedelta(hours=1)
        df = self._log(spark, [
            (1, T0, None, 1),
            (1, T0 + h, None, 2),   # NULL run collapses into one version
            (1, T0 + 2 * h, "x", 3),
        ])
        out = scd2_history(
            df, ["user_id"], "ts", ["state"], tiebreak=["event_id"]
        ).orderBy("version").collect()
        assert [(r.state, r.version) for r in out] == [(None, 1), ("x", 2)]

    def test_multi_column_state(self, spark):
        h = dt.timedelta(hours=1)
        df = spark.createDataFrame(
            [
                (1, T0, "a", 1.0, 1),
                (1, T0 + h, "a", 2.0, 2),  # second col changes -> version
            ],
            "user_id bigint, ts timestamp, s1 string, s2 double, event_id bigint",
        )
        out = scd2_history(
            df, ["user_id"], "ts", ["s1", "s2"], tiebreak=["event_id"]
        )
        assert out.count() == 2

    def test_one_shuffle(self, spark):
        df = self._log(spark, [(1, T0, "a", 1)])
        out = scd2_history(df, ["user_id"], "ts", ["state"], tiebreak=["event_id"])
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1


class TestGapParser:
    def test_shared_with_streaming_and_day_units(self, spark):
        # review finding: two diverged copies — now one helper
        from window_aggregation_spark.operators.timeseries import (
            _parse_gap_seconds,
        )
        from window_aggregation_spark.streaming import window_stream

        assert window_stream._parse_gap_seconds is _parse_gap_seconds
        assert _parse_gap_seconds("2 days") == 172800

    def test_unsupported_units_raise_value_error(self, spark):
        from window_aggregation_spark.operators.timeseries import (
            _parse_gap_seconds,
        )

        for bad in ("1 week", "30min", "soon"):
            with pytest.raises(ValueError, match="unsupported duration"):
                _parse_gap_seconds(bad)


class TestResampleOhlc:
    def test_ohlc_hand_values(self, spark):
        df = _ev(spark, [
            (1, dt.datetime(2024, 1, 1, 2), 5.0, 1),
            (1, dt.datetime(2024, 1, 1, 9), 9.0, 2),
            (1, dt.datetime(2024, 1, 1, 5), 1.0, 3),
            (1, dt.datetime(2024, 1, 2, 1), 7.0, 4),
        ])
        from window_aggregation_spark.operators.timeseries import (
            resample_ohlc,
        )

        out = {r.bucket: r for r in resample_ohlc(
            df, ["user_id"], "ts", "value",
            step="day", tiebreak=["event_id"],
        ).collect()}
        d1 = out[dt.date(2024, 1, 1)]
        assert (d1.open, d1.high, d1.low, d1.close, d1.n_obs) == (
            5.0, 9.0, 1.0, 9.0, 3
        )
        d2 = out[dt.date(2024, 1, 2)]
        assert (d2.open, d2.close, d2.n_obs) == (7.0, 7.0, 1)

    def test_tie_on_ts_resolved_by_tiebreak(self, spark):
        df = _ev(spark, [
            (1, T0, 2.0, 9),
            (1, T0, 1.0, 3),  # same ts: lower event_id is the open
        ])
        from window_aggregation_spark.operators.timeseries import (
            resample_ohlc,
        )

        r = resample_ohlc(
            df, ["user_id"], "ts", "value",
            step="day", tiebreak=["event_id"],
        ).collect()[0]
        assert r.open == 1.0 and r.close == 2.0


class TestRollingZscore:
    def _score(self, spark, values, **kw):
        from window_aggregation_spark.operators.timeseries import rolling_zscore

        rows = [
            (1, T0 + dt.timedelta(minutes=i), float(v), i)
            for i, v in enumerate(values)
        ]
        out = rolling_zscore(
            _ev(spark, rows), ["user_id"], "ts", "value",
            tiebreak=["event_id"], **kw,
        )
        return out.orderBy("event_id").collect()

    def test_spike_flagged_against_clean_history(self, spark):
        # alternating 9/11 history (mean 10, sd ~1), then a 30 spike:
        # the spike's own value must NOT contaminate its baseline
        vals = [9.0, 11.0] * 5 + [30.0]
        out = self._score(spark, vals, min_obs=10)
        spike = out[-1]
        assert spike.n_hist == 10
        import statistics

        hist = vals[:-1]
        expect = (30.0 - statistics.mean(hist)) / statistics.stdev(hist)
        assert spike.zscore == pytest.approx(expect, abs=1e-3)
        assert spike.is_anomaly

    def test_min_obs_gates_score(self, spark):
        out = self._score(spark, [1.0, 2.0, 3.0, 4.0], min_obs=3)
        assert [r.zscore is None for r in out] == [True, True, True, False]
        assert [r.is_anomaly for r in out[:3]] == [False, False, False]

    def test_constant_history_scores_null_not_anomalous(self, spark):
        out = self._score(spark, [5.0] * 12 + [50.0], min_obs=5)
        last = out[-1]
        assert last.zscore is None and last.is_anomaly is False

    def test_inlier_not_flagged(self, spark):
        vals = [9.0, 11.0] * 6 + [10.5]
        last = self._score(spark, vals, min_obs=10)[-1]
        assert last.zscore is not None and not last.is_anomaly


def test_funnel_conversion_semantics(spark):
    """Step k requires an event STRICTLY after the user's step k-1 time;
    within_seconds bounds every step from the FIRST-step time."""
    import datetime as dt

    from window_aggregation_spark.operators.timeseries import (
        funnel_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, mins):
        return (uid, typ, t0 + dt.timedelta(minutes=mins))

    rows = [
        # u1 completes: view@0 -> click@10 -> purchase@20
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # u2: click BEFORE view -> stops at step 1
        ev(2, "click", 0), ev(2, "view", 10),
        # u3: purchase before click -> stops at step 2
        ev(3, "view", 0), ev(3, "purchase", 5), ev(3, "click", 8),
        # u4: completes but purchase outside the window
        ev(4, "view", 0), ev(4, "click", 1), ev(4, "purchase", 120),
        # u5: never views
        ev(5, "click", 0), ev(5, "purchase", 1),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r.step: (r.event_type, r.users, r.frac_of_first, r.frac_of_prev)
        for r in funnel_conversion(
            df, ["view", "click", "purchase"], within_seconds=3600
        ).collect()
    }
    assert out[1] == ("view", 4, 1.0, None)       # u1-u4 view
    assert out[2] == ("click", 3, 0.75, 0.75)     # u2 dropped (order)
    assert out[3][:2] == ("purchase", 1)          # only u1 (u3 order, u4 window)
    assert out[3][2] == 1 / 4 and out[3][3] == 1 / 3


def test_cohort_retention_semantics(spark):
    import datetime as dt

    from window_aggregation_spark.operators.timeseries import (
        cohort_retention,
    )

    day = 86400

    def ev(uid, d):
        return (uid, dt.datetime(2024, 1, 1) + dt.timedelta(days=d))

    # u1,u2 first on day 0; u1 returns day 1 and 2, u2 only day 2.
    # u3 first on day 1, returns day 2.
    rows = [ev(1, 0), ev(2, 0), ev(1, 1), ev(1, 2), ev(2, 2),
            ev(3, 1), ev(3, 2)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_start, r.period_offset): (
            r.active_users, r.cohort_size, r.retention)
        for r in cohort_retention(df, period_seconds=day).collect()
    }
    d0 = dt.datetime(2024, 1, 1)
    d1 = dt.datetime(2024, 1, 2)
    assert got[(d0, 0)] == (2, 2, 1.0)
    assert got[(d0, 1)] == (1, 2, 0.5)
    assert got[(d0, 2)] == (2, 2, 1.0)
    assert got[(d1, 0)] == (1, 1, 1.0)
    assert got[(d1, 1)] == (1, 1, 1.0)
    assert (d1, 2) not in got

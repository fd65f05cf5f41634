"""Semantics tests for the as-of join operator: <= matching, no-match
nulls, equal-timestamp inclusion, tie-break determinism, atomic payload."""

from __future__ import annotations

from pyspark.sql import functions as F

from window_aggregation_spark.operators.asof_join import asof_join


def _ts(s: str):
    return s


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00"),
            (2, 10, "2024-01-01 12:00:00"),
            (3, 20, "2024-01-01 09:00:00"),  # no right row at or before
        ],
        "lid long, k long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    right = spark.createDataFrame(
        [
            (100, 10, "2024-01-01 09:30:00", 1.0),
            (101, 10, "2024-01-01 11:00:00", 2.0),
            (102, 20, "2024-01-01 09:30:00", 3.0),
        ],
        "rid long, k long, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    out = {
        r["lid"]: (r["rid"], r["v"])
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"],
            tiebreak="rid",
        ).collect()
    }
    assert out == {1: (100, 1.0), 2: (101, 2.0), 3: (None, None)}


def test_asof_equal_ts_included_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 5, "2024-01-01 10:00:00")], "lid long, k long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    # two right rows at exactly left.ts: <= includes them; larger tiebreak wins
    right = spark.createDataFrame(
        [
            (200, 5, "2024-01-01 10:00:00", 1.0),
            (201, 5, "2024-01-01 10:00:00", 2.0),
        ],
        "rid long, k long, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    (row,) = asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"], tiebreak="rid"
    ).collect()
    assert (row["rid"], row["v"]) == (201, 2.0)


def test_asof_payload_is_atomic(spark):
    """Both carried columns must come from the SAME right row even when an
    earlier right row exists."""
    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 12:00:00")], "lid long, k long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    right = spark.createDataFrame(
        [
            (300, 7, "2024-01-01 10:00:00", 10.0),
            (301, 7, "2024-01-01 11:00:00", 20.0),
        ],
        "rid long, k long, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    (row,) = asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"], tiebreak="rid"
    ).collect()
    assert (row["rid"], row["v"]) == (301, 20.0)


def test_asof_overlapping_names_get_suffix(spark):
    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 12:00:00", 5.0)],
        "lid long, k long, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    right = spark.createDataFrame(
        [(300, 7, "2024-01-01 10:00:00", 10.0)],
        "rid long, k long, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = asof_join(
        left, right, on=["k"], ts_col="ts", right_cols=["v"], tiebreak="rid"
    )
    assert "v_asof" in out.columns and "v" in out.columns
    (row,) = out.collect()
    assert row["v"] == 5.0 and row["v_asof"] == 10.0


def _tsdf(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")


def test_asof_forward_picks_earliest_at_or_after(spark):
    left = _tsdf(
        spark,
        [(1, 7, "2024-01-01 12:00:00"), (2, 7, "2024-01-01 23:00:00")],
        "lid long, k long, ts_s string",
    )
    right = _tsdf(
        spark,
        [
            (300, 7, "2024-01-01 10:00:00", 1.0),  # before both -> never
            (301, 7, "2024-01-01 12:00:00", 2.0),  # equal ts -> inclusive
            (302, 7, "2024-01-01 15:00:00", 3.0),
        ],
        "rid long, k long, ts_s string, v double",
    )
    out = {
        r["lid"]: (r["rid"], r["v"])
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"],
            tiebreak="rid", direction="forward",
        ).collect()
    }
    assert out == {1: (301, 2.0), 2: (None, None)}


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _tsdf(
        spark,
        [(1, 7, "2024-01-05 00:00:00"), (2, 7, "2024-01-01 01:00:00")],
        "lid long, k long, ts_s string",
    )
    right = _tsdf(
        spark,
        [(300, 7, "2024-01-01 00:00:00", 1.0)],
        "rid long, k long, ts_s string, v double",
    )
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"],
            tiebreak="rid", tolerance="1 day",
        ).collect()
    }
    # lid=1 is 4 days after the only right row -> stale -> null;
    # lid=2 is 1h after -> kept
    assert out == {1: None, 2: 300}


def test_asof_forward_tolerance_and_bad_direction(spark):
    left = _tsdf(spark, [(1, 7, "2024-01-01 00:00:00")],
                 "lid long, k long, ts_s string")
    right = _tsdf(
        spark,
        [(300, 7, "2024-01-03 00:00:00", 1.0)],
        "rid long, k long, ts_s string, v double",
    )
    kw = dict(on=["k"], ts_col="ts", right_cols=["rid"], tiebreak="rid",
              direction="forward")
    (near,) = asof_join(left, right, tolerance="3 days", **kw).collect()
    assert near["rid"] == 300
    (far,) = asof_join(left, right, tolerance="1 day", **kw).collect()
    assert far["rid"] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], ts_col="ts", right_cols=["rid"],
                  direction="sideways")


def test_asof_nearest_picks_closer_and_breaks_ties_backward(spark):
    left = _tsdf(
        spark,
        [(1, 7, "2024-01-10 00:00:00"), (2, 7, "2024-01-20 00:00:00")],
        "lid long, k long, ts_s string",
    )
    right = _tsdf(
        spark,
        [
            (300, 7, "2024-01-08 00:00:00", 1.0),   # 2d before lid 1
            (301, 7, "2024-01-11 00:00:00", 2.0),   # 1d after lid 1 (closer)
            (302, 7, "2024-01-19 00:00:00", 3.0),   # 1d before lid 2
            (303, 7, "2024-01-21 00:00:00", 4.0),   # 1d after lid 2 (tie)
        ],
        "rid long, k long, ts_s string, v double",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid"],
            tiebreak="rid", direction="nearest",
        ).collect()
    }
    assert got == {1: 301, 2: 302}  # closer wins; equidistant -> backward
    # a single in-tolerance side still matches even when the closer side
    # is out of tolerance (tolerance filters BEFORE the distance compare)
    got_tol = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left.where("lid = 1"),
            right.where("rid = 300"),  # only the 2-day-back candidate
            on=["k"], ts_col="ts", right_cols=["rid"],
            tiebreak="rid", direction="nearest", tolerance="3 days",
        ).collect()
    }
    assert got_tol == {1: 300}

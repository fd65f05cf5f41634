"""Regression tests for round-3 review advice: range-join left NULL rows,
NULL-stratum handling in take_n/stratified_sample, compaction size-estimate
sentinel, salted-join salt independence from row values."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from window_aggregation_spark.operators.corpus import (
    stratified_sample,
    stratified_sample_oracle_where,
    take_n_per_stratum,
)
from window_aggregation_spark.operators.range_join import range_join
from window_aggregation_spark.operators.skew import salted_join
from window_aggregation_spark.sources.io import write_compacted_parquet


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.to_timestamp(c + "_s")).drop(c + "_s")
    return df


def test_range_join_left_null_column_matched_row_not_duplicated(spark):
    """A matched point carrying a NULL in a non-ts column must appear exactly
    once (round-3 advice: the all-columns anti-join was null-unsafe, so the
    NULL row was emitted twice — matched AND as a spurious unmatched row)."""
    points = _ts(
        spark.createDataFrame(
            [
                (1, None, "2024-01-01 10:30:00"),   # NULL payload, matches
                (2, "ok", "2024-01-01 10:40:00"),   # non-NULL, matches
                (3, None, "2024-03-01 00:00:00"),   # NULL payload, no match
            ],
            "pid long, payload string, ts_s string",
        ),
        "ts",
    )
    ivals = _ts(
        spark.createDataFrame(
            [(100, "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
            "ival_id long, start_s string, end_s string",
        ),
        "start",
        "end",
    )
    out = range_join(
        points, ivals, "ts", "start", "end", bucket="1 hour", how="left"
    ).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["ival_id"])
    assert by_pid == {1: [100], 2: [100], 3: [None]}
    assert len(out) == 3  # no duplicate emission of the NULL-bearing row


def test_take_n_per_stratum_keeps_null_stratum(spark):
    """NULL strata form their own partition, exactly like the plain
    ROW_NUMBER ranking and the DuckDB oracle (round-3 advice: null-unsafe
    stratum joins silently dropped every NULL-stratum row)."""
    rows = [(i, "a" if i % 3 == 0 else None, f"d{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = take_n_per_stratum(df, "source", 4, "doc_id")
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"a": 4, None: 4}
    # bit-identical to the plain window ranking it claims to equal
    from window_aggregation_spark.operators.corpus import _sample_residue

    w = Window.partitionBy("source").orderBy(
        _sample_residue("source", "doc_id", "strat"), F.col("doc_id")
    )
    expected = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
        .drop("rn")
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in expected.collect()
    )


def test_stratified_sample_null_stratum_matches_duckdb_oracle(spark):
    """Spark and DuckDB must hash identical bytes for NULL-stratum rows
    (round-3 advice: concat_ws skips NULL+separator, DuckDB concat keeps the
    ':' literals — the coalesce sentinel makes both sides byte-identical)."""
    import duckdb

    rows = [(i, None if i % 2 else "web") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"web": 0.5}
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df, "source", rates, "doc_id", default_rate=0.3
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    where = stratified_sample_oracle_where(
        "source", rates, "doc_id", default_rate=0.3
    )
    expected = sorted(
        r[0] for r in con.execute(f"SELECT doc_id FROM t WHERE {where}").fetchall()
    )
    con.close()
    assert got == expected
    # the NULL stratum must actually be sampled (default_rate 0.3 > 0)
    assert any(i % 2 for i in got)


def test_write_compacted_parquet_sentinel_estimate_clamped(spark, tmp_path):
    """An RDD-backed plan reports defaultSizeInBytes (Long.MaxValue) as its
    size; n_files must fall back to the current partition count instead of
    issuing repartition(~10^12) (round-3 advice)."""
    rdd = spark.sparkContext.parallelize([(i, f"v{i}") for i in range(100)], 4)
    df = spark.createDataFrame(rdd, "id long, v string")
    n = write_compacted_parquet(
        df, str(tmp_path / "out"), target_mb=512, shuffle=True
    )
    assert 1 <= n <= 8
    assert spark.read.parquet(str(tmp_path / "out")).count() == 100


def test_salted_join_value_independent_salt(spark):
    """Byte-identical duplicate rows under the hot key must still spread
    across salts, and unhashable column types (maps) must not break the salt
    (round-3 advice: whole-row xxhash64 collapsed duplicates to one salt and
    threw on MapType)."""
    left = spark.createDataFrame(
        [(1, {"a": 1}, "payload")] * 64 + [(2, {"b": 2}, "other")] * 4,
        "k long, m map<string,int>, v string",
    )
    right = spark.createDataFrame([(1, "dim1"), (2, "dim2")], "k long, d string")
    out = salted_join(left, right, on=["k"], salts=8)
    assert out.count() == 68  # exact plain-join result set
    by_k = {r["k"]: r["count"] for r in out.groupBy("k").count().collect()}
    assert by_k == {1: 64, 2: 4}
    # spread check: reproduce the internal salt and assert the hot key's
    # identical rows occupy more than one salt bucket
    n_salts = (
        left.withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8))
        )
        .where(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts > 1

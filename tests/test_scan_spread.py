"""Unit coverage for the scale-adaptive scan spread (sources/io.py:
spread_target / spread_scan / read_table_spread) — the r13 machinery that
round-robins a compute-heavy scan ONLY when the input cannot fill the
cluster. Plan-shape consumers are pinned in test_plan_quality.py with the
spread disabled; THIS file covers the decision arithmetic itself."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.io import (
    read_table_spread,
    spread_scan,
    spread_target,
)

MPB = "spark.sql.files.maxPartitionBytes"


@pytest.fixture()
def small_file(tmp_path):
    p = tmp_path / "tiny.bin"
    p.write_bytes(b"x" * 4096)
    return str(p)


def test_single_small_file_spreads_to_parallelism(spark, small_file):
    """One sub-split file = one scan task no matter what Spark's
    bytesPerCore adaptation does — the case the spread exists for."""
    assert spread_target(spark, small_file) == (
        spark.sparkContext.defaultParallelism
    )


def test_already_parallel_input_is_left_alone(spark, tmp_path):
    """A table whose estimated split count already fills the cluster must
    NOT be re-exchanged: mirror of FilePartition.maxSplitBytes — with
    maxPartitionBytes=1m, a 6 MB file plans ~10 splits >= 4 cores."""
    p = tmp_path / "mid.bin"
    p.write_bytes(b"x" * (6 << 20))
    old = spark.conf.get(MPB, "134217728")
    spark.conf.set(MPB, "1m")
    try:
        assert spread_target(spark, str(p)) is None
    finally:
        spark.conf.set(MPB, old)
    # same file at the 128m default is a single split -> spread
    assert spread_target(spark, str(p)) == (
        spark.sparkContext.defaultParallelism
    )


def test_conf_unit_parsing(spark, small_file):
    """maxPartitionBytes accepts raw bytes and k/m/g suffixes (with or
    without a trailing b); the parser must read them all."""
    old = spark.conf.get(MPB, "134217728")
    try:
        for raw in ("134217728", "128m", "128MB", "1g"):
            spark.conf.set(MPB, raw)
            assert spread_target(spark, small_file) is not None, raw
    finally:
        spark.conf.set(MPB, old)


def test_kill_switch_and_unknown_paths(spark, small_file, tmp_path):
    os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
    try:
        assert spread_target(spark, small_file) is None
    finally:
        os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)
    # missing path (object store / not yet materialized): never guess
    assert spread_target(spark, str(tmp_path / "nope.parquet")) is None
    # empty dir: nothing to spread
    empty = tmp_path / "emptydir"
    empty.mkdir()
    assert spread_target(spark, str(empty)) is None


def test_spread_scan_none_is_identity_and_n_repartitions(spark):
    df = spark.range(0, 100)
    assert spread_scan(df, None) is df
    n = spark.sparkContext.defaultParallelism
    out = spread_scan(df, n)
    assert out.rdd.getNumPartitions() == n
    assert out.count() == 100
    # barrier variant pins rows but must not change them
    outb = spread_scan(df, n, barrier=True)
    assert outb.count() == 100
    assert sorted(r[0] for r in outb.collect()) == list(range(100))


def test_read_table_spread_values_identical(spark, sf_dir):
    from window_aggregation_spark.sources.io import read_table

    plain = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    spread = read_table_spread(spark, sf_dir, "documents", "doc_id", "text")
    assert spread.columns == ["doc_id", "text"]
    assert plain.exceptAll(spread).count() == 0
    assert spread.exceptAll(plain).count() == 0

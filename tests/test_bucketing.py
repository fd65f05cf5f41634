"""Bucketed tables: a join between two tables bucketed on the join key must
plan with NO shuffle exchange — the physical layout co-locates the keys."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.io import read_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    try:
        write_bucketed(
            li.select("l_orderkey", "l_quantity"), "li_b", ["l_orderkey"],
            num_buckets=8,
        )
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice"), "ord_b", ["o_orderkey"],
            num_buckets=8,
        )
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        # and an unbucketed baseline DOES shuffle
        base = li.select("l_orderkey", "l_quantity").join(
            orders.select("o_orderkey", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in base_plan
        assert joined.count() == base.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_window_over_bucketed_table_has_no_shuffle(spark, sf_dir):
    """The 100 TB pattern for repeated windowing on one key: bucket the fact
    table on the partition key once, and every subsequent window aggregation
    on that key plans with ZERO exchanges (the bucketed scan already
    satisfies the window's HashPartitioning requirement — only the
    in-partition sort remains)."""
    from window_aggregation_spark import (
        AggregateDef,
        OrderKey,
        WindowPlan,
        WindowSpecDef,
        window_aggregate,
    )

    li = read_table(spark, sf_dir, "lineitem")
    try:
        write_bucketed(
            li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"),
            "li_wb", ["l_suppkey"], num_buckets=8,
        )
        plan_def = WindowPlan(
            spec=WindowSpecDef(
                partition_by=("l_suppkey",),
                order_by=(OrderKey("l_orderkey"), OrderKey("l_linenumber")),
            ),
            aggregates=(AggregateDef("rq", "accumulate", field="l_quantity"),),
        )
        out = window_aggregate(spark.table("li_wb"), plan_def)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window ") == 1
        assert "Exchange" not in plan, f"bucketed window still shuffles:\n{plan[:800]}"
        # unbucketed baseline shuffles
        base_plan = (
            window_aggregate(
                li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"),
                plan_def,
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in base_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS li_wb")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def _file_boxes(path, cols):
    """Per-file (min, max) footer stats for each named column."""
    import glob

    import pyarrow.parquet as pq

    boxes = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        box = {}
        for c in cols:
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == c
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            box[c] = (min(mins), max(maxs))
        boxes.append(box)
    return boxes


def test_zordered_parquet_prunes_second_dimension(spark, sf_dir, tmp_path):
    """The z-order selling point: a filter on the SECOND clustered
    dimension skips files. Single-key ts clustering gives every file the
    full user_id span (a 10%-of-users query overlaps 100% of files);
    z-order (ts, user_id) gives each file a 2-D box, so the same query
    overlaps a strict subset."""
    from window_aggregation_spark.sources.io import (
        write_clustered_parquet,
        write_zordered_parquet,
    )

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    n = events.count()
    lo, hi = events.agg(F.min("user_id"), F.max("user_id")).first()
    # query box: ALL of ts x the lowest ~10% of users
    u_cut = lo + (hi - lo) // 10

    zpath, cpath = str(tmp_path / "z"), str(tmp_path / "c")
    write_zordered_parquet(events, zpath, ["ts", "user_id"], num_files=16)
    write_clustered_parquet(events, cpath, ["ts"], num_files=16)

    def overlapping(path):
        boxes = _file_boxes(path, ["user_id"])
        return sum(1 for b in boxes if b["user_id"][0] <= u_cut), len(boxes)

    z_hit, z_n = overlapping(zpath)
    c_hit, c_n = overlapping(cpath)
    assert c_hit == c_n  # single-key layout cannot prune the 2nd dim
    assert z_hit <= z_n // 2  # z-order skips at least half the files
    # and the data survives the round trip
    assert spark.read.parquet(zpath).count() == n


def test_zorder_handles_nulls_and_degenerate_dims(spark, tmp_path):
    """NULL values quantize to 0 (sort first), an all-equal dimension
    contributes nothing, and no rows are lost in the round trip."""
    from window_aggregation_spark.sources.io import write_zordered_parquet

    rows = [(i, i % 7 if i % 5 else None, 42) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    path = str(tmp_path / "z")
    write_zordered_parquet(df, path, ["a", "b"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.where("a IS NULL").count() == 20
    assert sorted(r["id"] for r in back.collect()) == list(range(100))


def test_zorder_key_validation(spark, sf_dir):
    from window_aggregation_spark.sources.io import zorder_key

    events = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        zorder_key(events, ["ts"])
    with pytest.raises(ValueError):
        zorder_key(events, ["ts", "user_id", "value", "event_id"], bits=16)


def test_clustered_parquet_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_clustered_parquet must produce files whose ts min/max footer
    stats cover narrow, mostly-disjoint slices — the property that lets
    readers skip files on a time filter. A random layout would give every
    file ~the full global range (sum of spans ~ n_files x global)."""
    import glob

    import pyarrow.parquet as pq

    from window_aggregation_spark.sources.io import write_clustered_parquet

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    n = events.count()
    path = str(tmp_path / "clustered")
    write_clustered_parquet(events, path, ["ts"], num_files=8)
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) >= 4
    spans = []
    lo_all, hi_all = None, None
    for f in files:
        md = pq.read_metadata(f)
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        lo, hi = min(mins), max(maxs)
        spans.append((hi - lo).total_seconds())
        lo_all = lo if lo_all is None else min(lo_all, lo)
        hi_all = hi if hi_all is None else max(hi_all, hi)
    global_span = (hi_all - lo_all).total_seconds()
    assert global_span > 0
    # disjoint-ish: total covered span ~= global span, nowhere near
    # n_files x global (the random-layout worst case)
    assert sum(spans) <= 1.5 * global_span
    assert spark.read.parquet(path).count() == n

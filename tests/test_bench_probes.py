"""The bench probes are part of the per-round evidence chain — pin their
structure and invariants at sf0.001 so a probe regression can't silently
produce a malformed BENCH record. Timings themselves are not asserted
(sf0.001 is far below the skew probe's documented win regime)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_skew_probe_shape(spark, sf_dir):
    out = bench.skew_probe(spark, sf_dir, chunks=4, copies=2)
    assert set(out) >= {
        "rows", "hot_share", "chunks", "plain_running_sum",
        "salted_running_sum", "plain_join", "salted_join",
        "running_sum_speedup", "join_speedup",
    }
    assert out["rows"] > 0 and out["chunks"] == 4
    assert all(
        out[k] > 0 for k in (
            "plain_running_sum", "salted_running_sum",
            "plain_join", "salted_join",
        )
    )


def test_streaming_probe_shape(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SRC", str(tmp_path / "stream_src"))
    out = bench.streaming_probe(spark, sf_dir, n_files=3)
    assert out["rows"] > 0 and out["files"] == 3
    for k in ("window_agg", "stateful_ewma"):
        # every staged file becomes its own micro-batch (the probe's point)
        assert out[k]["micro_batches"] == 3
        assert out[k]["sec"] > 0 and out[k]["rows_per_sec"] > 0


def test_layout_probe_shape(spark, sf_dir):
    out = bench.layout_probe(spark, sf_dir, n_files=6)
    for k in ("clustered_ts", "zorder_ts_user"):
        assert out[k]["files_total"] >= 4
        assert 0 < out[k]["read_fraction"] <= 1.0
        assert out[k]["write_sec"] > 0
    # the probe's reason to exist: single-key reads everything on the
    # 2nd-dim slice, z-order reads strictly less
    assert out["clustered_ts"]["read_fraction"] == 1.0
    assert (
        out["zorder_ts_user"]["files_read"]
        < out["clustered_ts"]["files_read"]
    )


def test_scaled_dir_builder_shifts_keys_and_remaps_text(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "scaled")
    bench._ensure_scaled_dir(spark, sf_dir, out_dir, copies=2)
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = spark.read.parquet(f"{out_dir}/documents.parquet")
    assert big.count() == 2 * src.count()
    # copies must not collide on ids, and copy 1's text is re-mapped
    assert big.select("doc_id").distinct().count() == big.count()
    li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
    src_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert li.count() == 2 * src_li.count()
    # second build is a no-op (idempotence marker)
    bench._ensure_scaled_dir(spark, sf_dir, out_dir, copies=2)
    assert (tmp_path / "scaled" / "_BUILT").exists()

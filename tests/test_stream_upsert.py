"""Streaming upsert: later micro-batches must overwrite earlier rows with
the same key, and last-write-wins must hold within a batch."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from window_aggregation_spark.streaming.upsert import (
    latest_per_key,
    stream_upsert_parquet,
)

SCHEMA = "key long, version long, payload string"


def test_latest_per_key_within_batch(spark):
    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "x")], SCHEMA
    )
    out = {r["key"]: r["payload"] for r in latest_per_key(df, ["key"], "version").collect()}
    assert out == {1: "c", 2: "x"}


def test_stream_upsert_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "snapshot")
    checkpoint = str(tmp_path / "ckpt")

    # batch 1: keys 1..3 at version 1; batch 2: keys 2..4 at version 2
    b1 = pd.DataFrame({"key": [1, 2, 3], "version": [1, 1, 1],
                       "payload": ["a1", "b1", "c1"]})
    b2 = pd.DataFrame({"key": [2, 3, 4], "version": [2, 2, 2],
                       "payload": ["b2", "c2", "d2"]})
    for i, b in enumerate([b1, b2]):
        p = src / f"part-{i}.parquet"
        b.to_parquet(p, index=False)
        mtime = time.time() - 60 + i * 10
        os.utime(p, (mtime, mtime))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_upsert_parquet(
        stream, target, keys=["key"], version_col="version", checkpoint=checkpoint
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    snap = {
        r["key"]: (r["version"], r["payload"])
        for r in spark.read.parquet(target).collect()
    }
    assert snap == {
        1: (1, "a1"),   # untouched by batch 2
        2: (2, "b2"),   # upserted
        3: (2, "c2"),   # upserted
        4: (2, "d2"),   # inserted
    }
    # publication is a pointer flip: target is a symlink into an immutable
    # versioned dir, and the superseded version is retained one epoch for
    # in-flight readers — there is never a moment with no snapshot.
    assert os.path.islink(target)
    from window_aggregation_spark.streaming.upsert import _version_dirs

    versions = _version_dirs(target)
    assert os.path.realpath(target) == os.path.realpath(versions[-1])
    assert len(versions) == 2  # current + one retained predecessor


def _mk_batch(spark, keys, version):
    return spark.createDataFrame(
        pd.DataFrame({
            "key": keys,
            "version": [version] * len(keys),
            "payload": [f"p{k}v{version}" for k in keys],
        })
    )


def test_gc_retention_survives_symlinked_parent_dir(spark, tmp_path):
    """Round-2 advice: the GC keep-set compared realpath(current) against
    raw glob paths — with a symlinked parent directory they never match, so
    the just-superseded snapshot was rmtree'd immediately. Both sides must
    be normalized before comparing."""
    from window_aggregation_spark.streaming.upsert import (
        _merge_batch,
        _version_dirs,
    )

    real = tmp_path / "real"
    real.mkdir()
    link = tmp_path / "link"
    os.symlink(str(real), str(link))
    target = str(link / "snap")  # realpath(target) goes through 'real'

    for v in (1, 2, 3):
        _merge_batch(spark, _mk_batch(spark, [1, 2], v), target,
                     ["key"], "version")
    versions = _version_dirs(target)
    # current + one retained predecessor — not GC'd to just-current
    assert len(versions) == 2
    assert os.path.realpath(target) == os.path.realpath(versions[-1])


def test_merge_batch_recovers_missing_pointer(spark, tmp_path):
    """Round-2 advice: a crash between writing a snapshot and flipping the
    pointer leaves no target symlink; the next merge must re-point at the
    newest complete snapshot instead of merging against nothing (which
    dropped — then GC'd — the existing data)."""
    from window_aggregation_spark.streaming.upsert import _merge_batch

    target = str(tmp_path / "snap")
    _merge_batch(spark, _mk_batch(spark, [1, 2], 1), target, ["key"], "version")
    os.remove(target)  # simulate crash after write, before pointer flip

    _merge_batch(spark, _mk_batch(spark, [2, 3], 2), target, ["key"], "version")
    snap = {
        r["key"]: r["payload"] for r in spark.read.parquet(target).collect()
    }
    # key 1 (only in the pre-crash snapshot) must survive
    assert snap == {1: "p1v1", 2: "p2v2", 3: "p3v2"}


def test_legacy_adoption_skips_orphaned_version_dir(spark, tmp_path):
    """Legacy plain-dir adoption numbers itself max(existing)+1: a .v000000
    orphan from an earlier crash must not make the adoption rename fail."""
    from window_aggregation_spark.streaming.upsert import _merge_batch

    target = str(tmp_path / "snap")
    # orphaned version dir (e.g. crashed first write), non-empty
    orphan = f"{target}.v000000"
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")
    # legacy plain-directory snapshot
    _mk_batch(spark, [1], 1).write.parquet(target)
    assert not os.path.islink(target)

    _merge_batch(spark, _mk_batch(spark, [2], 2), target, ["key"], "version")
    snap = {
        r["key"]: r["payload"] for r in spark.read.parquet(target).collect()
    }
    assert snap == {1: "p1v1", 2: "p2v2"}


def test_stream_upsert_merge_fn_seam(spark, tmp_path):
    """The lakehouse seam: a custom merge_fn replaces ONLY the per-batch
    merge — dedup/checkpoint/empty-skip plumbing is shared, and the default
    parquet snapshot machinery never runs."""
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "snapshot")
    calls = []

    def fake_merge(sp, batch, tgt, keys, version_col):
        calls.append((tgt, tuple(keys), version_col,
                      sorted(r["key"] for r in batch.collect())))

    b = pd.DataFrame({"key": [1, 2], "version": [1, 1], "payload": ["a", "b"]})
    b.to_parquet(src / "part-0.parquet", index=False)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = stream_upsert_parquet(
        stream, target, keys=["key"], version_col="version",
        checkpoint=str(tmp_path / "ckpt"), merge_fn=fake_merge,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert calls == [(target, ("key",), "version", [1, 2])]
    assert not os.path.lexists(target)  # default snapshot writer did not run


def test_merge_batch_migrates_legacy_plain_directory(spark, tmp_path):
    """A pre-existing plain-directory snapshot is adopted as v0 and merged
    correctly; after the first merge the target is symlink-published."""
    import pandas as pd
    from window_aggregation_spark.streaming.upsert import _merge_batch

    target = str(tmp_path / "snap")
    pd.DataFrame(
        {"key": [1, 2], "version": [1, 1], "payload": ["a1", "b1"]}
    ).pipe(lambda d: spark.createDataFrame(d)).write.parquet(target)
    assert not os.path.islink(target)

    batch = spark.createDataFrame(
        pd.DataFrame({"key": [2, 3], "version": [2, 2], "payload": ["b2", "c2"]})
    )
    _merge_batch(spark, batch, target, ["key"], "version")
    assert os.path.islink(target)
    snap = {
        r["key"]: r["payload"] for r in spark.read.parquet(target).collect()
    }
    assert snap == {1: "a1", 2: "b2", 3: "c2"}

"""Tar-shard export/import: roundtrip fidelity, byte determinism,
manifest honesty, shard assignment portability, and input validation."""

import hashlib
import os
import tarfile

import duckdb
import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.tar_shards import (
    assign_shards,
    assign_shards_oracle_expr,
    read_tar_shards,
    write_tar_shards,
)


def _docs(spark, n=60):
    return spark.range(n).selectExpr(
        "concat('doc', cast(id as string)) as doc_id",
        "encode(concat('payload-', repeat(cast(id as string), "
        "cast(id % 7 as int) + 1)), 'utf-8') as payload",
        "concat('s', cast(id % 3 as string)) as source",
    )


def test_assign_shards_matches_duckdb(spark):
    got = (
        assign_shards(_docs(spark), "doc_id", 8)
        .select("doc_id", "shard")
        .collect()
    )
    con = duckdb.connect()
    expr = assign_shards_oracle_expr("doc_id", 8)
    want = dict(
        con.execute(
            "SELECT doc_id, "
            + expr
            + " FROM (SELECT concat('doc', CAST(r AS VARCHAR)) AS doc_id"
            "  FROM range(60) t(r))"
        ).fetchall()
    )
    assert {r.doc_id: r.shard for r in got} == want


def test_roundtrip_payloads_and_meta(spark, tmp_path):
    df = assign_shards(_docs(spark), "doc_id", 4)
    manifest = write_tar_shards(
        df, str(tmp_path), "doc_id", "payload", meta_cols=("source",),
        ext="txt",
    ).collect()
    back = read_tar_shards(spark, str(tmp_path), with_meta=True).collect()
    orig = {r.doc_id: (r.shard, bytes(r.payload), r.source)
            for r in df.collect()}
    assert len(back) == len(orig)
    for r in back:
        shard, payload, source = orig[r.doc_id]
        assert r.shard == shard
        assert bytes(r.payload) == payload
        assert r.meta == '{"source":"%s"}' % source
    # manifest counts what was actually serialized
    assert sum(m.n_docs for m in manifest) == len(orig)
    assert sum(m.payload_bytes for m in manifest) == sum(
        len(p) for _, p, _ in orig.values()
    )
    for m in manifest:
        assert os.path.getsize(m.path) == m.tar_bytes


def test_one_tar_per_shard_and_entry_order(spark, tmp_path):
    df = assign_shards(_docs(spark), "doc_id", 4)
    write_tar_shards(df, str(tmp_path), "doc_id", "payload").collect()
    files = sorted(os.listdir(tmp_path))
    shards = {r.shard for r in df.select("shard").distinct().collect()}
    assert files == [f"shard-{s:06d}.tar" for s in sorted(shards)]
    with tarfile.open(tmp_path / files[0]) as tf:
        names = [ti.name for ti in tf.getmembers()]
    assert names == sorted(names), "entries must be in id order"


def test_byte_deterministic(spark, tmp_path):
    """Two runs over the same data produce bit-identical shards — the
    content-addressable-artifact claim in the module docstring."""
    df = assign_shards(_docs(spark), "doc_id", 3)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    write_tar_shards(df, str(d1), "doc_id", "payload",
                     meta_cols=("source",)).collect()
    write_tar_shards(df, str(d2), "doc_id", "payload",
                     meta_cols=("source",)).collect()
    for f in sorted(os.listdir(d1)):
        h1 = hashlib.md5((d1 / f).read_bytes()).hexdigest()
        h2 = hashlib.md5((d2 / f).read_bytes()).hexdigest()
        assert h1 == h2, f"{f} differs between identical runs"


def test_slash_in_id_raises(spark, tmp_path):
    df = assign_shards(
        spark.range(3).selectExpr(
            "concat('a/b', cast(id as string)) as doc_id",
            "encode('x', 'utf-8') as payload",
        ),
        "doc_id",
        2,
    )
    with pytest.raises(Exception, match="tar member name"):
        write_tar_shards(df, str(tmp_path), "doc_id", "payload").collect()


def test_empty_input(spark, tmp_path):
    df = assign_shards(_docs(spark).where("doc_id = 'nope'"), "doc_id", 2)
    manifest = write_tar_shards(
        df, str(tmp_path), "doc_id", "payload"
    ).collect()
    assert manifest == []
    assert os.listdir(tmp_path) == []


def test_invalid_n_shards(spark):
    with pytest.raises(ValueError, match="n_shards"):
        assign_shards(_docs(spark), "doc_id", 0)


def test_json_ext_rejected(spark, tmp_path):
    """ext='json' would make the reader file every payload under meta —
    rejected at write time instead of silently losing all rows."""
    df = assign_shards(_docs(spark), "doc_id", 2)
    with pytest.raises(ValueError, match="json"):
        write_tar_shards(df, str(tmp_path), "doc_id", "payload", ext="json")


def test_reader_skips_non_regular_members(spark, tmp_path):
    """Externally-produced WebDataset tars carry directory members; the
    reader must skip them, not crash on extractfile() returning None."""
    import io
    import tarfile

    path = tmp_path / "shard-000000.tar"
    with tarfile.open(path, "w") as tf:
        d = tarfile.TarInfo("samples")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ti = tarfile.TarInfo("doc1.bin")
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"abc"))
    rows = read_tar_shards(spark, str(tmp_path)).collect()
    assert [(r.doc_id, bytes(r.payload)) for r in rows] == [("doc1", b"abc")]


def test_no_temp_files_left_behind(spark, tmp_path):
    """Atomic-rename writing must leave only final shard files."""
    df = assign_shards(_docs(spark), "doc_id", 3)
    write_tar_shards(df, str(tmp_path), "doc_id", "payload").collect()
    assert all(f.endswith(".tar") for f in os.listdir(tmp_path))


def test_uri_scheme_rejected(spark):
    """The writer's executor-side os.* calls need a shared POSIX
    filesystem; an object-store URI would scatter shards across
    executor-local disks behind a clean-looking manifest."""
    import pytest

    from window_aggregation_spark.sources.tar_shards import write_tar_shards

    df = spark.createDataFrame(
        [(0, "a", bytearray(b"x"))], "shard int, doc_id string, payload binary"
    )
    with pytest.raises(ValueError, match="POSIX"):
        write_tar_shards(df, "s3://bucket/shards", "doc_id", "payload")

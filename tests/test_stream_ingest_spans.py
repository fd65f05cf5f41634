"""Streaming C4 span ingestion: the stream must equal the sequential
batch model — including a batch-2 doc losing a three-sentence run that
batch 0 ADMITTED (the hash fold), not just runs from the build-time
corpus — and replays must be bit-identical (overwrite-per-epoch sinks +
exclude_fold_epoch)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators import dedup as dd
from window_aggregation_spark.streaming.ingest_spans import (
    ingest_spans_batch,
    streaming_ingest_spans,
)

SHARED = "And more here. Also this one. Plus a final sentence."
NOVEL = "Batch zero coins this. Exactly three sentences long. Truly novel."


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, f"Corpus doc opens. {SHARED}"),
            (2, "Entirely corpus-only text lives here. Truly. Really. Yes."),
        ],
        "doc_id long, text string",
    )


def _parts(spark):
    return [
        # batch 0: one corpus-dup span (cut), one novel run (admitted)
        spark.createDataFrame(
            [
                (10, f"New doc leads in! {SHARED} New doc trails off."),
                (11, f"{NOVEL}"),
            ],
            "doc_id long, text string",
        ),
        # batch 1: repeats batch 0's ADMITTED novel run -> cut only if
        # the fold worked; plus fresh text
        spark.createDataFrame(
            [
                (20, f"Second wave starts now? {NOVEL}"),
                (21, "Nothing here repeats at all. Not once. Promise kept."),
            ],
            "doc_id long, text string",
        ),
        # batch 2: repeats batch 1's fresh text AND the corpus run
        spark.createDataFrame(
            [
                (30, "Nothing here repeats at all. Not once. Promise kept."),
                (31, f"{SHARED}"),
            ],
            "doc_id long, text string",
        ),
    ]


@pytest.fixture
def staged(spark, tmp_path):
    corpus = _corpus(spark)
    parts = _parts(spark)
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    for i, part in enumerate(parts):
        w = str(tmp_path / f"w{i}")
        part.coalesce(1).write.parquet(w)
        src = glob.glob(f"{w}/part-*.parquet")[0]
        dst = stream_dir / f"part-{i}.parquet"
        shutil.move(src, dst)
        mtime = time.time() - 300 + i * 10
        os.utime(dst, (mtime, mtime))
    store_path = str(tmp_path / "store")
    dd.build_sentence_hash_store(corpus, "doc_id", store_path)
    return corpus, parts, str(stream_dir), store_path


def _run_stream(spark, stream_dir, store_path, out_path, ckpt):
    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = streaming_ingest_spans(
        stream, "doc_id",
        store_path=store_path,
        out_path=out_path,
        checkpoint_dir=ckpt,
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_spans_equal_sequential_model(spark, tmp_path, staged):
    corpus, parts, stream_dir, store_path = staged

    # sequential model: every batch is cut against corpus + everything
    # admitted so far (text form — identical by construction to the
    # store + folds)
    accepted = corpus
    model: dict[int, dict[int, str]] = {}
    for i, part in enumerate(parts):
        clean = ingest_spans_batch(part, accepted, "doc_id")
        model[i] = {
            r.doc_id: r.clean_text for r in clean.collect()
        }
        accepted = accepted.unionByName(
            clean.withColumnRenamed("clean_text", "text")
        )

    # the cross-batch evidence the fold exists for: batch 1 loses the
    # run batch 0 ADMITTED (not a build-time corpus run), batch 2 loses
    # batch 1's fresh text and the corpus run
    assert model[0][11] == NOVEL
    assert model[1][20] == "Second wave starts now?"
    assert model[2][30] == ""
    assert model[2][31] == ""

    out_path = str(tmp_path / "clean")
    _run_stream(spark, stream_dir, store_path, out_path, str(tmp_path / "c1"))
    got: dict[int, dict[int, str]] = {}
    for r in spark.read.parquet(out_path).collect():
        got.setdefault(int(r["batch_id"]), {})[r["doc_id"]] = r["clean_text"]
    assert got == model

    # grown store == a rebuild over corpus + all admitted text
    grown = dd.load_sentence_hash_store(spark, store_path)
    rebuilt = dd.build_sentence_hash_store(
        accepted, "doc_id", str(tmp_path / "rb")
    )
    assert sorted(r["__h"] for r in grown.hashes.distinct().collect()) == \
        sorted(r["__h"] for r in rebuilt.hashes.collect())


def test_streaming_spans_replay_is_idempotent(spark, tmp_path, staged):
    """Same files replayed under a fresh checkpoint (same epoch ids, now
    with every epoch's fold already on disk) must reproduce identical
    outputs and an identical store — the exclude_fold_epoch +
    overwrite-per-epoch contract. Without the exclusion, doc 11's kept
    novel run would read as a corpus duplicate on replay and batch 0
    would overwrite its partition with an over-cut document."""
    corpus, parts, stream_dir, store_path = staged
    out_path = str(tmp_path / "clean")
    _run_stream(spark, stream_dir, store_path, out_path, str(tmp_path / "c1"))
    first = sorted(
        (int(r["batch_id"]), r["doc_id"], r["clean_text"])
        for r in spark.read.parquet(out_path).collect()
    )
    first_hashes = dd.load_sentence_hash_store(
        spark, store_path
    ).hashes.distinct().count()
    assert any(d == 11 and t == NOVEL for _, d, t in first)

    _run_stream(spark, stream_dir, store_path, out_path, str(tmp_path / "c2"))
    replay = sorted(
        (int(r["batch_id"]), r["doc_id"], r["clean_text"])
        for r in spark.read.parquet(out_path).collect()
    )
    replay_hashes = dd.load_sentence_hash_store(
        spark, store_path
    ).hashes.distinct().count()
    assert replay == first
    assert replay_hashes == first_hashes


def test_token_grain_store_is_rejected(spark, tmp_path):
    """The loop's cut/fold cycle is sentence-grain by construction; a
    token-grain store must be refused by the per-batch check the
    handler runs (not silently match nothing after the first
    rebuild)."""
    from window_aggregation_spark.streaming.ingest_spans import (
        _require_sentence_grain,
    )

    docs = spark.createDataFrame(
        [(1, "one two three " * 10)], "doc_id long, text string"
    )
    store_path = str(tmp_path / "tok")
    store = dd.build_sentence_hash_store(
        docs, "doc_id", store_path, grain="token", window=15
    )
    with pytest.raises(ValueError, match="sentence-grain"):
        _require_sentence_grain(store, store_path)

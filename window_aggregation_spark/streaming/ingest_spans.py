"""Streaming C4 span ingestion against a persisted span-hash store —
the sentence-grain serving loop of a training-data pipeline (round 12;
the near-dup twin is :mod:`.ingest_dedup`).

The C4 span rule is corpus-wide and FOREVER: every arriving batch must
cut the three-sentence runs it shares with everything already admitted,
and what survives the cut becomes part of what the next batch is checked
against. This module wires that loop out of the batch operators:

- the corpus's distinct window hashes live in a write-once
  :class:`..operators.dedup.SentenceHashStore`
  (``build_sentence_hash_store``) — ~8 bytes/window, so each batch plan
  touches ZERO corpus text bytes;
- each micro-batch runs
  :func:`..operators.dedup.sentence_spans_increment` (corpus windows
  cut everywhere, within-batch duplicates keep the first occurrence)
  and :func:`..operators.dedup.cut_sentence_spans`;
- the cleaned documents land under ``out_path/batch_id=N``
  (overwrite-per-batch — a replayed micro-batch is idempotent), and the
  ADMITTED text's window hashes fold back into the store
  (:func:`..operators.dedup.sentence_hash_store_add`, itself
  overwrite-per-epoch), which is what makes batch N+1 cut against
  batch N.

Replay safety needs BOTH overwrite-per-epoch sinks AND
``exclude_fold_epoch``: a batch retried after its fold would otherwise
find its own kept first-copies already in the store, read them as
corpus duplicates, and overwrite its output partition with over-cut
documents. Excluding exactly ``batch_id=N`` reconstructs the store
state the epoch saw the first time, making replay bit-identical.

The reference engine has no streaming surface; this is extension scope
(SURVEY §2.5), composing the span-dedup family with Structured
Streaming's ``foreachBatch`` exactly like ``streaming/upsert.py``
composes MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from window_aggregation_spark.operators.dedup import (
    SentenceHashStore,
    cut_sentence_spans,
    load_sentence_hash_store,
    sentence_hash_store_add,
    sentence_spans_increment,
)


def ingest_spans_batch(
    batch: DataFrame,
    corpus: "DataFrame | SentenceHashStore",
    id_col: str,
    text_col: str = "text",
    *,
    window: int = 3,
    alias: str = "clean_text",
) -> DataFrame:
    """One ingestion step as a plain batch transform (unit-testable, and
    exactly what the stream runs per micro-batch): apply the combined
    batch-ingest span policy against ``corpus`` (DataFrame or persisted
    store) and rebuild each document minus the cut spans. Returns
    ``(id_col, alias)`` — documents cut to empty stay as rows (the
    caller decides whether empty docs are dropped; the fold hashes
    nothing from them either way)."""
    spans = sentence_spans_increment(
        batch, corpus, id_col, text_col, window=window
    )
    return cut_sentence_spans(
        batch, spans, id_col, text_col, alias=alias
    ).select(id_col, alias)


def _require_sentence_grain(store: SentenceHashStore, store_path: str) -> None:
    """The loop's cut/fold cycle is sentence-grain by construction
    (cut_sentence_spans rebuilds from sentences); a token-grain store
    would silently match nothing after the first rebuild, so refuse."""
    if store.grain != "sentence":
        raise ValueError(
            f"streaming_ingest_spans needs a sentence-grain store; "
            f"{store_path} was built with grain={store.grain!r}"
        )


def streaming_ingest_spans(
    new_stream: DataFrame,
    id_col: str,
    *,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    alias: str = "clean_text",
    fold_hashes: bool = True,
):
    """Return a started-ready ``DataStreamWriter`` running the span
    ingestion loop: each micro-batch of ``new_stream`` is span-cut
    against the store at ``store_path`` (built ONCE with
    :func:`..operators.dedup.build_sentence_hash_store`; its persisted
    ``window``/``grain`` drive the loop — sentence grain required),
    cleaned documents land under ``out_path/batch_id=N`` (read the
    whole sink with ``spark.read.parquet(out_path)``), and with
    ``fold_hashes=True`` the admitted text's window hashes fold back so
    LATER batches cut against them too.

    The store is re-loaded per batch on purpose: the fold writes
    ``span_hash_folds/batch_id=N`` and a fresh load (excluding the
    CURRENT epoch — see :func:`..operators.dedup.
    load_sentence_hash_store` on replay) is what unions the earlier
    epochs in. Caller starts it:
    ``streaming_ingest_spans(...).start()``."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        store = load_sentence_hash_store(
            spark, store_path, exclude_fold_epoch=int(epoch_id)
        )
        _require_sentence_grain(store, store_path)
        clean = ingest_spans_batch(
            batch_df, store, id_col, text_col,
            window=store.window, alias=alias,
        ).localCheckpoint()  # computed once, consumed by two writes
        clean.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={int(epoch_id)}"
        )
        if fold_hashes:
            sentence_hash_store_add(
                clean.select(id_col, alias).withColumnRenamed(
                    alias, text_col
                ),
                id_col,
                store_path,
                text_col,
                batch_id=int(epoch_id),
                reload=False,  # next epoch reloads with its own exclusion
            )

    return (
        new_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )

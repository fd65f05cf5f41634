"""Streaming upsert (CDC-style MERGE) into parquet via ``foreachBatch``.

Without a transactional table format (Delta/Iceberg are not on this
classpath), MERGE INTO is emulated per micro-batch: keep the latest record
per key within the batch, anti-join the existing snapshot against the
batch's keys, union, and atomically publish the new snapshot. This is the
classic exactly-once-ish sink recipe for file-based targets; swapping in
``MERGE INTO`` when a lakehouse format is available changes only
``_merge_batch``.

Snapshot publication is a *pointer flip*, not a directory rename pair: each
merged snapshot is written to an immutable ``<target>.v<NNNNNN>`` directory
and ``<target>`` itself is a symlink replaced with ``os.replace`` (atomic
``rename(2)``). Concurrent readers therefore always resolve a complete
snapshot — there is no instant at which ``<target>`` is missing — and a
crash mid-publish leaves the previous pointer intact (the orphaned ``.v``
directory is garbage-collected on the next successful publish). The
immediately superseded version is retained one extra epoch for readers that
resolved the pointer just before the flip.

Scale notes: the anti-join shuffles on the key — at large snapshots,
partition the snapshot by key-hash directory and rewrite only affected
partitions (the structure below isolates that in ``_merge_batch``).
Deduplication-within-batch uses the same deterministic
row_number-over-version pattern as ``operators.dedup.exact_dedup``.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """Keep the newest row per key (ties broken deterministically by the
    version column descending — the CDC 'last write wins' rule)."""
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _version_dirs(target: str) -> list[str]:
    """Existing ``<target>.vNNNNNN`` snapshot directories, oldest first."""
    return sorted(
        d for d in glob.glob(target + ".v*")
        if os.path.isdir(d) and d[len(target) + 2:].isdigit()
    )


def _merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    target: str,
    keys: list[str],
    version_col: str,
) -> None:
    incoming = latest_per_key(batch, keys, version_col)

    versions = _version_dirs(target)
    if os.path.lexists(target) and not os.path.islink(target):
        # legacy plain-directory snapshot: adopt it as version 0 so the
        # pointer flip below stays atomic from here on.
        legacy = f"{target}.v{0:06d}"
        os.rename(target, legacy)
        os.symlink(os.path.basename(legacy), target)
        versions = _version_dirs(target)

    current = os.path.realpath(target) if os.path.lexists(target) else None
    if current is not None and os.path.isdir(current):
        existing = spark.read.parquet(current)
        kept = existing.join(incoming.select(*keys), on=keys, how="left_anti")
        merged = kept.unionByName(incoming)
    else:
        merged = incoming

    next_n = (
        max(int(d[len(target) + 2:]) for d in versions) + 1 if versions else 0
    )
    new_dir = f"{target}.v{next_n:06d}"
    merged.write.mode("overwrite").parquet(new_dir)

    # Atomic pointer flip: build the new symlink aside, then rename(2) it
    # over <target>. Readers see the old snapshot or the new one, never a gap.
    tmp_link = f"{new_dir}.lnk"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(os.path.basename(new_dir), tmp_link)
    os.replace(tmp_link, target)

    # GC: keep the new version plus the one just superseded (for readers
    # that resolved the pointer pre-flip); drop anything older, and any
    # orphan left by a crash between write and flip.
    keep = {new_dir, current}
    for d in _version_dirs(target):
        if d not in keep:
            shutil.rmtree(d, ignore_errors=True)


def stream_upsert_parquet(
    stream: DataFrame,
    target: str,
    *,
    keys: list[str],
    version_col: str,
    checkpoint: str,
):
    """Start a streaming query that upserts each micro-batch into the
    parquet snapshot at ``target``. Returns the StreamingQuery."""
    spark = stream.sparkSession

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _merge_batch(spark, batch_df, target, keys, version_col)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )

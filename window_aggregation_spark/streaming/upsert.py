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


def _flip_pointer(version_dir: str, target: str) -> None:
    """Atomically point the ``target`` symlink at ``version_dir``: build the
    new link aside, then ``rename(2)`` it over ``target``. Readers see the
    old snapshot or the new one, never a gap."""
    tmp_link = f"{version_dir}.lnk"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(os.path.basename(version_dir), tmp_link)
    os.replace(tmp_link, target)


def _newest_complete(versions: list[str]) -> str:
    """Newest snapshot that finished writing (has Spark's ``_SUCCESS``
    marker); falls back to the newest directory for snapshots produced
    outside Spark (no marker)."""
    for d in reversed(versions):
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            return d
    return versions[-1]


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
        # Legacy plain-directory snapshot: adopt it as the NEXT version
        # number (an orphaned .v dir from an earlier crash must not collide
        # with the rename) so the pointer flip below stays atomic from here
        # on. The flip itself is atomic, so a crash between the rename and
        # the flip is healed by the recovery branch below on the next batch.
        n = max((int(d[len(target) + 2:]) for d in versions), default=-1) + 1
        legacy = f"{target}.v{n:06d}"
        os.rename(target, legacy)
        _flip_pointer(legacy, target)
        versions = _version_dirs(target)
    elif not os.path.lexists(target) and versions:
        # Crash recovery: a previous run died after writing a version (or
        # renaming the legacy dir) but before the pointer flip. Re-point at
        # the newest COMPLETE snapshot instead of silently merging against
        # nothing — which would drop the existing snapshot and then GC it.
        _flip_pointer(_newest_complete(versions), target)

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

    _flip_pointer(new_dir, target)

    # GC: keep the new version plus the one just superseded (for readers
    # that resolved the pointer pre-flip); drop anything older, and any
    # orphan left by a crash between write and flip. Compare realpaths:
    # `current` is already symlink-resolved and absolute, while
    # _version_dirs returns paths in `target`'s form (possibly relative) —
    # comparing raw strings would never match and GC the just-superseded
    # snapshot immediately.
    keep = {os.path.realpath(new_dir)}
    if current is not None:
        keep.add(current)  # realpath already
    for d in _version_dirs(target):
        if os.path.realpath(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)


MergeFn = "Callable[[SparkSession, DataFrame, str, list[str], str], None]"


def stream_upsert_parquet(
    stream: DataFrame,
    target: str,
    *,
    keys: list[str],
    version_col: str,
    checkpoint: str,
    merge_fn=None,
):
    """Start a streaming query that upserts each micro-batch into the
    snapshot at ``target``. Returns the StreamingQuery.

    ``merge_fn(spark, batch, target, keys, version_col)`` is the lakehouse
    seam: it defaults to the symlink-flip parquet merge (:func:`_merge_batch`)
    and is the ONLY thing that changes when a transactional table format is
    on the classpath — e.g. a Delta callback running ``MERGE INTO <target>
    USING <batch> ON <keys> WHEN MATCHED AND s.version > t.version THEN
    UPDATE SET * WHEN NOT MATCHED THEN INSERT *``. The deduplicated batch
    (``latest_per_key``), checkpointing, and empty-batch skip are shared.
    """
    spark = stream.sparkSession
    merge = merge_fn if merge_fn is not None else _merge_batch

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge(spark, batch_df, target, keys, version_col)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )

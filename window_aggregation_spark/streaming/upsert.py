"""Streaming upsert (CDC-style MERGE) into parquet via ``foreachBatch``.

Without a transactional table format (Delta/Iceberg are not on this
classpath), MERGE INTO is emulated per micro-batch: keep the latest record
per key within the batch, anti-join the existing snapshot against the
batch's keys, union, and atomically swap the snapshot directory. This is the
classic exactly-once-ish sink recipe for file-based targets; swapping in
``MERGE INTO`` when a lakehouse format is available changes only
``_merge_batch``.

Scale notes: the anti-join shuffles on the key — at large snapshots,
partition the snapshot by key-hash directory and rewrite only affected
partitions (the structure below isolates that in ``_merge_batch``).
Deduplication-within-batch uses the same deterministic
row_number-over-version pattern as ``operators.dedup.exact_dedup``.
"""

from __future__ import annotations

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


def _merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    target: str,
    keys: list[str],
    version_col: str,
) -> None:
    incoming = latest_per_key(batch, keys, version_col)
    tmp = target + ".tmp"
    if os.path.exists(target):
        existing = spark.read.parquet(target)
        kept = existing.join(incoming.select(*keys), on=keys, how="left_anti")
        merged = kept.unionByName(incoming)
    else:
        merged = incoming
    merged.write.mode("overwrite").parquet(tmp)
    final_swap = target + ".old"
    if os.path.exists(target):
        os.rename(target, final_swap)
    os.rename(tmp, target)
    shutil.rmtree(final_swap, ignore_errors=True)


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

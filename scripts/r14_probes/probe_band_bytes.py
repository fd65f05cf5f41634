"""Shuffle-bytes probe for the r14 band-column drop (VERDICT r13 #3).

Interleaved A/B in ONE session (host-independent metric: shuffle bytes
via the UI REST API), SMJ regime (autoBroadcastJoinThreshold=-1) so the
banded exchange is a real shuffle like at corpus scale. The signature
pass is checkpointed once so both arms measure ONLY banding->buckets->
candidate pairs->distinct.
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from window_aggregation_spark.operators import dedup as dd

SF_DIR = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[16]")
    .appName("band-bytes-probe")
    .config("spark.ui.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId


def stages():
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        return json.load(r)


def shuffle_totals():
    rows = stages()
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in rows),
        sum(s.get("shuffleWriteRecords", 0) for s in rows),
        len(rows),
    )


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
    "doc_id", "text"
)
sigs = dd.minhash_signatures(docs, "doc_id", "text").localCheckpoint()


def band_keys_old(sigs_df, id_col, *, num_hashes, bands):
    rows = num_hashes // bands
    return sigs_df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b),
                            *[F.col(f"m{b * rows + j}") for j in range(rows)],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.band", "bk.key")


def candidates_from(banded, group_cols):
    buckets = banded.groupBy(*group_cols).agg(
        F.collect_list("__id").alias("__ids")
    )
    buckets = buckets.where(F.size("__ids") <= 10_000)
    return (
        buckets.where(F.size("__ids") >= 2)
        .select(F.explode("__ids").alias("id_a"), F.col("__ids"))
        .select("id_a", F.explode("__ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def build_new():
    banded = dd._band_keys(sigs, "doc_id", num_hashes=64, bands=16)
    return candidates_from(banded, ["key"])


def build_old():
    banded = band_keys_old(sigs, "doc_id", num_hashes=64, bands=16)
    return candidates_from(banded, ["band", "key"])


def run(build):
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# warm both arms once (uncounted)
run(build_old)
run(build_new)

results = {"old": [], "new": []}
bytes_per = {"old": [], "new": []}
recs_per = {"old": [], "new": []}
for rep in range(4):
    for arm, build in (("old", build_old), ("new", build_new)):
        b0, r0, _ = shuffle_totals()
        dt = run(build)
        b1, r1, _ = shuffle_totals()
        results[arm].append(round(dt, 3))
        bytes_per[arm].append(b1 - b0)
        recs_per[arm].append(r1 - r0)

# row counts must match (candidates identical)
n_old = build_old().count()
n_new = build_new().count()

out = {
    "sec": results,
    "shuffle_bytes": bytes_per,
    "shuffle_records": recs_per,
    "candidates_old": n_old,
    "candidates_new": n_new,
}
print(json.dumps(out, indent=1))
spark.stop()

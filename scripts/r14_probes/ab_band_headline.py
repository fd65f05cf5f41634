import statistics as st
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from window_aggregation_spark.session import get_spark

spark = get_spark("ab-band-headline")
spark.sparkContext.setLogLevel("ERROR")

from window_aggregation_spark.operators import dedup as dd
from window_aggregation_spark.suite import SUITE

SF = "/root/testdata/sf0.1"


def band_keys_r13(sigs, id_col, *, num_hashes, bands):
    rows = num_hashes // bands
    return sigs.select(
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


def candidate_pairs_r13(
    df, id_col, text_col="text", *, ngram=3, num_hashes=64, bands=16,
    max_bucket_size=10_000, signatures=None,
):
    if signatures is None:
        sigs = dd.minhash_signatures(
            df, id_col, text_col, ngram=ngram, num_hashes=num_hashes
        )
    elif isinstance(signatures, dd.SignatureStore):
        signatures.check(ngram=ngram, num_hashes=num_hashes)
        sigs = signatures.sigs
    else:
        sigs = signatures
    banded = band_keys_r13(sigs, id_col, num_hashes=num_hashes, bands=bands)
    buckets = banded.groupBy("band", "key").agg(
        F.collect_list("__id").alias("__ids")
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("__ids") <= max_bucket_size)
    return (
        buckets.where(F.size("__ids") >= 2)
        .select(F.explode("__ids").alias("id_a"), F.col("__ids"))
        .select("id_a", F.explode("__ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


cand_new = dd.minhash_candidate_pairs


def run(name):
    t0 = time.perf_counter()
    SUITE[name].build(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


for n in ("dedup_minhash_lsh", "dedup_minhash_cc"):
    run(n)  # warm
for name in ("dedup_minhash_lsh", "dedup_minhash_cc"):
    res = {"r13": [], "r14": []}
    for rep in range(5):
        for arm in ("r13", "r14"):
            dd.minhash_candidate_pairs = (
                candidate_pairs_r13 if arm == "r13" else cand_new
            )
            res[arm].append(run(name))
    dd.minhash_candidate_pairs = cand_new
    for arm, ts in res.items():
        print(f"{name:18s} {arm}: median {st.median(ts):.3f} "
              f"min {min(ts):.3f}  {ts}")
spark.stop()

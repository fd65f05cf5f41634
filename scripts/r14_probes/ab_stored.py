"""Isolate-retime the two r13 'regressed' stored twins (VERDICT r13 #4),
interleaved in ONE session per the repo's measurement discipline.

A/B 1 — dedup_minhash_lsh_stored: r13 banding (band column + groupBy
(band, key)) vs r14 banding (band folded into the key seed only).
A/B 2 — dedup_sentence_spans_stored: r12 window builder (select
extraction + pushed size() filter = double extraction) vs the current
when-guard + length prefilter shape, on the stored SERVING path —
the r13 suspicion was that the prefilter costs the serving side.
"""
import statistics as st
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from window_aggregation_spark.session import get_spark

spark = get_spark("ab-stored")
spark.sparkContext.setLogLevel("ERROR")

from window_aggregation_spark.operators import dedup as dd
from window_aggregation_spark.suite import SUITE

SF = "/root/testdata/sf0.1"


def run(name):
    t0 = time.perf_counter()
    SUITE[name].build(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


# ---- old (r13) banding -----------------------------------------------
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


# ---- old (r12) sentence windows --------------------------------------
def sentence_windows_r12(df, id_col, text_col, window):
    from window_aggregation_spark.operators.text import sentence_array

    base = df.select(
        F.col(id_col), sentence_array(text_col).alias("__sents")
    ).where(F.size("__sents") >= window)
    return base.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.size("__sents") - F.lit(window))
        ).alias("__pos"),
        F.col("__sents"),
    ).select(
        id_col,
        "__pos",
        dd.portable_hash64(
            F.concat_ws(" ", F.slice("__sents", F.col("__pos") + 1, window))
        ).alias("__h"),
    )


cand_new, sw_new = dd.minhash_candidate_pairs, dd._sentence_windows

# warm (stores + JIT), uncounted
run("dedup_minhash_lsh_stored")
run("dedup_sentence_spans_stored")

res1 = {"r13": [], "r14": []}
for rep in range(6):
    for arm in ("r13", "r14"):
        dd.minhash_candidate_pairs = (
            candidate_pairs_r13 if arm == "r13" else cand_new
        )
        res1[arm].append(run("dedup_minhash_lsh_stored"))
dd.minhash_candidate_pairs = cand_new

res2 = {"r12": [], "r14": []}
for rep in range(6):
    for arm in ("r12", "r14"):
        dd._sentence_windows = sentence_windows_r12 if arm == "r12" else sw_new
        res2[arm].append(run("dedup_sentence_spans_stored"))
dd._sentence_windows = sw_new

for tag, res in (("lsh_stored banding", res1), ("sent_spans_stored windows", res2)):
    for arm, times in res.items():
        print(f"{tag:28s} {arm}: median {st.median(times):.3f} "
              f"min {min(times):.3f}  {times}")
spark.stop()

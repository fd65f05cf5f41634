"""Scratch profiler for the language-gated Gopher filter (r13 perf pass).

Times the components of pipeline_gopher_filter at sf0.1 so optimization
targets the measured hot spot instead of a guess. Not part of the suite.
"""
import time

from pyspark.sql import SparkSession, functions as F

from window_aggregation_spark.operators import text as tx
from window_aggregation_spark.sources.io import read_table

SF_DIR = "/root/testdata/sf0.1"


def t(label, df):
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:45s} {best:7.3f}s")


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    _gq_rules = {"min_stopword_hits": 1, "min_words": 30}

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    t("scan only", docs)

    t("plain gopher filter (english rules)",
      docs.where(tx.gopher_quality_pass("text", rules=_gq_rules)))

    t("detector projection (unbound)",
      docs.select("doc_id", tx.language_pred("text").alias("lang")))

    t("gated filter (bound lambda, current)",
      docs.where(tx.gopher_quality_pass_by_language(
          "text", rules=_gq_rules, und_policy="structural")))

    # gate with lang precomputed+materialized via localCheckpoint:
    # detector paid once codegen'd, gopher trees outside any lambda
    chk = docs.select(
        "doc_id", "text", tx.language_pred("text").alias("lang")
    ).localCheckpoint(eager=False)
    t("checkpointed lang + gated on lang_col",
      chk.where(tx.gopher_quality_pass_by_language(
          "text", rules=_gq_rules, lang_col="lang",
          und_policy="structural")).select("doc_id", "text"))

    rep_cfg = {"top_frac_max": 0.035, "dup_frac_max": 0.02}
    clean = docs.where(tx.gopher_quality_pass_by_language(
        "text", rules=_gq_rules, und_policy="structural"))
    rep = tx.repetition_signals(clean, **rep_cfg)
    t("full pipeline (gated + repetition)",
      rep.where(~F.col("repetitive")).select(
          "doc_id", "n_tokens", "top_ngram_frac", "dup_ngram_frac"))

    spark.stop()


if __name__ == "__main__":
    main()

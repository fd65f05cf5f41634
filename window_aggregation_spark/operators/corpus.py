"""Corpus-preparation operators for training-data pipelines: deterministic
splits, token-budget shard packing, PII redaction.

Extension scope (SURVEY §2.5) — the reference engine stops at windowed
aggregation; these are the surrounding operations a 100 TB pretraining
corpus pipeline needs between dedup and the trainer:

- :func:`split_by_hash` — train/val/test assignment that is a pure
  projection (no shuffle, no sampling state): a portable 60-bit md5 hash
  of the id modulo a grain, cut at cumulative weight thresholds. The same
  row lands in the same split on any engine, any run, any cluster size —
  which is the property that matters for reproducible eval holdouts
  (``sample()`` is seed-and-partitioning dependent; this is not).
- :func:`pack_by_token_budget` — assign documents to fixed-token-budget
  training shards by their exclusive prefix sum of token counts in a
  global deterministic order. The global cumulative sum is the classic
  single-task trap (one ``Window.orderBy`` with no partition key
  serializes the whole corpus through one core); this reuses the
  two-phase chunked decomposition of :mod:`.skew` (local sums per
  order-range chunk + tiny broadcast offsets), so no task ever owns more
  than ~1/chunks of the corpus.
- :func:`redact_pii` — email / IPv4 / phone masking as three nested
  ``regexp_replace`` calls: pure whole-stage-codegen projection, no
  Python in the path. Patterns are deliberately restricted to the regex
  dialect intersection (no lookaround, no backreferences) so the exact
  same patterns run on Java regex (Spark) and RE2 (DuckDB/BigQuery) —
  pinned cross-engine by the ``corpus_redact_pii`` suite oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from window_aggregation_spark.operators.dedup import (
    portable_hash64,
    portable_hash64_duck,
)
from window_aggregation_spark.operators.skew import salted_running_agg

# Hash grain for split thresholds: weights are quantized to 1/1_000_000,
# plenty for any realistic split ratio and small enough that the 60-bit
# hash is uniform across residues.
SPLIT_GRAIN = 1_000_000


def _split_cuts(splits: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper residue bound) per split, in insertion order;
    the last split absorbs rounding residue so bounds always cover the
    grain."""
    total = sum(splits.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    names = list(splits)
    cuts: list[tuple[str, int]] = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cuts.append((name, int(round(acc / total * SPLIT_GRAIN))))
    cuts.append((names[-1], SPLIT_GRAIN))
    return cuts


def split_by_hash(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    *,
    alias: str = "split",
) -> DataFrame:
    """Append ``alias`` = deterministic split name per row.

    The residue ``portable_hash64(id) % SPLIT_GRAIN`` is compared against
    cumulative weight thresholds (insertion order of ``splits``). Pure
    codegen projection — no shuffle, no RNG, no driver state — and the
    portable hash makes the assignment reproducible in any SQL engine
    (see :func:`split_by_hash_oracle_expr`).
    """
    residue = F.pmod(
        portable_hash64(F.col(id_col).cast("string")), F.lit(SPLIT_GRAIN)
    )
    expr = None
    for name, bound in _split_cuts(splits):
        cond = residue < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(alias, expr)


def split_by_hash_oracle_expr(id_expr: str, splits: dict[str, float]) -> str:
    """DuckDB CASE expression mirroring :func:`split_by_hash` bit-for-bit."""
    residue = (
        f"(({portable_hash64_duck(f'CAST({id_expr} AS VARCHAR)')}) % {SPLIT_GRAIN}"
        f" + {SPLIT_GRAIN}) % {SPLIT_GRAIN}"
    )
    arms = " ".join(
        f"WHEN {residue} < {bound} THEN '{name}'"
        for name, bound in _split_cuts(splits)
    )
    return f"CASE {arms} END"


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    *,
    chunks: int = 32,
    alias: str = "shard",
) -> DataFrame:
    """Append ``alias`` = training-shard id such that documents fill shards
    of ~``budget`` tokens in ``id_col`` order.

    A document starting at exclusive prefix offset ``p`` lands in shard
    ``floor(p / budget)`` — contiguous greedy fill where a shard overflows
    by at most its final document (the standard sequence-packing shape; an
    exact bin pack is NP-hard and order-destroying). ``id_col`` must be
    unique (it is the deterministic global order) and ``tokens_col``
    non-negative integers.

    Scale: the global running sum uses the two-phase chunked decomposition
    (:func:`.skew.salted_running_agg` with no partition key) — local
    windows per order-range chunk plus a broadcast of ``chunks`` offset
    rows — instead of a single-task global window. Token counts are
    integral longs, so the chunked sum is bit-equal to the plain window.
    """
    run = salted_running_agg(
        df,
        [],
        id_col,
        tokens_col,
        agg="sum",
        chunks=chunks,
        alias="__run_tok",
    )
    exclusive = F.col("__run_tok") - F.col(tokens_col)
    return run.withColumn(
        alias, F.floor(exclusive / F.lit(budget)).cast("long")
    ).drop("__run_tok")


# Regex dialect intersection (Java regex AND RE2): character classes,
# bounded repetition, \b word boundaries — no lookaround, no backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # local@domain.tld — conservative on purpose: over-matching text is
    # worse than missing an exotic address when scrubbing a corpus.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # dotted quad. Known over-match: the tail of a 5+-segment version
    # string ("v1.2.3.4.5" -> "v1.<IP>") — excluding it needs lookbehind,
    # which RE2 lacks, and cross-engine identical behavior wins here.
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international-ish phone: leading + optional, 9+ digits with
    # space/hyphen separators, digit terminated (so it never eats a
    # trailing period). Dots are NOT separators — IPv4 stays disjoint.
    ("phone", r"\+?\d[\d \-]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Mask emails, IPv4 addresses, and phone numbers in ``text``.

    Three nested ``regexp_replace`` calls, applied in :data:`PII_PATTERNS`
    order (email before phone, so a phone-looking local part is already
    collapsed). Whole-stage codegen; ~one pass per pattern."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def redact_pii_oracle_expr(text_expr: str) -> str:
    """DuckDB rendering of :func:`redact_pii` — same patterns, same order;
    RE2 needs the explicit ``'g'`` flag to replace all occurrences."""
    out = text_expr
    for _, pattern, repl in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{repl}', 'g')"
    return out

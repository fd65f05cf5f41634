"""Bloom-filter join reduction — cut the BIG side of a big/small join
*before* its shuffle.

The 100 TB problem this solves: joining a 100 TB fact table against a
filtered dimension whose matching keys are a small fraction of the fact
rows. A plain shuffle join exchanges the entire fact table; a broadcast
of the dimension's exact key set only works while the keys fit in
memory. The bloom path sits between: build a compact bit-array summary
of the build side's keys (one map-side-combined aggregation whose output
is ``m/64`` longs, independent of build-side row count), ship it to
every probe task as a one-row broadcast, and drop non-matching fact rows
at the SCAN, so the subsequent exact join only shuffles survivors. False
positives cost nothing but wasted shuffle bytes — the exact join that
follows removes them — so the operator's RESULT is bit-identical to the
plain join (which is what the suite oracle checks).

Spark's own runtime row-level bloom filtering
(``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``) does this
inside one query when statistics cooperate; this operator makes the
reduction explicit, reusable across queries (build once, probe many),
and independent of the optimizer's cost estimates. Spark 4.1 does not
expose ``bloom_filter_agg``/``might_contain`` as public SQL routines, so
the filter is composed from public builtins: two ``xxhash64`` seeds give
k = ``n_hashes`` Kirsch–Mitzenmacher double-hashed bit positions
(``pos_i = (h1 + i·h2) mod m``, everything reduced mod m first to stay
inside ANSI long arithmetic); the build aggregates ``bit_or`` per 64-bit
word; the probe is a pure whole-stage-codegen AND of k bit tests against
a broadcast ``array<long>``.

Sizing is the textbook formula: m = ceil(-n·ln p / ln²2) bits,
k = round((m/n)·ln 2). The filter is collected to the driver (bounded:
``max_filter_bytes`` guard, default 16 MiB ≈ 134 M bits ≈ 14 M keys at
1 % fpp) and re-broadcast as one row — same bounded-artifact pattern as
the IVF codebook (`similarity.py`). Over-budget raises with the numbers
instead of OOMing, mirroring ``embedding_dup_pairs``'s broadcast guard.

Reference parity: the reference engine (window-aggregation plugin) has
no join stage at all — this module is part of the training-data-pipeline
extension surface, not SURVEY §2 parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    """A built bloom filter: ``n_bits`` (multiple of 64), ``n_hashes``,
    and the ``n_bits/64`` little-endian words. Plain data — safe to keep,
    reuse across queries, or persist next to the dataset it summarizes."""

    n_bits: int
    n_hashes: int
    words: list[int]

    @property
    def n_bytes(self) -> int:
        return self.n_bits // 8


def bloom_parameters(expected_items: int, fpp: float) -> tuple[int, int]:
    """(n_bits rounded up to a 64 multiple, n_hashes) for a target fpp."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of the key; h2 forced odd so the
    double-hash stride never collapses to a single probe sequence."""
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(key, F.lit(1)).bitwiseOR(F.lit(1).cast("long"))
    return h1, h2


def _positions(h1: Column, h2: Column, n_bits: int, n_hashes: int) -> Column:
    """array<long> of the k bit positions. Operands are reduced mod m
    BEFORE the multiply-add: i ≤ k and pmod(·, m) < m keep every
    intermediate well under 2^63 (ANSI mode rejects silent overflow)."""
    m = F.lit(n_bits).cast("long")
    r1, r2 = F.pmod(h1, m), F.pmod(h2, m)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(r1 + i.cast("long") * r2, m),
    )


def build_bloom_filter(
    df: DataFrame,
    key_col: str,
    *,
    expected_items: int,
    fpp: float = 0.01,
    max_filter_bytes: int = 16 * 1024 * 1024,
) -> BloomFilter:
    """Aggregate ``df[key_col]`` into a :class:`BloomFilter`.

    One pass over the build side: explode each key's k positions to
    ``(word, bit)`` and ``bit_or`` per word. Partial aggregation combines
    map-side, so the exchange carries at most ``m/64`` rows per task —
    the shuffle is sized by the FILTER, not by the build-side row count.
    Duplicate keys are harmless (OR is idempotent), so no ``distinct``
    pre-shuffle is needed.
    """
    n_bits, n_hashes = bloom_parameters(expected_items, fpp)
    if n_bits // 8 > max_filter_bytes:
        raise ValueError(
            f"bloom filter for expected_items={expected_items} at fpp={fpp} "
            f"needs {n_bits // 8} bytes > max_filter_bytes={max_filter_bytes}; "
            "raise the budget, accept a higher fpp, or pre-reduce the build side"
        )
    h1, h2 = _hash_cols(F.col(key_col))
    rows = (
        df.select(F.explode(_positions(h1, h2, n_bits, n_hashes)).alias("p"))
        .select(
            F.shiftright("p", 6).alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return BloomFilter(n_bits=n_bits, n_hashes=n_hashes, words=words)


def bloom_prefilter(
    big: DataFrame,
    bf: BloomFilter,
    key_col: str,
) -> DataFrame:
    """Keep only ``big`` rows whose key might be in ``bf``.

    The filter ships as a ONE-ROW broadcast (``array<long>``) rather than
    a literal array expression: a 1 MiB literal would bloat the plan tree
    and codegen source, while a broadcast row is a single block every
    executor fetches once. The cross join is a BroadcastNestedLoopJoin of
    one row — a per-task array pointer, not a join in any real sense.

    The probe column's TYPE must match what the filter was built from:
    ``xxhash64`` hashes the binary representation, so ``"5"`` and ``5L``
    never collide even though an equi-join would coerce them
    (:func:`bloom_join` checks this; direct callers own it).
    """
    spark = big.sparkSession
    reserved = {"__bloom", *(f"__pos{i}" for i in range(bf.n_hashes))}
    clash = reserved & set(big.columns)
    if clash:
        raise ValueError(
            f"probe side already has reserved column(s) {sorted(clash)}; "
            "rename before bloom_prefilter"
        )
    bfdf = spark.createDataFrame([(bf.words,)], "__bloom array<long>")
    h1, h2 = _hash_cols(F.col(key_col))
    m = F.lit(bf.n_bits).cast("long")
    r1, r2 = F.pmod(h1, m), F.pmod(h2, m)
    # Each of the k tests carries its position twice (word index + bit
    # mask); the shift amount must be a Column, which only the SQL-door
    # shiftleft accepts, hence the materialized __pos{i} columns.
    out = big.crossJoin(F.broadcast(bfdf))
    tests = []
    for i in range(bf.n_hashes):
        pos = F.pmod(r1 + F.lit(i).cast("long") * r2, m)
        out = out.withColumn(f"__pos{i}", pos)
        word = F.element_at(
            F.col("__bloom"), F.shiftright(F.col(f"__pos{i}"), 6).cast("int") + F.lit(1)
        )
        bit = F.expr(f"shiftleft(1L, cast(pmod(__pos{i}, 64) as int))")
        tests.append(word.bitwiseAND(bit) != F.lit(0).cast("long"))
    keep = tests[0]
    for t in tests[1:]:
        keep = keep & t
    return (
        out.where(keep)
        .drop("__bloom", *[f"__pos{i}" for i in range(bf.n_hashes)])
    )


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    how: str = "inner",
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_filter_bytes: int = 16 * 1024 * 1024,
) -> DataFrame:
    """Join ``big ⋈ small`` on ``on`` with a bloom pre-filter on ``big``.

    ``how`` ∈ {"inner", "left_semi"} — the joins whose result a probe-side
    pre-filter cannot change (every dropped row has no match, up to bloom
    false positives which the exact join then removes). Outer joins need
    the dropped rows and are deliberately rejected.

    ``expected_items`` defaults to a count of the build side — an extra
    job, so pass the estimate when you have one (e.g. from table stats).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_join supports inner/left_semi, got {how!r}")
    bt, st = big.schema[on].dataType, small.schema[on].dataType
    if bt != st:
        # an equi-join would coerce ("5" = 5L matches), but xxhash64
        # hashes the binary representation — a coerced match would be
        # silently DROPPED by the pre-filter. Make the caller cast.
        raise ValueError(
            f"join key {on!r} has different types on the two sides "
            f"({bt.simpleString()} vs {st.simpleString()}); cast to a "
            "common type before bloom_join — the hash pre-filter cannot "
            "reproduce SQL's implicit coercion"
        )
    n = expected_items if expected_items is not None else small.count()
    bf = build_bloom_filter(
        small,
        on,
        expected_items=max(1, n),
        fpp=fpp,
        max_filter_bytes=max_filter_bytes,
    )
    filtered = bloom_prefilter(big, bf, on)
    return filtered.join(small, on=on, how=how)

"""Fuzzy (edit-distance) join — record linkage over short string keys.

The 100 TB problem: link two tables on keys that almost match (names,
titles, product codes with typos). The definition is "every pair within
Levenshtein distance d", but an all-pairs comparison is O(|L|·|R|)
string alignments — infeasible past toy sizes, and a length-band or
prefix block is INCOMPLETE (a typo in the prefix silently loses the
match). This module uses the symmetric-deletion blocking of the
SymSpell/FastSS family, which is both complete and shuffle-shaped:

  If levenshtein(a, b) ≤ d, then deleting ≤ d characters from each can
  produce a common string. So generate every ≤ d-deletion variant of
  each key (an array expression — O(len^d) variants, all codegen),
  equi-join on the variant, and verify surviving candidates with one
  exact ``levenshtein(a, b, d)`` call (early-terminating threshold
  form). No candidate within distance d can be missed — the suite
  oracle is the brute-force SQL definition, so an incomplete blocking
  would hash-mismatch, not just slow down.

Scale shape:
- Variant generation and verification run on DISTINCT key strings, not
  rows: duplicate keys (ubiquitous in linkage workloads) cost one
  verification regardless of multiplicity; payload columns re-attach by
  two hash joins on the original key at the end.
- The candidate equi-join shuffles on the variant string — bounded by
  (distinct keys) × (variants per key), linear in total key bytes for
  fixed d. Nothing is ever all-pairs.
- Everything is builtin expressions (``transform``/``flatten``/
  ``array_distinct``/``levenshtein``) — whole-stage codegen, no Python.
- Keys are short by contract: variants per key are len+1 at d=1 and
  ~len²/2 at d=2, so ``max_key_length`` (default 128) is enforced with
  an in-plan ``raise_error`` — a mistyped join on a document-text
  column fails loudly instead of exploding the shuffle. Document-scale
  near-dup belongs to the minhash/simhash operators.

Reference parity: none — the reference engine has no join stage; this
is training-pipeline extension surface (entity resolution / benchmark-
key linkage ahead of decontamination).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column, max_deletes: int) -> Column:
    """array<string> of every string reachable from ``col`` by deleting
    at most ``max_deletes`` single characters (the original included),
    deduplicated. Pure builtin expressions.

    ``F.sequence(1, length)`` with length 0 would yield a DESCENDING
    [1, 0] (Spark quirk), so the empty string is guarded to produce no
    deletion positions.
    """
    if max_deletes < 0:
        raise ValueError("max_deletes must be >= 0")
    if max_deletes > 2:
        # len^3 variants per key: the blocking that was supposed to
        # bound the shuffle becomes the explosion.
        raise ValueError(
            "max_deletes > 2 is unsupported: variant count is "
            "O(len^max_deletes) per key; use minhash/simhash for loose "
            "similarity"
        )

    def _delete_each(s: Column) -> Column:
        # one variant per position i: s without its i-th character
        return F.when(F.length(s) > 0, F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - F.lit(1)),
                F.substring(s, i + F.lit(1), F.length(s)),
            ),
        )).otherwise(F.array().cast("array<string>"))

    out = F.array(col)
    frontier = F.array(col)
    for _ in range(max_deletes):
        frontier = F.flatten(F.transform(frontier, _delete_each))
        out = F.concat(out, frontier)
    return F.array_distinct(out)


def _checked_key(col: Column, side: str, max_key_length: int) -> Column:
    return F.when(
        F.length(col) > max_key_length,
        F.raise_error(
            F.concat(
                F.lit(
                    f"fuzzy_join {side} key longer than "
                    f"max_key_length={max_key_length}: "
                ),
                F.substring(col, 1, 80),
            )
        ),
    ).otherwise(col)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    max_distance: int = 1,
    distance_col: str = "distance",
    max_key_length: int = 128,
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on
    ``levenshtein(left_key, right_key) <= max_distance``.

    Output columns: all of ``left``'s, then all of ``right``'s, then
    ``distance_col`` (int). Column names must not collide across sides
    (rename before joining — an implicit suffix would silently change
    downstream references). Null keys never match, like SQL equality.

    Matching work is proportional to DISTINCT keys: candidate pairs are
    generated and verified once per distinct ``(left_key, right_key)``
    string pair, then payloads re-attach by key equality.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"column names present on both sides: {sorted(overlap)}; "
            "rename before fuzzy_join"
        )
    if distance_col in set(left.columns) | set(right.columns):
        raise ValueError(f"distance_col {distance_col!r} already exists")

    def _variants(df: DataFrame, key: str, alias: str, side: str) -> DataFrame:
        k = _checked_key(F.col(key), side, max_key_length)
        return (
            df.select(k.alias(alias))
            .where(F.col(alias).isNotNull())
            .distinct()
            .select(
                alias,
                F.explode(
                    deletion_variants(F.col(alias), max_distance)
                ).alias("__var"),
            )
        )

    lv = _variants(left, left_key, "__lk", "left")
    rv = _variants(right, right_key, "__rk", "right")
    dist = F.levenshtein(F.col("__lk"), F.col("__rk"), max_distance)
    verified = (
        lv.join(rv, "__var")
        .select("__lk", "__rk")
        .distinct()
        .select("__lk", "__rk", dist.alias(distance_col))
        .where(F.col(distance_col) >= 0)  # threshold form: -1 = too far
    )
    return (
        left.join(verified, F.col(left_key) == F.col("__lk"))
        .join(right, F.col("__rk") == F.col(right_key))
        .select(*left.columns, *right.columns, distance_col)
    )

"""Relational aggregation surface beyond plain GROUP BY: hierarchical
rollups (grouping sets), pivot tables, and single-pass data-quality
expectation checks.

Extension scope (SURVEY §2.5). The reference engine aggregates only
through window specs; these are the companion *reporting* shapes an
analytics engine is expected to serve, expressed so Catalyst keeps them
one-shuffle:

- ``rollup_aggregate`` / ``cube_aggregate`` lower to Spark's native
  ``Expand`` + single hash aggregate: each input row is replicated once
  per grouping set BEFORE the exchange, partial aggregation still
  applies, so the whole rollup is ONE shuffle regardless of how many
  levels it emits.
- ``pivot_aggregate`` uses an EXPLICIT pivot-value list (required, not
  optional): without it Spark runs a separate distinct-scan job to
  discover values — a hidden extra pass over 100 TB — and the output
  schema becomes data-dependent, which breaks downstream schema
  contracts. With the list, the plan is one conditional-aggregate pass
  (no second scan, no shuffle beyond the groupBy's own).
- ``run_expectations`` evaluates EVERY check in one aggregate pass over
  one scan (null fractions, bounds, set membership, uniqueness) and
  unpivots the single result row into one row per check. Uniqueness is
  the one check that genuinely needs distinct counting; it uses exact
  ``count_distinct`` by default (a second shuffle) — switch
  ``approx_unique=True`` at the 100 TB scale point to keep the whole
  audit one-pass (HLL partial aggregates merge map-side).
- ``histogram_drift`` (PSI between two slices of one table) is one scan
  + one groupBy on <= ``bins`` keys; everything after the aggregate
  (bin densify, totals, PSI terms) runs over a driver-sized <=
  ``bins``-row frame.
- ``snapshot_diff`` (CDC reconciliation of two table versions) is a
  single full-outer sort-merge join on the key — one shuffle per side,
  and the unchanged majority of rows is filtered before any downstream
  consumer sees it.
- ``profile_columns`` (per-column counts/nulls/distinct/min/max/avg)
  compiles the whole profile into the same one-aggregate-pass shape as
  ``run_expectations``.
- ``grouped_discrete_percentiles`` lifts the reference's
  DiscretePercentile walk to a grouped aggregate: rank-tag window +
  groupBy on the same keys = ONE shuffle via exchange reuse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rollup_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    *,
    cube: bool = False,
) -> DataFrame:
    """Aggregate over the hierarchy of grouping sets ``(), (k1),
    (k1,k2), ...`` (or every subset with ``cube=True``), appending
    ``grouping_id`` (bit i set = key i aggregated away, Spark and
    standard SQL semantics) so total rows are distinguishable from
    genuine NULL key values.

    One shuffle: Spark's Expand replicates rows per grouping set before
    the exchange and partial aggregation still runs map-side.
    """
    grouped = df.cube(*keys) if cube else df.rollup(*keys)
    gid = F.grouping_id(*[F.col(k) for k in keys]).alias("grouping_id")
    return grouped.agg(gid, *aggs)


def grouping_sets_aggregate(
    df: DataFrame,
    keys: list[str],
    sets: list[list[str]],
    aggs: list[Column],
) -> DataFrame:
    """Aggregate over an EXPLICIT list of grouping sets — the general
    form rollup and cube are special cases of, needed whenever the
    report wants parallel independent dimensions (``[(region), (month)]``)
    rather than a hierarchy or the full power set: a rollup would force
    an ordering, a cube would compute 2^k sets the report throws away.

    Same physical shape as :func:`rollup_aggregate`: Spark's Expand
    replicates each row once per LISTED set before the exchange, partial
    aggregation runs map-side, the whole report is ONE shuffle — and
    Expand's replication factor is ``len(sets)``, not ``2^k``, which is
    the scale argument for listing sets explicitly. ``grouping_id`` uses
    the standard bitmask over ``keys`` (bit i set = key i aggregated
    away), identical in Spark and DuckDB/Postgres ``grouping(...)``.

    Every name in ``sets`` must appear in ``keys`` (Spark validates);
    keys absent from a given set read as NULL in that set's rows, with
    ``grouping_id`` disambiguating them from genuine NULL key values.
    """
    if not sets:
        raise ValueError(
            "sets must list at least one grouping set; for the empty "
            "grand-total set pass [[]]"
        )
    grouped = df.groupingSets([list(s) for s in sets], *keys)
    gid = F.grouping_id(*[F.col(k) for k in keys]).alias("grouping_id")
    return grouped.agg(gid, *aggs)


def pivot_aggregate(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    pivot_values: list,
    aggs: list[Column],
) -> DataFrame:
    """Pivot ``pivot_col`` into one output column per (value, aggregate)
    pair, grouped by ``keys``.

    ``pivot_values`` is REQUIRED: an explicit value list keeps the output
    schema static and avoids Spark's implicit distinct-discovery job — an
    extra full scan at scale. Unlisted values are dropped (standard pivot
    semantics); plan is a single conditional-aggregate pass.
    """
    if not pivot_values:
        raise ValueError(
            "pivot_values must be a non-empty explicit list; implicit "
            "discovery would run a hidden distinct scan and make the "
            "output schema data-dependent"
        )
    return df.groupBy(*keys).pivot(pivot_col, pivot_values).agg(*aggs)


@dataclass(frozen=True)
class Expectation:
    """One data-quality check. ``kind`` selects the metric:

    - ``not_null``: metric = fraction of NULL values; pass when == 0
      (or <= ``threshold`` if given).
    - ``min`` / ``max``: metric = observed min/max (numeric); pass when
      within ``bound`` (min >= bound / max <= bound).
    - ``in_set``: metric = fraction of non-null values OUTSIDE
      ``allowed``; pass when == 0 (or <= ``threshold``).
    - ``unique``: metric = distinct/non-null ratio (exactly 1.0 when the
      column is a key); pass when >= 1.0 — or >= 0.95 under
      ``approx_unique`` (HLL's default ~5% rsd can under-estimate).

    A check whose metric is undefined (empty input, or an all-NULL
    column for ``min``/``max``/``in_set``/``unique``) FAILS: NULL never
    silently passes an audit.
    """

    name: str
    column: str
    kind: str
    bound: float | None = None
    allowed: tuple | None = None
    threshold: float = 0.0


def quarantine_rows(
    df: DataFrame,
    checks: dict[str, Column],
    *,
    failed_col: str = "failed_checks",
    flag_col: str = "quarantined",
) -> DataFrame:
    """Row-level validate-and-route — the drop-and-log step of a cleaning
    pipeline (:func:`run_expectations` answers "is the TABLE healthy";
    this answers "WHICH rows do I route to the quarantine sink, and
    why"). Appends ``failed_col`` (";"-joined names of the checks the
    row failed, in sorted name order — a string, not an array, so the
    value is byte-identical across engines) and ``flag_col``.

    A check evaluating to NULL counts as FAILED: an expectation that
    cannot be evaluated (NULL inputs) must not sail a row through —
    the same coalesce-to-False discipline as ``run_expectations``.

    Pure codegen projection: zero shuffles, zero extra scans — the two
    output streams (``where(~quarantined)`` to the clean sink,
    ``where(quarantined)`` to the quarantine sink with its reasons)
    prune from the same single pass."""
    if not checks:
        raise ValueError("checks must name at least one expectation")
    for name in checks:
        if not name or ";" in name:
            # an empty name would make its failures invisible in the
            # string encoding; a ';' would corrupt any downstream split
            raise ValueError(
                f"check name {name!r} must be non-empty and contain "
                "no ';' (it is the list separator in failed_checks)"
            )
    failed = F.concat_ws(
        ";",
        *[
            F.when(~F.coalesce(chk, F.lit(False)), F.lit(name))
            for name, chk in sorted(checks.items())
        ],
    )
    # the flag is derived from the CONDITIONS, not from string emptiness
    # of the encoding — the encoding is for humans/logs, the routing
    # decision must not depend on it
    any_failed = None
    for _, chk in checks.items():
        miss = ~F.coalesce(chk, F.lit(False))
        any_failed = miss if any_failed is None else (any_failed | miss)
    return df.withColumn(failed_col, failed).withColumn(flag_col, any_failed)


def quarantine_write(
    df: DataFrame,
    checks: dict[str, Column],
    path: str,
    *,
    failed_col: str = "failed_checks",
    flag_col: str = "quarantined",
    mode: str = "error",
    counts: bool = True,
) -> dict:
    """The sink side of :func:`quarantine_rows`: route every input row
    to the clean or quarantine sink in ONE job over ONE scan, by writing
    the routed frame partitioned on the routing flag —
    ``{path}/{flag_col}=false/`` is the clean sink,
    ``{path}/{flag_col}=true/`` the quarantine sink (reasons in
    ``failed_col`` ride along; clean rows carry an empty string).

    Why this shape and not two filtered writes: two writes are two
    executions of the upstream plan — at 100 TB that is the whole scan
    twice, and if anything upstream is nondeterministic (sampled input,
    a changed source between the passes) a row can land in BOTH sinks
    or NEITHER. One partitioned write commits both sinks from the same
    physical rows atomically (Spark's committer publishes the job's
    output as a unit), so clean ∪ quarantine == input exactly, by
    construction rather than by caching discipline.

    Returns ``{"clean_rows", "quarantined_rows", "clean_path",
    "quarantine_path"}`` with counts read back from the COMMITTED files
    (not the pre-write frame — the numbers describe what is actually on
    disk); ``counts=False`` skips the read-back pass (two Spark jobs)
    and returns ``None`` counts, for callers who read the sinks anyway.
    A side with zero rows has no directory (dynamic partition writes
    skip empty partitions): check its count before reading it. An
    ENTIRELY empty input commits no data files at all — both counts
    read 0 and neither sink directory exists.
    """
    routed = quarantine_rows(
        df, checks, failed_col=failed_col, flag_col=flag_col
    )
    routed.write.partitionBy(flag_col).mode(mode).parquet(path)
    out = {
        "clean_rows": None,
        "quarantined_rows": None,
        "clean_path": f"{path}/{flag_col}=false",
        "quarantine_path": f"{path}/{flag_col}=true",
    }
    if not counts:
        return out
    from pyspark.errors import AnalysisException

    try:
        committed = df.sparkSession.read.parquet(path)
    except AnalysisException:
        # an empty input writes only _SUCCESS — no partitions, no
        # schema to infer; that is a legitimate empty batch, not an
        # error (UNABLE_TO_INFER_SCHEMA)
        out["clean_rows"] = 0
        out["quarantined_rows"] = 0
        return out
    # cast IN the plan: partition-column type inference is session-
    # config-dependent, and Python bool("false") is True — a string
    # flag must never reach the dict keys
    got = {
        r["f"]: r["n"]
        for r in committed.groupBy(
            F.col(flag_col).cast("boolean").alias("f")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["clean_rows"] = got.get(False, 0)
    out["quarantined_rows"] = got.get(True, 0)
    return out


def run_expectations(
    df: DataFrame,
    checks: list[Expectation],
    *,
    approx_unique: bool = False,
) -> DataFrame:
    """Evaluate all ``checks`` in ONE aggregate pass and return one row
    per check: ``(check, column, metric, passed)``.

    Every metric compiles to an aggregate expression over the same scan
    — adding checks does not add passes. ``unique`` checks use exact
    ``count_distinct`` by default; ``approx_unique=True`` swaps in HLL
    ``approx_count_distinct`` (then ``metric`` carries the sketch's
    distinct ratio and ``passed`` tolerates its default ~5% rsd) for the
    one-shuffle plan at scale.
    """
    metric_cols: list[Column] = []
    for i, c in enumerate(checks):
        col = F.col(c.column)
        if c.kind == "not_null":
            m = F.avg(col.isNull().cast("double"))
        elif c.kind == "min":
            m = F.min(col).cast("double")
        elif c.kind == "max":
            m = F.max(col).cast("double")
        elif c.kind == "in_set":
            if not c.allowed:
                raise ValueError(f"in_set check {c.name!r} needs `allowed`")
            bad = (~col.isin(list(c.allowed))).cast("double")
            # fraction of NON-NULL values outside the set (nulls are
            # not_null's job); the SUM is coalesced (all-clean column ->
            # 0, not NULL) but the division is try_divide so an all-NULL
            # column or empty input yields an undefined metric that
            # FAILS under ANSI mode instead of erroring
            m = F.try_divide(
                F.coalesce(F.sum(F.when(col.isNotNull(), bad)), F.lit(0.0)),
                F.count(col),
            )
        elif c.kind == "unique":
            distinct = (
                F.approx_count_distinct(col) if approx_unique
                else F.count_distinct(col)
            )
            # distinct/non-null ratio: exactly 1.0 iff the column is a
            # key (exact mode); scale-free, so the approx pass rule is a
            # plain constant tolerance. try_divide: empty/all-NULL input
            # gives an undefined (failing) metric, not an ANSI error
            m = F.try_divide(distinct, F.count(col))
        else:
            raise ValueError(f"unknown expectation kind {c.kind!r}")
        metric_cols.append(m.alias(f"__m{i}"))

    row = df.agg(*metric_cols)

    # unpivot the single metrics row into (check, column, metric, passed)
    out_structs = []
    for i, c in enumerate(checks):
        m = F.col(f"__m{i}")
        if c.kind in ("not_null", "in_set"):
            passed = m <= F.lit(c.threshold)
        elif c.kind == "min":
            passed = F.lit(True) if c.bound is None else m >= F.lit(float(c.bound))
        elif c.kind == "max":
            passed = F.lit(True) if c.bound is None else m <= F.lit(float(c.bound))
        else:  # unique: ratio == 1.0 exact; HLL may under-estimate, so
            # tolerate its ~5% default rsd in approx mode
            passed = m >= F.lit(0.95 if approx_unique else 1.0)
        out_structs.append(
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.round(m, 6).alias("metric"),
                # undefined metric (empty input / all-NULL column) makes
                # the comparison NULL — an audit must FAIL there, not
                # vanish from boolean filters
                F.coalesce(passed, F.lit(False)).alias("passed"),
            )
        )
    return row.select(
        F.explode(F.array(*out_structs)).alias("r")
    ).select("r.check", "r.column", "r.metric", "r.passed")


def histogram_drift(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population-stability-index (PSI) drift report between two slices
    of ONE table: rows where ``side_col`` is false form the baseline
    population, true rows the current one. Values bucket into ``bins``
    equal-width bins over [lo, hi) — out-of-range values CLAMP into the
    edge bins (drifted mass must be counted, not dropped) — and each
    bin's PSI term is ``(p - q) * ln(p / q)`` over Laplace-smoothed
    proportions ``(n + smoothing) / (N + smoothing * bins)``, so empty
    bins never divide by zero.

    Output: one row per bin (ALL ``bins`` bins, empty ones densified to
    zero counts): ``(bin, lo_edge, base_n, cur_n, psi_term)`` plus the
    same ``psi_total`` on every row (rule of thumb: > 0.2 = major
    drift). NULL and NaN values are excluded — they are a ``not_null``
    expectation's job, not a histogram's.

    Scale shape: one scan, one map-side-combined groupBy on <= ``bins``
    keys; the densify join, slice totals, and psi_total are window/join
    work over the <= ``bins``-row aggregate — driver-sized, never the
    data.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    # clamp BEFORE the int cast: floor() of a far-out-of-range value
    # saturates to Long.MaxValue, and casting that to int is a
    # CAST_OVERFLOW error under ANSI mode — exactly the corrupt row a
    # drift audit exists to flag, not die on
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    b = F.greatest(
        F.lit(0).cast("long"), F.least(F.lit(bins - 1).cast("long"), raw)
    ).cast("int")
    hist = (
        df.where(v.isNotNull() & ~F.isnan(v))
        .select(b.alias("bin"), side_col.cast("boolean").alias("__cur"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(~F.col("__cur"), 1).otherwise(0)).alias("base_n"),
            F.sum(F.when(F.col("__cur"), 1).otherwise(0)).alias("cur_n"),
        )
    )
    spine = df.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    dense = spine.join(hist, "bin", "left").select(
        "bin",
        F.coalesce(F.col("base_n"), F.lit(0)).cast("long").alias("base_n"),
        F.coalesce(F.col("cur_n"), F.lit(0)).cast("long").alias("cur_n"),
    )
    w = Window.partitionBy()  # <= bins rows: single tiny partition is fine
    sm = F.lit(float(smoothing))
    extra = F.lit(float(smoothing * bins))
    p = (F.col("base_n") + sm) / (F.sum("base_n").over(w) + extra)
    q = (F.col("cur_n") + sm) / (F.sum("cur_n").over(w) + extra)
    out = dense.withColumn("psi_term", (p - q) * F.log(p / q))
    return out.select(
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo_edge"),
        "base_n",
        "cur_n",
        F.round("psi_term", 6).alias("psi_term"),
        F.round(F.sum("psi_term").over(w), 6).alias("psi_total"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style reconciliation of two snapshots of one logical table:
    one row per key whose state CHANGED, tagged ``change_type`` in
    ('insert', 'delete', 'update'), carrying both sides of every
    compared column as ``old_<col>`` / ``new_<col>`` (NULL on the
    absent side of inserts/deletes). Keys present on both sides with
    every compared column NULL-safe-equal are omitted — the diff is
    empty when the snapshots agree.

    NULL state compares via IS NOT DISTINCT FROM: NULL -> NULL is
    unchanged, NULL -> value is an update. One shuffle per side (full
    outer sort-merge join on ``keys``).
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        o.join(n, keys, "full_outer")
        .withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[a for c in compare_cols for a in (f"old_{c}", f"new_{c}")],
        )
    )


def profile_columns(
    df: DataFrame,
    columns: list[str],
    *,
    approx_distinct: bool = False,
) -> DataFrame:
    """Single-pass numeric column profile: one output row per column —
    ``(column, n_rows, n_null, n_distinct, min, max, avg)`` — with every
    metric compiled into ONE aggregate over one scan (the standard
    pre-training "profile the table" audit; pair with
    :func:`run_expectations` to turn observations into checks).

    Distinct counts are exact by default: Spark plans the multi-column
    DISTINCT aggregate via Expand, which replicates each row once per
    profiled column before the exchange — correct but |columns|x shuffle
    volume. ``approx_distinct=True`` swaps in HLL sketches and keeps the
    shuffle at one partial-aggregate row per partition at 100 TB.

    ``min``/``max``/``avg`` are cast to double (profile rows are
    homogeneous across columns); ``avg`` is rounded to 4 decimals since
    distributed partial-sum order is not associative-stable in the last
    ulps.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(col) if approx_distinct
            else F.count_distinct(col)
        )
        aggs += [
            # coalesced: SUM over zero rows is NULL, and a null-count
            # audit must read 0 on empty input (run_expectations makes
            # the same guard for the same reason)
            F.coalesce(
                F.sum(col.isNull().cast("long")), F.lit(0)
            ).alias(f"__null{i}"),
            distinct.alias(f"__ndv{i}"),
            F.min(col).cast("double").alias(f"__min{i}"),
            F.max(col).cast("double").alias(f"__max{i}"),
            # cast like min/max: avg of a DecimalType column yields a
            # decimal, and heterogeneous struct fields break the
            # explode(array(...)) unpivot
            F.round(F.avg(col), 4).cast("double").alias(f"__avg{i}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null{i}").alias("n_null"),
            F.col(f"__ndv{i}").alias("n_distinct"),
            F.col(f"__min{i}").alias("min"),
            F.col(f"__max{i}").alias("max"),
            F.col(f"__avg{i}").alias("avg"),
        )
        for i, c in enumerate(columns)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.column", "r.n_rows", "r.n_null", "r.n_distinct",
        "r.min", "r.max", "r.avg",
    )


def grouped_discrete_percentiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ps: list[float],
) -> DataFrame:
    """Exact discrete percentiles per group — the reference's
    DiscretePercentile walk (smallest value whose cumulative share
    >= p, i.e. the value at rank ceil(p*n); reference
    DiscretePercentile.java:142-168) lifted from the window surface to
    a GROUPED aggregate: one output row per key with a ``p<pct>``
    column per requested percentile.

    Plan: one WindowExec pass tags each row with its in-group rank and
    group size, and the follow-up groupBy — on the SAME keys — reuses
    the window's exchange, so the whole multi-percentile aggregate is
    ONE shuffle regardless of how many percentiles are requested (an
    exact-percentile UDAF would buffer per-group value maps instead;
    this shape is flat-memory, the same trade the window-side
    rank-lookup rewrite makes).

    Ranks among tied values are arbitrary, but the SELECTED value is
    tie-invariant (any rank inside a tie run carries the same value),
    so no tiebreak columns are needed for determinism.

    NULL values are ignored, matching aggregate-percentile semantics
    (and the window-side rank-lookup rewrite): nulls sort LAST so they
    never occupy ranks 1..n, and n counts only non-null values. A group
    whose values are ALL NULL still emits a row, with NULL percentiles.

    Output columns are ``p<100p:g>`` with '.' -> '_' (0.5 -> p50,
    0.125 -> p12_5); duplicate labels raise.
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    names = []
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile {p!r} outside [0, 1]")
        names.append("p" + f"{p * 100:g}".replace(".", "_"))
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile labels: {names}")
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(v.asc_nulls_last())
    full = Window.partitionBy(*keys)
    tagged = df.select(
        *keys,
        v.alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(v).over(full).alias("__n"),
    )
    aggs = []
    for p, name in zip(ps, names):
        # all-NULL group: n=0 -> k=1 points at a NULL row -> NULL output
        k = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(float(p)) * F.col("__n")).cast("long"),
        )
        aggs.append(
            F.max(F.when(F.col("__rn") == k, F.col("__v"))).alias(name)
        )
    return tagged.groupBy(*keys).agg(*aggs)

"""The declared query suite: every operator exposed as a (spark, sf_dir) ->
DataFrame callable plus, where SQL-expressible, a DuckDB oracle string.

This is the single source of truth consumed by ``__spark_entry__.py`` (the
driver's correctness gate), ``tests/`` (local differential checks), and
``bench.py`` (headline timings). Each query exercises one row of SURVEY.md §2's
operator inventory; names are stable keys.

Determinism rules (so Spark and DuckDB agree bit-for-bit):

- Every order-sensitive window (row_number/ntile/lead/lag/first/last/
  accumulate) orders by a key set that is a TOTAL order (ties broken by
  ``l_orderkey, l_linenumber`` / ``event_id``). Rank-family functions depend
  only on key values, so value ties are fine there.
- Float aggregates that accumulate error (sums/percentiles of
  ``l_extendedprice``) are rounded to 4 decimals on BOTH sides.
- Column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from window_aggregation_spark.parser import config_to_plan
from window_aggregation_spark.plans.sql_gen import plan_to_sql
from window_aggregation_spark.sources.io import read_table
from window_aggregation_spark.spec import (
    UNBOUNDED_FOLLOWING,
    AggregateDef,
    Direction,
    FrameType,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
)
from window_aggregation_spark.operators.window_aggregation import window_aggregate


@dataclass(frozen=True)
class SuiteQuery:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views; None = rows-only
    headline: bool = False  # include in bench.py


SUITE: dict[str, SuiteQuery] = {}


def _register(
    name: str, oracle: str | None, *, headline: bool = False
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        SUITE[name] = SuiteQuery(name, fn, oracle, headline)
        return fn

    return deco


# Total order within lineitem partitions. (l_orderkey, l_linenumber) is NOT
# unique in the synthetic fixtures — only the full value tuple is — so
# order-sensitive windows order by all of these to stay engine-deterministic.
_LI_TIEBREAK = (
    OrderKey("l_shipdate"),
    OrderKey("l_orderkey"),
    OrderKey("l_linenumber"),
    OrderKey("l_partkey"),
    OrderKey("l_suppkey"),
    OrderKey("l_quantity"),
    OrderKey("l_extendedprice"),
)
_LI_TIEBREAK_SQL = (
    "l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_partkey ASC, "
    "l_suppkey ASC, l_quantity ASC, l_extendedprice ASC"
)
_LI_TIEBREAK_SPEC = (
    "l_shipdate:Ascending,l_orderkey:Ascending,l_linenumber:Ascending,"
    "l_partkey:Ascending,l_suppkey:Ascending,l_quantity:Ascending,"
    "l_extendedprice:Ascending"
)

# Total order by quantity (descending) for rank-ish demos.
_QTY_TOTAL = (
    OrderKey("l_quantity", Direction.DESCENDING),
    OrderKey("l_orderkey"),
    OrderKey("l_linenumber"),
    OrderKey("l_partkey"),
    OrderKey("l_suppkey"),
    OrderKey("l_extendedprice"),
    OrderKey("l_shipdate"),
)
_QTY_TOTAL_SQL = (
    "l_quantity DESC, l_orderkey ASC, l_linenumber ASC, l_partkey ASC, "
    "l_suppkey ASC, l_extendedprice ASC, l_shipdate ASC"
)
_QTY_TOTAL_SPEC = (
    "l_quantity:Descending,l_orderkey:Ascending,l_linenumber:Ascending,"
    "l_partkey:Ascending,l_suppkey:Ascending,l_extendedprice:Ascending,"
    "l_shipdate:Ascending"
)

_LI_KEYS = ("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# Core window functions (reference §2.2 — all 14)
# ---------------------------------------------------------------------------

@_register(
    "w_rank_family",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(percent_rank() OVER w AS REAL) AS prnk,
           CAST(cume_dist() OVER w AS DOUBLE) AS cdist
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC)
    """,
    headline=True,
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / PERCENT_RANK / CUMULATIVE_DISTRIBUTION in one
    WindowExec pass (rank family depends only on order-key values — value
    ties are deterministic)."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_returnflag",),
            order_by=(OrderKey("l_quantity"),),
        ),
        aggregates=(
            AggregateDef("rnk", "rank"),
            AggregateDef("drnk", "dense_rank"),
            AggregateDef("prnk", "percent_rank"),
            AggregateDef("cdist", "cume_dist", field="l_quantity"),
        ),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_quantity",
                         "rnk", "drnk", "prnk", "cdist"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_row_number_ntile",
    f"""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_QTY_TOTAL_SQL})
    """,
)
def w_row_number_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_returnflag",), order_by=_QTY_TOTAL),
        aggregates=(
            AggregateDef("rn", "row_number"),
            AggregateDef("quartile", "ntile", field="l_quantity", args=("4",)),
        ),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_quantity", "rn", "quartile"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_lead_lag",
    f"""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
           lead(l_extendedprice, 2) OVER w AS next2_price,
           lag(l_extendedprice, 3) OVER w AS prev3_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_LI_TIEBREAK_SQL})
    """,
    headline=True,
)
def w_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_suppkey",), order_by=_LI_TIEBREAK),
        aggregates=(
            AggregateDef("next2_price", "lead", field="l_extendedprice", args=("2",)),
            AggregateDef("prev3_price", "lag", field="l_extendedprice", args=("3",)),
        ),
        declared_schema=(*_LI_KEYS, "l_suppkey", "l_extendedprice",
                         "next2_price", "prev3_price"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_first_last_running",
    f"""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           first_value(l_quantity) OVER w AS max_qty,
           last_value(l_quantity) OVER w AS cur_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_QTY_TOTAL_SQL})
    """,
)
def w_first_last_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default-frame semantics (reference fine print #1): with ORDER BY and
    no explicit frame, LAST returns the *current* row's value (running
    RANGE frame), not the partition's last row."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_returnflag",), order_by=_QTY_TOTAL),
        aggregates=(
            AggregateDef("max_qty", "first", field="l_quantity"),
            AggregateDef("cur_qty", "last", field="l_quantity"),
        ),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_quantity",
                         "max_qty", "cur_qty"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_first_last_ignore_nulls",
    f"""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CASE WHEN l_linenumber = 1 THEN NULL ELSE l_quantity END AS qty_or_null,
           first_value(CASE WHEN l_linenumber = 1 THEN NULL ELSE l_quantity END
                       IGNORE NULLS) OVER w AS first_nn,
           last_value(CASE WHEN l_linenumber = 1 THEN NULL ELSE l_quantity END)
                      OVER w AS last_any
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_LI_TIEBREAK_SQL}
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def w_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST with ignoreNulls over an explicit ROW frame; LAST with
    respect-nulls (the reference's only way: literal 'false' in the third
    spec position)."""
    df = read_table(spark, sf_dir, "lineitem").withColumn(
        "qty_or_null",
        F.when(F.col("l_linenumber") == 1, None).otherwise(F.col("l_quantity")),
    )
    plan = config_to_plan(
        partition_fields="l_returnflag",
        partition_order=_LI_TIEBREAK_SPEC,
        window_frame_type="ROW",
        preceding="-2",
        following="",
        aggregates="first_nn:first(qty_or_null,,true)\n"
                   "last_any:last(qty_or_null,,false)",
        output_schema=[*_LI_KEYS, "l_returnflag", "qty_or_null",
                       "first_nn", "last_any"],
    )
    return window_aggregate(df, plan)


@_register(
    "w_accumulate_running",
    f"""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
           sum(l_quantity) OVER w AS run_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_LI_TIEBREAK_SQL})
    """,
    headline=True,
)
def w_accumulate_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACCUMULATE with the default frame = running sum (reference doc
    example semantics)."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_suppkey",), order_by=_LI_TIEBREAK),
        aggregates=(AggregateDef("run_qty", "accumulate", field="l_quantity"),),
        declared_schema=(*_LI_KEYS, "l_suppkey", "l_quantity", "run_qty"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_accumulate_rows_frame",
    f"""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
           sum(l_quantity) OVER w AS qty_4row
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_LI_TIEBREAK_SQL}
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def w_accumulate_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_suppkey",),
            order_by=_LI_TIEBREAK,
            frame_type=FrameType.ROW,
            start=-3,
            end=0,
        ),
        aggregates=(AggregateDef("qty_4row", "accumulate", field="l_quantity"),),
        declared_schema=(*_LI_KEYS, "l_suppkey", "l_quantity", "qty_4row"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_accumulate_range_frame",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           sum(l_quantity) OVER w AS qty_range5
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC
                 RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    """,
)
def w_accumulate_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a bounded offset — requires exactly one numeric
    order key (reference special case + Catalyst rule)."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_returnflag",),
            order_by=(OrderKey("l_quantity"),),
            frame_type=FrameType.RANGE,
            start=-5,
            end=0,
        ),
        aggregates=(AggregateDef("qty_range5", "accumulate", field="l_quantity"),),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_quantity", "qty_range5"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_median_running",
    """
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
           CAST(quantile_cont(l_quantity, 0.5) OVER w AS DOUBLE) AS med_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity ASC)
    """,
    headline=True,
)
def w_median_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN with the default ordered frame = running median (exact,
    interpolated — Hive `percentile` semantics)."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_suppkey",), order_by=(OrderKey("l_quantity"),)
        ),
        aggregates=(AggregateDef("med_qty", "median", field="l_quantity"),),
        declared_schema=(*_LI_KEYS, "l_suppkey", "l_quantity", "med_qty"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_continuous_percentile",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.25) OVER w AS DOUBLE), 4)
             AS price_p25
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def w_continuous_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS_PERCENTILE: ordering not supported (reference clause
    table) — whole-partition exact interpolated percentile."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_returnflag",)),
        aggregates=(
            AggregateDef("price_p25", "continuous_percentile",
                         field="l_extendedprice", args=("0.25",)),
        ),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_extendedprice", "price_p25"),
    )
    out = window_aggregate(df, plan)
    return out.withColumn("price_p25", F.round("price_p25", 4))


@_register(
    "w_discrete_percentile",
    """
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
           quantile_disc(l_quantity, 0.25) OVER w AS qty_p25_disc
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity ASC)
    """,
    headline=True,
)
def w_discrete_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE_PERCENTILE (the reference's custom UDAF, re-expressed as
    builtin expressions) over the running default frame."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_suppkey",), order_by=(OrderKey("l_quantity"),)
        ),
        aggregates=(
            AggregateDef("qty_p25_disc", "discrete_percentile",
                         field="l_quantity", args=("0.25",)),
        ),
        declared_schema=(*_LI_KEYS, "l_suppkey", "l_quantity", "qty_p25_disc"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_unbounded_following",
    f"""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           last_value(l_quantity) OVER w AS min_remaining,
           sum(l_quantity) OVER w AS qty_remaining
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_QTY_TOTAL_SQL}
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    """,
)
def w_unbounded_following(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-following ROW frame (the Long.MAX_VALUE sentinel path)."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_returnflag",),
            order_by=_QTY_TOTAL,
            frame_type=FrameType.ROW,
            start=0,
            end=UNBOUNDED_FOLLOWING,
        ),
        aggregates=(
            AggregateDef("min_remaining", "last", field="l_quantity"),
            AggregateDef("qty_remaining", "accumulate", field="l_quantity"),
        ),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_quantity",
                         "min_remaining", "qty_remaining"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_golden_alias_overwrite",
    f"""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           first_value(l_quantity) OVER w AS l_quantity
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_QTY_TOTAL_SQL})
    """,
)
def w_golden_alias_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias collision replaces the input column in place (the reference's
    e2e golden-test behavior, scaled onto lineitem)."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = config_to_plan(
        partition_fields="l_returnflag",
        partition_order=_QTY_TOTAL_SPEC,
        aggregates="l_quantity:first(l_quantity,,true)",
        output_schema=[*_LI_KEYS, "l_returnflag", "l_quantity"],
    )
    return window_aggregate(df, plan)


@_register(
    "w_multi_one_pass",
    f"""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(row_number() OVER w AS INT) AS rn,
           sum(l_quantity) OVER w AS run_qty,
           first_value(l_quantity) OVER w AS first_qty,
           last_value(l_quantity) OVER w AS cur_qty,
           lead(l_quantity, 1) OVER w AS next_qty,
           lag(l_quantity, 1) OVER w AS prev_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_LI_TIEBREAK_SQL})
    """,
    headline=True,
)
def w_multi_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight aggregates, one shared spec — Catalyst collapses them into a
    single WindowExec: one shuffle, one sort, one pass."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_returnflag",), order_by=_LI_TIEBREAK),
        aggregates=(
            AggregateDef("rnk", "rank"),
            AggregateDef("drnk", "dense_rank"),
            AggregateDef("rn", "row_number"),
            AggregateDef("run_qty", "accumulate", field="l_quantity"),
            AggregateDef("first_qty", "first", field="l_quantity"),
            AggregateDef("cur_qty", "last", field="l_quantity"),
            AggregateDef("next_qty", "lead", field="l_quantity", args=("1",)),
            AggregateDef("prev_qty", "lag", field="l_quantity", args=("1",)),
        ),
        declared_schema=(*_LI_KEYS, "l_returnflag", "l_quantity", "rnk", "drnk",
                         "rn", "run_qty", "first_qty", "cur_qty", "next_qty",
                         "prev_qty"),
    )
    return window_aggregate(df, plan)


@_register(
    "w_sql_backend",
    f"""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
           CAST(rank() OVER w AS INT) AS rnk,
           sum(l_quantity) OVER w AS run_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_LI_TIEBREAK_SQL})
    """,
)
def w_sql_backend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated-SQL backend (reference O12 analogue): the same plan IR
    rendered to a Spark SQL string and executed via spark.sql."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_suppkey",), order_by=_LI_TIEBREAK),
        aggregates=(
            AggregateDef("rnk", "rank"),
            AggregateDef("run_qty", "accumulate", field="l_quantity"),
        ),
        declared_schema=(*_LI_KEYS, "l_suppkey", "l_quantity", "rnk", "run_qty"),
    )
    df.createOrReplaceTempView("lineitem_sqlgen")
    sql = plan_to_sql(plan, "lineitem_sqlgen", df.columns, dialect="spark")
    return spark.sql(sql)


@_register(
    "w_repartition_output",
    f"""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
           CAST(row_number() OVER w AS INT) AS rn
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_LI_TIEBREAK_SQL})
    """,
)
def w_repartition_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numberOfPartitions passthrough (reference O4): fixed output partition
    count for a downstream stage; results are unchanged."""
    df = read_table(spark, sf_dir, "lineitem")
    plan = config_to_plan(
        partition_fields="l_suppkey",
        partition_order=_LI_TIEBREAK_SPEC,
        aggregates="rn:row_number(,,true)",
        number_of_partitions="8",
        output_schema=[*_LI_KEYS, "l_suppkey", "l_quantity", "rn"],
    )
    return window_aggregate(df, plan)


@_register(
    "w_events_running",
    """
    SELECT event_id, user_id, event_type, value,
           CAST(row_number() OVER w AS INT) AS rn,
           ROUND(sum(value) OVER w, 4) AS run_value
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)
    """,
    headline=True,
)
def w_events_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-ordered running aggregates over the events table (exercises
    the nanosecond-parquet normalization in sources.io.read_table)."""
    df = read_table(spark, sf_dir, "events")
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("event_type",),
            order_by=(OrderKey("ts"), OrderKey("event_id")),
        ),
        aggregates=(
            AggregateDef("rn", "row_number"),
            AggregateDef("run_value", "accumulate", field="value"),
        ),
        declared_schema=("event_id", "user_id", "event_type", "value",
                         "rn", "run_value"),
    )
    out = window_aggregate(df, plan)
    return out.withColumn("run_value", F.round("run_value", 4))


def headline_queries() -> dict[str, SuiteQuery]:
    return {k: q for k, q in SUITE.items() if q.headline}

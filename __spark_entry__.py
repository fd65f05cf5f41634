"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``window_aggregation_spark.suite`` — one entry per
implemented operator from SURVEY.md §2 — so tests, bench, and this contract
share one definition.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from window_aggregation_spark.suite import SUITE  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session settings the driver's own session may lack."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # read-only conf (shouldn't happen for these runtime-settable keys)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return SUITE["w_multi_one_pass"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(q) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return q.build(_configure(spark), sf_dir)

        return run

    return {name: wrap(q) for name, q in SUITE.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted for non-SQL-
    expressible ops -> driver records a weaker rows-only check)."""
    return {
        name: q.oracle.strip()
        for name, q in SUITE.items()
        if q.oracle is not None
    }

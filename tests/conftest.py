from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local session for tests

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from window_aggregation_spark.session import get_spark

    spark = get_spark("window_aggregation_spark_tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views —
    the same setup the driver uses for the correctness gate."""
    import duckdb

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def assert_frames_match(spark_df, duck_rel, sort_cols: list[str] | None = None):
    """Order-insensitive comparison of a Spark result vs a DuckDB result,
    mirroring the driver's row-count + column + value check."""
    import math

    import pandas as pd

    left = spark_df.toPandas()
    right = duck_rel.df()
    assert sorted(left.columns) == sorted(right.columns), (
        f"column mismatch: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    left = left[cols]
    right = right[cols]
    assert len(left) == len(right), f"row count {len(left)} vs {len(right)}"
    sort_by = sort_cols or cols
    left = left.sort_values(sort_by, ignore_index=True)
    right = right.sort_values(sort_by, ignore_index=True)
    for c in cols:
        lv, rv = left[c], right[c]
        # Spark DATE arrives as object-dtype datetime.date while DuckDB
        # DATE arrives as datetime64 — same values, different carriers;
        # normalize both to datetime64 before comparing
        if pd.api.types.is_datetime64_any_dtype(
            lv
        ) or pd.api.types.is_datetime64_any_dtype(rv):
            lv = pd.to_datetime(lv)
            rv = pd.to_datetime(rv)
        if pd.api.types.is_float_dtype(lv) or pd.api.types.is_float_dtype(rv):
            for i, (a, b) in enumerate(zip(lv, rv)):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                assert not (a_nan or b_nan), f"{c}[{i}]: {a!r} vs {b!r}"
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9), (
                    f"{c}[{i}]: {a!r} vs {b!r}"
                )
        else:
            mismatched = lv.astype(object).where(pd.notna(lv), None).compare(
                rv.astype(object).where(pd.notna(rv), None)
            )
            assert mismatched.empty, f"{c}: first mismatches\n{mismatched.head()}"

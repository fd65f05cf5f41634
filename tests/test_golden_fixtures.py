"""Golden-result tests from the reference's own test artifacts (FIXTURES.md).

F1: e2e golden test — first() with alias collision overwriting `age`
    (reference src/e2e-test/features/WindowAggregation.feature:42-44 +
    expected_output_1.csv).
F2: example pipeline — DISCRETE_PERCENTILE(value, 0.1) with an all-ties order
    (reference examples/windowsTestData.csv + DiscretePercentile.java:142-168).
F3: docs sample — rank + lead appended columns
    (reference docs/WindowAggregation-sparkcompute.md:93-131).
"""

from __future__ import annotations

import pytest

from window_aggregation_spark import (
    AggregateDef,
    Direction,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
    config_to_plan,
    derive_output_schema,
    window_aggregate,
)

F1_ROWS = [
    (1, "Schuster", "Chris", "accountant", 23),
    (2, "Gamal", "Ali", "engineer", 30),
    (3, "Seitz", "Bob", "professor", 45),
    (4, "Bolt", "Henry", "engineer", 28),
    (5, "Shelton", "Alex", "professor", 50),
]
F1_SCHEMA = "id int, lastname string, firstname string, profession string, age int"


def test_f1_first_overwrites_age(spark):
    df = spark.createDataFrame(F1_ROWS, F1_SCHEMA)
    plan = config_to_plan(
        partition_fields="profession",
        partition_order="age:Descending",
        aggregates="age:first(age,1,true)",
    )
    out = window_aggregate(df, plan)
    assert out.columns == ["id", "lastname", "firstname", "profession", "age"]
    got = {r["id"]: r["age"] for r in out.collect()}
    assert got == {1: 23, 2: 30, 4: 30, 3: 50, 5: 50}


def test_f1_output_schema_derivation(spark):
    df = spark.createDataFrame(F1_ROWS, F1_SCHEMA)
    plan = config_to_plan(
        partition_fields="profession",
        partition_order="age:Descending",
        aggregates="age:first(age,1,true)\nrnk:rank(,,true)",
    )
    expected = derive_output_schema(df.schema, plan)
    out = window_aggregate(df, plan)
    assert [f.name for f in expected.fields] == out.columns
    assert [f.dataType for f in expected.fields] == [
        f.dataType for f in out.schema.fields
    ]


F2_ROWS = [
    (1, "Jamie", "Smith", 7280.9804),
    (1, "Jamie", "Smith", 6190.1372),
    (1, "Jamie", "Smith", 3127.5457),
    (1, "Jamie", "Smith", 3127.5457),
    (2, "Aj", "Rizi", 5850.325),
    (2, "Aj", "Rizi", 7278.8406),
    (2, "Aj", "Rizi", 3925.2045),
    (2, "Aj", "Rizi", 7116.5088),
]
F2_SCHEMA = "Identifier long, FirstName string, LastName string, value float"


def test_f2_discrete_percentile(spark):
    df = spark.createDataFrame(F2_ROWS, F2_SCHEMA)
    plan = config_to_plan(
        partition_fields="Identifier",
        partition_order="FirstName:Ascending",
        aggregates="aliasDiscPercent:discrete_percentile(value,0.1,false)",
    )
    out = window_aggregate(df, plan)
    assert dict(out.dtypes)["aliasDiscPercent"] == "float"
    got = sorted({(r["Identifier"], r["aliasDiscPercent"]) for r in out.collect()})
    assert [g[0] for g in got] == [1, 2]
    assert got[0][1] == pytest.approx(3127.5457)
    assert got[1][1] == pytest.approx(3925.2045)


F3_ROWS = [
    ("peter", 20, "US"),
    ("foo", 22, "US"),
    ("rajeev", 24, "US"),
    ("john", 28, "US"),
    ("alex", 30, "US"),
    ("ravi", 20, "INDIA"),
    ("kenny", 30, "INDIA"),
]
F3_SCHEMA = "name string, age int, location string"


def test_f3_rank_and_lead(spark):
    df = spark.createDataFrame(F3_ROWS, F3_SCHEMA)
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("location",),
            order_by=(OrderKey("age", Direction.ASCENDING),),
        ),
        aggregates=(
            AggregateDef("my_rank", "rank"),
            AggregateDef("next_value", "lead", field="age", args=("1",)),
        ),
    )
    out = window_aggregate(df, plan)
    rows = {r["name"]: (r["my_rank"], r["next_value"]) for r in out.collect()}
    assert rows == {
        "peter": (1, 22),
        "foo": (2, 24),
        "rajeev": (3, 28),
        "john": (4, 30),
        "alex": (5, None),
        "ravi": (1, 30),
        "kenny": (2, None),
    }

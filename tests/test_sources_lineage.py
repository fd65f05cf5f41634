"""Sources/sinks (reference §2.4: CSV with header+declared schema,
`;`-delimited) and the lineage describer (reference O11)."""

from __future__ import annotations

from window_aggregation_spark import config_to_plan
from window_aggregation_spark.plans.lineage import describe_plan
from window_aggregation_spark.sources.io import (
    read_csv,
    read_delimited,
    read_json,
    write_csv,
    write_parquet,
)

F1_ROWS = [
    (1, "Schuster", "Chris", "accountant", 23),
    (2, "Gamal", "Ali", "engineer", 30),
]
F1_SCHEMA = "id int, lastname string, firstname string, profession string, age int"


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    df = spark.createDataFrame(F1_ROWS, F1_SCHEMA)
    path = str(tmp_path / "people_csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema=F1_SCHEMA)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_delimited_source(spark, tmp_path):
    p = tmp_path / "measurements.csv"
    p.write_text(
        "Identifier;FirstName;LastName;value\n"
        "1;Jamie;Smith;7280.9804\n"
        "2;Aj;Rizi;5850.325\n"
    )
    schema = "Identifier long, FirstName string, LastName string, value float"
    df = read_delimited(spark, str(p), ";", schema)
    rows = {r["Identifier"]: r["FirstName"] for r in df.collect()}
    assert rows == {1: "Jamie", 2: "Aj"}
    assert dict(df.dtypes)["value"] == "float"


def test_json_source_with_schema(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": null}\n')
    df = read_json(spark, str(p), "id long, v double")
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "double"]
    assert df.count() == 2


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(F1_ROWS, F1_SCHEMA)
    path = str(tmp_path / "people_parquet")
    write_parquet(df, path, partition_by=["profession"])
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert set(back.columns) == set(df.columns)


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from window_aggregation_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(F1_ROWS, F1_SCHEMA)
    path = str(tmp_path / "people_orc")
    write_orc(df, path, partition_by=["profession"])
    back = read_orc(spark, path)
    assert back.count() == 2
    assert set(back.columns) == set(df.columns)


def test_lineage_describes_every_output_field():
    plan = config_to_plan(
        partition_fields="profession",
        partition_order="age:Descending",
        aggregates="age:first(age,1,true)\nrnk:rank(,,true)",
    )
    lineage = describe_plan(plan, ["id", "lastname", "profession", "age"])
    assert set(lineage) == {"id", "lastname", "profession", "age", "rnk"}
    assert lineage["id"] == "passed through unchanged"
    assert "replaces input column" in lineage["age"]
    assert "FIRST" in lineage["age"] and "age Descending" in lineage["age"]
    assert "appended" in lineage["rnk"]


def test_write_compacted_parquet_hits_file_target(spark, sf_dir, tmp_path):
    """A many-partition frame lands as the computed number of parquet
    files (both coalesce and shuffle modes), and the data round-trips."""
    from window_aggregation_spark.sources.io import (
        read_table,
        write_compacted_parquet,
    )

    df = read_table(spark, sf_dir, "lineitem").repartition(24)
    out = tmp_path / "compacted"
    n = write_compacted_parquet(df, str(out), target_mb=512)
    files = [p for p in out.glob("*.parquet")]
    assert len(files) == n
    assert n < 24  # actually compacted below the task count
    assert spark.read.parquet(str(out)).count() == df.count()

    # shuffle mode: force a multi-file target by replicating the frame
    big = df
    for _ in range(4):
        big = big.unionByName(big)  # 16x rows -> estimate well over 1 MB
    out2 = tmp_path / "compacted_even"
    n2 = write_compacted_parquet(
        big, str(out2), target_mb=1, parquet_ratio=1.0, shuffle=True
    )
    assert len(list(out2.glob("*.parquet"))) == n2 > 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_compacted_parquet(df, str(out), target_mb=0)

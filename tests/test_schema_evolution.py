"""read_parquet_evolved: union-by-name merge across batches, the
explicit-schema scale path, and the type-conflict contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.io import read_parquet_evolved


@pytest.fixture(scope="module")
def evo_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("evo"))
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, old string"
    ).write.parquet(f"{base}/v1")
    spark.createDataFrame(
        [(3, 1.5), (4, 2.5)], "id bigint, new double"
    ).write.parquet(f"{base}/v2")
    return base


def test_union_by_name_null_fills(spark, evo_dir):
    out = read_parquet_evolved(spark, f"{evo_dir}/v1", f"{evo_dir}/v2")
    assert set(out.columns) == {"id", "old", "new"}
    rows = {r.id: (r.old, r.new) for r in out.collect()}
    assert rows[1] == ("a", None)
    assert rows[3] == (None, 1.5)


def test_explicit_schema_skips_footer_sweep(spark, evo_dir):
    out = read_parquet_evolved(
        spark, f"{evo_dir}/v1", f"{evo_dir}/v2",
        schema="id bigint, old string, new double",
    )
    assert out.count() == 4
    rows = {r.id: (r.old, r.new) for r in out.collect()}
    assert rows[2] == ("b", None) and rows[4] == (None, 2.5)


def test_conflicting_types_raise(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("evo_conflict"))
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.parquet(
        f"{base}/v1"
    )
    spark.createDataFrame([(2, 2.0)], "id bigint, v double").write.parquet(
        f"{base}/v2"
    )
    with pytest.raises(Exception, match="[Mm]erge|[Cc]onflict|[Ss]chema"):
        read_parquet_evolved(spark, f"{base}/v1", f"{base}/v2").collect()

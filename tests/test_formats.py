"""Multi-format source/sink round-trips (sources/formats.py).

Each format round-trips a typed DataFrame through disk; partitioned writes
must produce a prunable directory layout; schemaless formats must refuse
inference-by-default.
"""

from __future__ import annotations

import os

import pytest

from covid_19_data_engineering_spark.sources.formats import read_table, write_table

SCHEMA = "k long, name string, price double, flag boolean"


@pytest.fixture()
def sample(spark):
    rows = [(1, "alpha", 1.5, True), (2, "beta", 2.25, False),
            (3, "gamma", -0.5, True), (4, "delta", 0.0, None)]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_round_trip(fmt, spark, sample, tmp_path):
    path = str(tmp_path / f"rt_{fmt}")
    write_table(sample, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt,
                      schema=None if fmt in ("parquet", "orc") else SCHEMA)
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in sample.collect())
    assert got == want
    assert dict(back.dtypes) == dict(sample.dtypes)


def test_partitioned_write_prunes_layout(spark, sample, tmp_path):
    path = str(tmp_path / "parts")
    write_table(sample, path, fmt="parquet", partition_by=("flag",))
    dirs = {d for d in os.listdir(path) if d.startswith("flag=")}
    assert dirs == {"flag=true", "flag=false", "flag=__HIVE_DEFAULT_PARTITION__"}
    # a filter on the partition column must become a PartitionFilter, not a scan
    df = read_table(spark, path).where("flag = true")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "isnotnull(flag" in plan
    assert {r["k"] for r in df.collect()} == {1, 3}


def test_schemaless_formats_require_schema(spark, tmp_path):
    for fmt in ("json", "csv"):
        with pytest.raises(ValueError, match="not self-describing"):
            read_table(spark, str(tmp_path), fmt=fmt)


def test_unknown_format_rejected(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        write_table(sample, str(tmp_path / "x"), fmt="avro")


def test_max_records_per_file_splits(spark, tmp_path):
    df = spark.range(1000).withColumnRenamed("id", "k")
    path = str(tmp_path / "split")
    write_table(df.repartition(1), path, fmt="parquet", max_records_per_file=100)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 10  # 1000 rows / 100-per-file cap

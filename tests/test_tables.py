"""Loader round-trip pinned to the CURRENT testdata, in a BARE SparkSession.

The testdata generator has shipped ``events.ts`` under two parquet physical
types across rounds (INT64 TIMESTAMP(NANOS), then plain timestamp[us]); a
loader hardwired to either vintage breaks every events consumer the moment
the data regenerates. These tests run in a bare ``SparkSession`` — no
``session.py`` factory, exactly the correctness driver's posture — so a
regeneration breaks pytest loudly in-round, not silently in the driver.
"""

from __future__ import annotations

import pytest

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def bare_spark():
    """A SparkSession with no ``session.py`` factory involvement.

    ``getOrCreate()`` silently REUSES any live session (e.g. the
    session-scoped conftest one when this module runs mid-suite); stopping a
    reused session would kill the shared SparkContext for every test file
    that sorts after this one.  Only stop what this fixture actually created.
    """
    from pyspark.sql import SparkSession

    reused = SparkSession.getActiveSession() is not None
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bare-loader-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    if not reused:
        spark.stop()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_loads_as_timestamp(bare_spark, sf_dir):
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from covid_19_data_engineering_spark.sources.tables import load_table

    df = load_table(bare_spark, "events", sf_dir)
    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, (TimestampType, TimestampNTZType)), ts_type


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_trivial_agg_matches_duckdb(bare_spark, sf_dir):
    """min/max/count over ts must agree with DuckDB reading the same file —
    catches both load failures and silent unit mix-ups (nanos read as micros
    would shift timestamps by 1000x)."""
    import duckdb

    import pyspark.sql.functions as F
    from covid_19_data_engineering_spark.sources.tables import load_table

    df = load_table(bare_spark, "events", sf_dir)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("lo"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("hi"),
    ).collect()[0]
    want = duckdb.sql(
        "SELECT COUNT(*), strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S'),"
        "       strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert (row["n"], row["lo"], row["hi"]) == want


def test_all_tables_load_nonempty(bare_spark):
    from covid_19_data_engineering_spark.sources.tables import TABLES, load_table

    for name in TABLES:
        df = load_table(bare_spark, name, "/root/testdata/sf0.001")
        assert df.limit(1).count() == 1, name


def test_registry_head_is_covering_set():
    """The correctness driver scores the FIRST 50 registry entries in
    insertion order; pin that prefix to the curated covering set so module
    import order can never silently evict an operator family from the
    driver's sample."""
    from covid_19_data_engineering_spark.plans import registry

    names = list(registry.all_queries())
    assert len(registry.PRIORITY) == 50
    assert names[: len(registry.PRIORITY)] == list(registry.PRIORITY)
    oracles = registry.all_oracle_sql()
    missing = [n for n in registry.PRIORITY if n not in oracles]
    assert not missing, f"priority entries without oracle: {missing}"

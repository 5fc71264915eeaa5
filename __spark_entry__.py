"""Driver contract for the spark-graft builder (PySpark target).

Fronts the engine's query registry
(``covid_19_data_engineering_spark.plans.registry``): each registered query is
a ``(spark, sf_dir) -> DataFrame`` builder paired with a DuckDB oracle SQL
twin (omitted for non-SQL-expressible operators → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import all_oracle_sql, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return all_oracle_sql()

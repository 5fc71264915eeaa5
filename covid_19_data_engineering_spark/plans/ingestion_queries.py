"""Driver-facing queries over the ingestion/inference surface.

The full ingestion pipeline (CSV -> infer -> promote -> history) is exercised
end-to-end in tests/test_pipeline.py; these registry entries expose the
inference kernel as a *queryable operator* the way the reference's offline
profiler does (data-type-pandas.py:15-31 emits TABLE,COLUMN,TYPE rows).
Non-SQL-expressible (dateutil semantics) -> rows-only driver check.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.inference import infer_table_schema
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


@register(
    "schema_profile",
    oracle=None,  # classification mirrors dateutil-backed kernel semantics
    doc="Profile a table: render every column as text, re-infer its type "
    "(reference data-type-pandas.py:15-31 profiler as a first-class operator).",
)
def schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "documents", sf_dir)
    rendered = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    inferred = infer_table_schema(rendered, mode="full")
    rows = [(c, t) for c, t in sorted(inferred.items())]
    return spark.createDataFrame(rows, "column_name string, inferred_type string")


_ORDER_COLS = ("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
               "o_orderstatus", "o_totalprice")


def column_profile(df: DataFrame) -> DataFrame:
    """Per-column completeness/cardinality profile in ONE pass: row count,
    null count, distinct count for every column, unpivoted to one row per
    column via stack(). The multi-distinct aggregate plans as a single
    Expand-based two-phase agg — one shuffle for the whole profile, not one
    job per column (the reference profiled per-file-per-column round trips,
    data-type-pandas.py:15-31)."""
    aggs = []
    for c in df.columns:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
        ]
    stacked = ", ".join(
        f"'{c}', __n_{c}, __null_{c}, __dist_{c}" for c in df.columns
    )
    return (
        df.agg(*aggs)
        .selectExpr(
            f"stack({len(df.columns)}, {stacked}) AS "
            "(column_name, n_rows, n_nulls, n_distinct)"
        )
        .orderBy("column_name")
    )


@register(
    "orders_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders""" for c in _ORDER_COLS
    ) + "\nORDER BY column_name",
    doc="Data-quality column profile of orders: completeness + cardinality "
    "for every column in one Expand-based aggregation pass.",
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return column_profile(load_table(spark, "orders", sf_dir))

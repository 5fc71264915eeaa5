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


# DuckDB twin of inference._classify_expr + resolve_column_type, per column of
# the documents table. The value-level CASE mirrors the Spark expression
# branch-for-branch (same ordering: empty -> '0'/'1' -> zero-padded ->
# integral ranges -> numeric -> boolean -> date/timestamp -> text); the outer
# CASE is the label-set lattice from inference.resolve_column_type. Known
# cross-engine edge (irrelevant for this table, documented for honesty):
# overflow literals like '1e999' floor differently (Spark FLOOR(double) is
# BIGINT, DuckDB's is DOUBLE), and timestamp-cast permissiveness differs —
# neither class of value occurs in documents.
_DEC_RE = r"'^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$'"

_CLASSIFY_SQL = f"""CASE
      WHEN v = '' THEN 'text'
      WHEN v IN ('0', '1') THEN 'smallint'
      WHEN regexp_matches(v, {_DEC_RE})
           AND TRY_CAST(v AS DOUBLE) = FLOOR(TRY_CAST(v AS DOUBLE))
           AND NOT isnan(TRY_CAST(v AS DOUBLE))
           AND v LIKE '0%' THEN 'text'
      WHEN regexp_matches(v, {_DEC_RE})
           AND TRY_CAST(v AS DOUBLE) = FLOOR(TRY_CAST(v AS DOUBLE))
           AND NOT isnan(TRY_CAST(v AS DOUBLE)) THEN
        CASE WHEN TRY_CAST(v AS DOUBLE) BETWEEN -32768 AND 32767 THEN 'smallint'
             WHEN TRY_CAST(v AS DOUBLE) BETWEEN -2147483648 AND 2147483647 THEN 'integer'
             ELSE 'bigint' END
      WHEN regexp_matches(v, {_DEC_RE}) THEN 'numeric'
      WHEN LOWER(v) IN ('true', 'false', 't', 'f') THEN 'boolean'
      WHEN TRY_CAST(v AS TIMESTAMP) IS NOT NULL
           AND date_part('hour', TRY_CAST(v AS TIMESTAMP)) = 0
           AND date_part('minute', TRY_CAST(v AS TIMESTAMP)) = 0
           AND date_part('second', TRY_CAST(v AS TIMESTAMP)) = 0 THEN 'date'
      WHEN TRY_CAST(v AS TIMESTAMP) IS NOT NULL THEN 'timestamp'
      ELSE 'text'
    END"""


def _profile_column_sql(col: str) -> str:
    return f"""SELECT '{col}' AS column_name,
      CASE
        WHEN COUNT(DISTINCT label) = 0 THEN 'text'
        WHEN COUNT(DISTINCT label) = 1 THEN MIN(label)
        WHEN MAX(CASE WHEN label = 'text' THEN 1 ELSE 0 END) = 1 THEN 'text'
        WHEN MAX(CASE WHEN label = 'timestamp' THEN 1 ELSE 0 END) = 1 THEN 'timestamp'
        WHEN MAX(CASE WHEN label = 'date' THEN 1 ELSE 0 END) = 1 THEN
          CASE WHEN MAX(CASE WHEN label = 'integer' THEN 1 ELSE 0 END) = 1
               THEN 'integer' ELSE 'text' END
        WHEN MAX(CASE WHEN label = 'numeric' THEN 1 ELSE 0 END) = 1 THEN 'numeric'
        WHEN MAX(CASE WHEN label = 'bigint' THEN 1 ELSE 0 END) = 1 THEN 'bigint'
        WHEN MAX(CASE WHEN label = 'integer' THEN 1 ELSE 0 END) = 1 THEN 'integer'
        WHEN MAX(CASE WHEN label = 'smallint' THEN 1 ELSE 0 END) = 1 THEN 'smallint'
        ELSE 'text'
      END AS inferred_type
    FROM (
      SELECT DISTINCT {_CLASSIFY_SQL} AS label
      FROM (SELECT TRIM(CAST({col} AS VARCHAR)) AS v
            FROM documents WHERE {col} IS NOT NULL)
    )"""


_DOCUMENT_COLS = ("doc_id", "lang", "n_chars", "source", "text")


@register(
    "schema_profile",
    oracle="\nUNION ALL\n".join(_profile_column_sql(c) for c in _DOCUMENT_COLS)
    + "\nORDER BY column_name",
    doc="Profile a table: render every column as text, re-infer its type "
    "(reference data-type-pandas.py:15-31 profiler as a first-class operator). "
    "Full-scan mode is exact over all rows and deterministic, so it carries a "
    "SQL oracle replicating the classification lattice.",
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

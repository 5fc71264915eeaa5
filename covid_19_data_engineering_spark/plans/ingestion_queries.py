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

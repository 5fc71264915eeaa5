"""End-to-end pipeline drivers — the reference's two entry points, Spark-first.

- ``run_daily``     (reference C6, load_tables_daily.py:562-646): land CSVs as
  all-string build tables, infer + cast types, promote build->prod, report
  counts. The reference's per-column SELECT round trips and shell COPY hops
  collapse into one Spark job per table.
- ``run_quarterly`` (reference C7, vertica_upload.py:361-398): same landing
  plus a ``load_time`` audit column and an append-only history snapshot.
  NOTE: the reference's quarterly row-insert builds its INSERT inside the row
  loop but executes it after (vertica_upload.py:108-139), silently inserting
  only the last row of each CSV. This driver implements the evident intent —
  ALL rows land — and tests/test_pipeline.py pins that as a regression test.

Every per-table unit of work is independent; at cluster scale the manifest
loop can submit tables as concurrent jobs (scheduler pools) — sequential here
for determinism, the plans are identical either way.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark import lifecycle
from covid_19_data_engineering_spark.inference import (
    apply_inferred_schema,
    infer_table_schema,
)
from covid_19_data_engineering_spark.sources.csv import (
    read_csv_landing,
    table_name_for,
)

log = logging.getLogger(__name__)


@dataclass
class LoadResult:
    table: str
    rows_loaded: int
    rows_quarantined: int
    inferred_schema: dict[str, str] = field(default_factory=dict)


def _land_one(spark: SparkSession, csv_path: str, schema: str,
              quarantine_schema: str | None = None) -> tuple[str, LoadResult, DataFrame]:
    """CSV -> typed staging table. Returns (table, result, typed_df)."""
    table = table_name_for(csv_path)
    good, bad = read_csv_landing(spark, csv_path)
    inferred = infer_table_schema(good)
    typed = apply_inferred_schema(good, inferred)
    lifecycle.write_build_table(spark, typed, schema, table)
    n_bad = 0
    if quarantine_schema is not None:
        n_bad = bad.count()
        if n_bad:
            bad.write.mode("append").format("parquet").saveAsTable(
                lifecycle.qualified(quarantine_schema, f"{table}_quarantine")
            )
    n_good = spark.table(lifecycle.qualified(schema, table + lifecycle.BUILD_SUFFIX)).count()
    return table, LoadResult(table, n_good, n_bad, inferred), typed


def run_daily(spark: SparkSession, csv_paths: list[str], schema: str = "daily",
              quarantine: bool = True) -> list[LoadResult]:
    """Daily load: land -> infer/cast -> promote -> validate."""
    lifecycle.ensure_schema(spark, schema)
    results: list[LoadResult] = []
    tables: list[str] = []
    for path in csv_paths:
        table, result, _ = _land_one(
            spark, path, schema, quarantine_schema=schema if quarantine else None
        )
        lifecycle.promote(spark, schema, table)
        results.append(result)
        tables.append(table)
        log.info("daily: %s loaded %d rows (%d quarantined)",
                 table, result.rows_loaded, result.rows_quarantined)
    report = {r["table_name"]: r["row_count"]
              for r in lifecycle.count_report(spark, schema, tables).collect()}
    for r in results:
        if report.get(r.table) != r.rows_loaded:
            raise RuntimeError(
                f"count validation failed for {r.table}: "
                f"loaded {r.rows_loaded}, prod has {report.get(r.table)}"
            )
    return results


def run_quarterly(spark: SparkSession, csv_paths: list[str],
                  schema: str = "quarterly") -> list[LoadResult]:
    """Quarterly load: land with load_time audit column -> promote ->
    history snapshot (all rows — fixing the reference's last-row-only bug)."""
    lifecycle.ensure_schema(spark, schema)
    results: list[LoadResult] = []
    for path in csv_paths:
        table = table_name_for(path)
        good, _ = read_csv_landing(spark, path)
        inferred = infer_table_schema(good)
        typed = lifecycle.with_load_time(apply_inferred_schema(good, inferred))
        lifecycle.write_build_table(spark, typed, schema, table)
        lifecycle.promote(spark, schema, table)
        lifecycle.snapshot_history(spark, schema, table)
        n = spark.table(lifecycle.qualified(schema, table)).count()
        results.append(LoadResult(table, n, 0, inferred))
        log.info("quarterly: %s loaded %d rows + history snapshot", table, n)
    return results

"""CSV ingestion — the reference's landing path, Spark-first.

The reference streams CSVs row-by-row and tolerates bad rows by logging and
continuing (load_tables_daily.py:182-203); its bulk path shells out to
COPY (load_tables_daily.py:508-558). Both collapse into one distributed
``spark.read.csv`` job here:

- every column lands as StringType (the reference's phase-1 "all text"
  posture, load_tables_daily.py:154-167) so the inference kernel owns typing;
- PERMISSIVE mode + a corrupt-record column replaces per-row error logging:
  malformed rows are split into a quarantine DataFrame instead of killing the
  load, and good rows always land (the reference's per-row continue);
- table name derives from the file name exactly like the reference
  (strip .csv, lowercase — load_tables_daily.py:345).

At 100 TB the same code holds: spark.read.csv over a directory of files
parallelizes by HDFS/S3 splits; quarantine is a second filtered write, not a
driver loop.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def table_name_for(file_path: str) -> str:
    """CSV file name -> table name (reference load_tables_daily.py:345)."""
    base = os.path.basename(file_path)
    if base.lower().endswith(".csv"):
        base = base[: -len(".csv")]
    return base.lower()


def _all_string_schema(spark: SparkSession, path: str) -> T.StructType:
    """Header-only scan (reference A1): read row 0 for column names, type
    everything text. samplingRatio/limit keep this a metadata-cheap read."""
    header = spark.read.option("header", True).csv(path).columns
    fields = [T.StructField(c, T.StringType(), True) for c in header]
    fields.append(T.StructField(CORRUPT_COL, T.StringType(), True))
    return T.StructType(fields)


def read_csv_landing(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a CSV permissively; return (good_rows, quarantined_rows).

    good_rows: all declared columns as strings, corrupt column dropped.
    quarantined_rows: the raw text of rows that failed to parse.

    Spark disallows any plan whose file-source output reduces to just the
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and that includes ``count()`` after a corrupt-column filter once pruning
    runs; the documented cache() workaround would materialize the full dataset
    — a non-starter at 100 TB. So: the good side reads DROPMALFORMED (bad rows
    skipped at the scan, the reference's per-row continue), and the quarantine
    side is an independent ``text`` scan parsed with ``from_csv`` (not subject
    to the file-source restriction). Two pushdown-friendly scans, no cache.
    """
    schema = _all_string_schema(spark, path)
    good = (
        spark.read.schema(T.StructType(schema.fields[:-1]))
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .option("multiLine", False)
        .option("escape", '"')
        .csv(path)
    )

    parse_options = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "escape": '"',
    }
    parsed = F.from_csv(F.col("value"), schema.simpleString(), parse_options)
    # Quarantine rows carry triage context, mirroring the reference's per-row
    # error log (row content + error, load_tables_daily.py:201-203): the raw
    # text, a best-effort parse-failure reason, and the source file. Line
    # numbers are deliberately absent — a distributed text scan has no stable
    # row position without a full zipWithIndex pass, a non-starter at scale.
    expected_fields = len(schema.fields) - 1  # minus the corrupt column
    quote_count = F.length(F.col("value")) - F.length(
        F.regexp_replace(F.col("value"), '"', "")
    )
    # the comma split over-counts commas inside quoted fields, but rows land
    # here only after from_csv already failed, and unbalanced quoting is
    # reported first — so the naive count is a usable arity diagnostic
    naive_fields = F.size(F.split(F.col("value"), ",", -1))
    reason = (
        F.when(quote_count % 2 != 0, F.lit("unbalanced_quote"))
        .when(
            naive_fields != expected_fields,
            F.concat(
                F.lit(f"arity_mismatch: expected {expected_fields} fields, found "),
                naive_fields.cast("string"),
            ),
        )
        .otherwise(F.lit("malformed_row"))
    )
    # header lines parse cleanly into all-string fields, so they never land
    # in the quarantine; data rows with bad quoting/arity do.
    bad = (
        spark.read.text(path)
        .where(parsed.getField(CORRUPT_COL).isNotNull())
        .select(
            F.col("value").alias("raw_record"),
            reason.alias("error_reason"),
            F.input_file_name().alias("source_file"),
        )
    )
    return good, bad


def read_manifest(manifest_path: str) -> list[str]:
    """files.list-style manifest: one CSV file name per line (reference
    vertica_upload.py:334-347)."""
    with open(manifest_path, encoding="utf-8") as fh:
        return [line.strip() for line in fh if line.strip()]

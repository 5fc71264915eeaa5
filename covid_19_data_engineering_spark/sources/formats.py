"""Multi-format source/sink layer.

The reference lands CSV only and hands storage to its warehouses
(load_tables_daily.py:508-558); a standalone engine owns its storage formats.
One read/write seam covering the formats Spark ships natively:

- ``parquet`` (default warehouse format — columnar, predicate pushdown,
  column pruning, row-group statistics);
- ``orc`` (same columnar posture, ships in Spark core);
- ``json`` (JSON-lines interchange; schema enforced on read — never
  inferSchema over 100 TB of JSON);
- ``csv`` (the reference's interchange format, header on);
- ``avro`` (row-oriented interchange; the spark-avro module doesn't ship
  in Spark core, so the container format is implemented from the public
  spec in sources/avrofmt.py — pure stdlib codec behind the Arrow seam,
  interop-pinned against the JVM Apache Avro reference implementation).

Scale posture baked in:
- writes accept ``partition_by`` (e.g. load_date) so downstream reads get
  partition pruning — the 100 TB history-table layout
  (tests/test_plans.py proves a day-filter becomes PartitionFilters);
- ``max_records_per_file`` caps file size so a 1000-executor scan gets
  balanced splits (no 10 GB straggler files);
- reads require an explicit schema for schemaless formats (json/csv):
  sampling-based inference is a full extra scan at scale, and the engine's
  own inference kernel (inference.py) owns typing policy instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv", "avro")
# formats that carry their own schema in file metadata
_SELF_DESCRIBING = ("parquet", "orc", "avro")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite", partition_by: tuple[str, ...] = (),
                max_records_per_file: int | None = None) -> None:
    """Write ``df`` at ``path`` in ``fmt``, optionally hash-partitioned into
    a directory layout that downstream scans partition-prune."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if fmt == "avro":
        if partition_by:
            raise ValueError(
                "avro sink does not support partition_by yet: use parquet "
                "for partition-pruned history layouts (SURVEY §3)")
        from covid_19_data_engineering_spark.sources.avrofmt import write_avro
        if max_records_per_file is not None:
            # honor the balanced-files contract with an explicit row-capped
            # repartition (the codec writes one container file per partition)
            n = max(1, -(-df.count() // max_records_per_file))
            df = df.repartition(n)
        write_avro(df, path, mode=mode)
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: T.StructType | str | None = None) -> DataFrame:
    """Read ``path`` as ``fmt``. Self-describing formats carry their schema;
    json/csv require one explicitly (no inference scans at scale)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if fmt == "avro":
        from covid_19_data_engineering_spark.sources.avrofmt import read_avro
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        return read_avro(spark, path, schema)
    reader = spark.read
    if fmt in _SELF_DESCRIBING:
        if schema is not None:
            reader = reader.schema(schema)
        return reader.format(fmt).load(path)
    if schema is None:
        raise ValueError(
            f"{fmt} is not self-describing: pass an explicit schema "
            "(inference over a schemaless format is a full extra scan; "
            "use the engine's inference kernel on a bounded sample instead)"
        )
    reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.format(fmt).load(path)

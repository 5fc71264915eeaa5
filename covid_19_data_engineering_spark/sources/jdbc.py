"""JDBC warehouse sink/source seam — the engine-native analogue of the
reference's live PostgreSQL/Vertica bulk loads.

The reference's actual sinks are warehouse connections: PostgreSQL
``\\COPY ... CSV HEADER`` scripts (load_tables_daily.py:508-531) and
Vertica ``COPY ... FROM LOCAL ... DELIMITER ',' SKIP 1`` scripts
(load_tables_daily.py:533-560, vertica_upload.py:62-99), both shelled
out per CSV file. The Spark-native replacement is ``DataFrameWriter
.jdbc`` — executors open parallel connections and stream batched
INSERTs — and this module owns the two things the raw writer leaves to
the caller:

- the OPTION CONTRACT (``jdbc_write_options`` / ``jdbc_read_options``):
  batch size, connection fan-out, isolation level, partitioned parallel
  reads — the knobs that decide whether a 1000-executor write melts the
  warehouse or saturates it politely;
- the DDL TYPE MAPPING (``create_table_column_types``): Spark types ->
  dialect column types, mirroring the reference's inference lattice
  (load_tables_daily.py:86-152 types columns as smallint/int/bigint/
  float/date/timestamp/varchar before loading), so the table Spark
  creates matches what the reference's DDL would have declared.

Execution posture mirrors the Kafka connector (COVERAGE.md "Kafka
connector contract"): no JDBC driver jar or live warehouse ships in
this container, so the DEFAULT tests pin the contract — option dicts,
DDL strings, and that ``write_jdbc``'s wiring reaches the JVM's
DriverManager resolution seam (the failure names the driver class, not
this module). Setting ``SPARK_GRAFT_JDBC_URL`` (plus
``SPARK_GRAFT_JDBC_DRIVER`` / ``--jars`` on the session) drives the
live path end-to-end against a real warehouse.

Scale notes (100 TB posture):
- writes cap connection fan-out with ``num_partitions`` (a coalesce on
  the write side, not a shuffle) — the warehouse's max-connections
  budget, not Spark's parallelism, is the binding constraint;
- ``batchsize`` trades round-trips for memory (JDBC executeBatch);
  10k rows/batch is the conventional warehouse-friendly default;
- reads partition on a numeric/date column (``partition_column`` +
  bounds + ``num_partitions``) so each executor reads a disjoint
  slice with its own connection — an unpartitioned JDBC read is ONE
  connection pulling the whole table through the driver;
- predicate pushdown: Spark pushes filters into the remote query
  (WHERE clauses travel to the warehouse); column pruning reaches the
  SELECT list. Aggregates do NOT push down — land raw slices and
  aggregate in Spark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ENV_URL = "SPARK_GRAFT_JDBC_URL"
ENV_DRIVER = "SPARK_GRAFT_JDBC_DRIVER"

DIALECTS = ("postgresql", "vertica")

# Spark type -> (postgresql, vertica) column type. The reference's
# inference lattice lands on exactly these warehouse types
# (load_tables_daily.py:86-152: smallint/int/bigint/float/date/
# timestamp/varchar), widened here with the types the engine itself
# carries (decimal, boolean, binary).
_TYPE_MAP: dict[str, tuple[str, str]] = {
    "byte": ("smallint", "smallint"),
    "short": ("smallint", "smallint"),
    "integer": ("integer", "integer"),
    "long": ("bigint", "bigint"),
    "float": ("real", "float"),
    "double": ("double precision", "float"),
    "boolean": ("boolean", "boolean"),
    "date": ("date", "date"),
    "string": ("text", "varchar(65000)"),
    "binary": ("bytea", "varbinary(65000)"),
}


def spark_type_to_sql(dtype: T.DataType, dialect: str = "postgresql") -> str:
    """One Spark column type -> the dialect's DDL type."""
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; supported: {DIALECTS}")
    col = 0 if dialect == "postgresql" else 1
    if isinstance(dtype, T.DecimalType):
        return f"numeric({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.TimestampType):
        return "timestamp"
    name = dtype.typeName()
    if name in _TYPE_MAP:
        return _TYPE_MAP[name][col]
    raise ValueError(
        f"no {dialect} DDL mapping for Spark type {name!r}: JDBC sinks "
        "take flat relational schemas (arrays/structs/maps stay in the "
        "lakehouse formats)")


def create_table_column_types(schema: T.StructType,
                              dialect: str = "postgresql") -> str:
    """The ``createTableColumnTypes`` option string: Spark otherwise maps
    StringType to CLOB-ish defaults some warehouses reject or store
    pathologically; this pins every column to the dialect's type."""
    return ", ".join(
        f"{f.name} {spark_type_to_sql(f.dataType, dialect)}"
        for f in schema.fields)


def jdbc_write_options(url: str, table: str, schema: T.StructType,
                       dialect: str = "postgresql",
                       batchsize: int = 10_000,
                       isolation_level: str = "READ_COMMITTED",
                       driver: str | None = None) -> dict[str, str]:
    """The full option dict a ``format('jdbc').options(**...)`` write
    uses — pinned by tests so the live path has no untested knobs."""
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
        "createTableColumnTypes": create_table_column_types(schema, dialect),
    }
    if driver:
        opts["driver"] = driver
    return opts


def jdbc_read_options(url: str, table: str,
                      partition_column: str | None = None,
                      lower_bound=None, upper_bound=None,
                      num_partitions: int | None = None,
                      fetchsize: int = 10_000,
                      driver: str | None = None) -> dict[str, str]:
    """Read-side options; with ``partition_column`` + bounds +
    ``num_partitions`` each executor pulls a disjoint slice over its own
    connection instead of one connection pulling the whole table."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError(
                "partitioned JDBC reads need partition_column, lowerBound, "
                "upperBound AND numPartitions together")
        opts.update({
            "partitionColumn": partition_column,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        })
    if driver:
        opts["driver"] = driver
    return opts


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               dialect: str = "postgresql", batchsize: int = 10_000,
               num_partitions: int | None = 8,
               isolation_level: str = "READ_COMMITTED",
               driver: str | None = None) -> None:
    """Write ``df`` into warehouse ``table`` over JDBC — the engine's
    twin of the reference's COPY-script sinks. ``num_partitions`` caps
    connection fan-out (coalesce, never a shuffle); ``mode`` follows
    Spark semantics (append / overwrite / errorifexists / ignore)."""
    if num_partitions is not None and df.rdd.getNumPartitions() > num_partitions:
        df = df.coalesce(num_partitions)
    opts = jdbc_write_options(url, table, df.schema, dialect=dialect,
                              batchsize=batchsize,
                              isolation_level=isolation_level, driver=driver)
    df.write.format("jdbc").options(**opts).mode(mode).save()


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound=None, upper_bound=None,
              num_partitions: int | None = None,
              fetchsize: int = 10_000,
              driver: str | None = None) -> DataFrame:
    """Read warehouse ``table`` over JDBC, optionally slice-partitioned."""
    opts = jdbc_read_options(url, table, partition_column=partition_column,
                             lower_bound=lower_bound,
                             upper_bound=upper_bound,
                             num_partitions=num_partitions,
                             fetchsize=fetchsize, driver=driver)
    return spark.read.format("jdbc").options(**opts).load()


def live_jdbc_url() -> str | None:
    """The env-flagged live warehouse URL (None in this container)."""
    return os.environ.get(ENV_URL)

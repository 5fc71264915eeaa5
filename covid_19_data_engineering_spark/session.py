"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
configuration below is chosen so the *same* logical plans scale to a large
cluster: AQE on (runtime shuffle coalescing + skew-join splitting), adaptive
broadcast selection, and a shuffle-partition count sized for the local box but
overridable per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that matter at 100 TB just as much as at sf0.01:
# - AQE re-plans shuffles at runtime (coalesce small partitions, split skewed
#   ones, demote/promote join strategies on observed sizes).
# - autoBroadcastJoinThreshold keeps dim tables (region/nation/supplier/part at
#   any SF, customer at small SF) on the broadcast path; big sides still SMJ.
# - Arrow execution makes the Pandas-UDF extension operators batch-vectorized.
# - session timezone pinned UTC so timestamp semantics match the DuckDB oracle.
_ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.cbo.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.legacy.createHiveTableByDefault": "false",
    # some testdata vintages ship events.ts as TIMESTAMP(NANOS), which Spark
    # rejects outright without this flag; sources.tables is vintage-adaptive
    # and converts the long nanos to TimestampType only when the parquet
    # actually reads as bigint (current vintage is timestamp[us] — no-op).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "covid19-data-engineering-spark",
              master: str | None = None,
              warehouse_dir: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Create (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes None with master preconfigured by spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_ENGINE_CONF)
    if warehouse_dir:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

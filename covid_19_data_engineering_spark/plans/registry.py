"""Registry pairing Spark query builders with DuckDB oracle SQL.

Contract (driver harness, /root/repo/__spark_entry__.py):
- builder: ``(spark, sf_dir) -> DataFrame``
- oracle : ANSI SQL over views named region/nation/customer/supplier/part/
  orders/lineitem/events/documents/embeddings, runnable by DuckDB on the same
  parquet files. Column names must match the Spark result exactly (the driver
  sorts columns by name before value-hashing).

Aggregates over doubles are ROUND()ed identically on both sides: float sums
are order-dependent in the last bits and Spark/DuckDB reduce in different
orders, so raw double aggregates would hash-mismatch spuriously.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    builder: QueryBuilder
    oracle: str | None  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = EngineQuery(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryBuilder]:
    _ensure_loaded()
    return {name: q.builder for name, q in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import-for-side-effect)."""
    global _LOADED
    if _LOADED:
        return
    import covid_19_data_engineering_spark.plans.advanced  # noqa: F401
    import covid_19_data_engineering_spark.plans.analytics  # noqa: F401
    import covid_19_data_engineering_spark.plans.relational  # noqa: F401
    import covid_19_data_engineering_spark.plans.ingestion_queries  # noqa: F401
    import covid_19_data_engineering_spark.plans.tpch  # noqa: F401
    import covid_19_data_engineering_spark.operators.dedup  # noqa: F401
    import covid_19_data_engineering_spark.operators.similarity  # noqa: F401
    import covid_19_data_engineering_spark.operators.textstats  # noqa: F401
    import covid_19_data_engineering_spark.operators.multimodal  # noqa: F401
    import covid_19_data_engineering_spark.operators.curation  # noqa: F401
    import covid_19_data_engineering_spark.operators.llmprep  # noqa: F401
    import covid_19_data_engineering_spark.operators.distrank  # noqa: F401
    import covid_19_data_engineering_spark.operators.merge  # noqa: F401
    import covid_19_data_engineering_spark.operators.clustering  # noqa: F401
    import covid_19_data_engineering_spark.operators.skew  # noqa: F401
    import covid_19_data_engineering_spark.operators.temporal  # noqa: F401
    import covid_19_data_engineering_spark.functions.udfs  # noqa: F401
    import covid_19_data_engineering_spark.streaming.events  # noqa: F401
    _LOADED = True

"""Query-plan surface: every driver-visible query registers here.

``registry`` is the single source of truth consumed by ``__spark_entry__.py``:
each entry pairs a Spark DataFrame builder with its DuckDB oracle SQL twin
(None for non-SQL-expressible operators, which get the driver's weaker
rows-only check).
"""

from covid_19_data_engineering_spark.plans.registry import (
    REGISTRY,
    EngineQuery,
    all_oracle_sql,
    all_queries,
    register,
)

__all__ = ["REGISTRY", "EngineQuery", "register", "all_queries", "all_oracle_sql"]

"""PySpark-native analytics engine with the data-processing capabilities of
tdiprima/covid-19-data-engineering, rebuilt Spark-first.

The reference (snapshot at /root/reference/) is a CSV -> PostgreSQL/Vertica ETL
pipeline; every relational operation it performs is delegated SQL. This package
owns those semantics natively on Spark:

- ``sources``    : CSV/parquet ingestion with permissive + quarantine modes
                   (reference load_tables_daily.py:154-215, 508-558)
- ``inference``  : sample-based type-inference kernel
                   (reference load_tables_daily.py:118-152, 266-327)
- ``lifecycle``  : staging/promote/history table lifecycle
                   (reference load_tables_daily.py:227-244, vertica_upload.py:190-230)
- ``plans``      : the relational query surface (scan/filter/agg/join/window/...)
                   the reference delegates to its warehouses
- ``operators``  : scale extensions — dedup, similarity search, text analysis,
                   multimodal column plumbing
- ``streaming``  : Structured Streaming views over the events table
"""

from covid_19_data_engineering_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"

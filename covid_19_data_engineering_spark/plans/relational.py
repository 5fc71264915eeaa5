"""Relational query surface with DuckDB oracle twins.

The reference delegates all relational work to PostgreSQL/Vertica as generated
SQL (SURVEY.md §2B); this module owns those semantics natively, plus the full
DataFrame surface a warehouse user of the reference would run downstream
(joins, windows, grouping sets, set ops, scalar functions).

Scale notes baked into each plan:
- dim tables (region/nation/supplier/part, and customer vs orders/lineitem)
  ride the broadcast-hash-join path — no shuffle of the fact side;
- aggregations are expressed so Catalyst emits partial (map-side) aggregation;
- filters/projections are plain column expressions that push into the parquet
  scan (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan → filter → group → agg.
# Exercises the only aggregate the reference ever emits (count(*),
# load_tables_daily.py:258) plus sum/avg, with map-side partial agg and a
# 6-group result: the shuffle moves O(groups), not O(rows), at any SF.
# --------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary report: filter on ship date, aggregate by return flag/status.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# B1: full-table cardinality — the reference's validation count
# (load_tables_daily.py:255-264). Parquet row-group metadata serves this
# without reading data pages (spark.sql.parquet.aggregatePushdown).
# --------------------------------------------------------------------------

@register(
    "count_validation",
    oracle="""
    SELECT 'lineitem' AS table_name, (SELECT COUNT(*) FROM lineitem) AS row_count
    UNION ALL SELECT 'orders',    (SELECT COUNT(*) FROM orders)
    UNION ALL SELECT 'customer',  (SELECT COUNT(*) FROM customer)
    ORDER BY table_name
    """,
    doc="Per-table count(*) validation report (reference C3, load_tables_daily.py:365-372).",
)
def count_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for name in ("lineitem", "orders", "customer"):
        rows.append(
            _t(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("row_count"))
            .select(F.lit(name).alias("table_name"), "row_count")
        )
    out = rows[0]
    for df in rows[1:]:
        out = out.unionAll(df)
    return out.orderBy("table_name")


# --------------------------------------------------------------------------
# B2: null-rejecting single-column sample — the inference pass's scan shape
# (load_tables_daily.py:287). Deterministic variant (ORDER BY + LIMIT) so the
# oracle can hash it; the projection + IS NOT NULL + limit all push into the
# parquet scan.
# --------------------------------------------------------------------------

@register(
    "column_sample",
    oracle="""
    SELECT o_totalprice
    FROM orders
    WHERE o_totalprice IS NOT NULL
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Single-column null-filtered bounded sample (reference B2, deterministic order).",
)
def column_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_totalprice").isNotNull())
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_totalprice")
    )

"""Cohort retention analysis over ``orders`` — the month-cohort retention
matrix (acquisition month x months-since) every growth/analytics stack
computes, here in a single-shuffle shape.

No reference analogue (tdiprima/covid-19-data-engineering delegates all
analytics to its warehouses); SURVEY §2 C-extensions.

100 TB shape: the corpus is reduced by ONE customer-keyed shuffle — the
distinct (custkey, month) activity grid pre-aggregates map-side, and the
cohort month comes from a window MIN over the same partitioning (no second
shuffle, no join back to the corpus). Everything after runs on the tiny
(cohort x offset) matrix; the offset-0 diagonal IS the cohort size
(every customer is active in their own acquisition month by construction),
so retention rates come from a broadcast self-join of the matrix with its
own first column rather than another pass over the data.

All quantities that cross an aggregation are integers (distinct-customer
counts); the single float (the retention rate) is one fixed-order division
rounded identically on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def cohort_retention_matrix(orders: DataFrame) -> DataFrame:
    """(cohort_month, month_offset, active_customers, cohort_size,
    retention_rate) — customers active k months after their first order
    month, for every cohort."""
    activity = (
        orders.select(
            "o_custkey",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey")
    offsets = activity.withColumn(
        "cohort_month", F.min("month").over(w)
    ).select(
        "o_custkey",
        "cohort_month",
        F.months_between(F.col("month"), F.col("cohort_month"))
        .cast("int")
        .alias("month_offset"),
    )
    matrix = offsets.groupBy("cohort_month", "month_offset").agg(
        F.countDistinct("o_custkey").alias("active_customers")
    )
    sizes = matrix.filter(F.col("month_offset") == 0).select(
        "cohort_month", F.col("active_customers").alias("cohort_size")
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "active_customers",
            "cohort_size",
            F.round(
                F.expr("CAST(active_customers AS DOUBLE) / cohort_size"), 6
            ).alias("retention_rate"),
        )
        .orderBy("cohort_month", "month_offset")
    )


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month
      FROM orders
    ),
    offsets AS (
      SELECT o_custkey,
             MIN(month) OVER (PARTITION BY o_custkey) AS cohort_month,
             datediff('month',
                      MIN(month) OVER (PARTITION BY o_custkey),
                      month) AS month_offset
      FROM activity
    ),
    matrix AS (
      SELECT cohort_month, CAST(month_offset AS INTEGER) AS month_offset,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers
      FROM offsets GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_month, active_customers AS cohort_size
      FROM matrix WHERE month_offset = 0
    )
    SELECT m.cohort_month, m.month_offset, m.active_customers,
           s.cohort_size,
           ROUND(CAST(m.active_customers AS DOUBLE) / s.cohort_size, 6)
             AS retention_rate
    FROM matrix m JOIN sizes s ON m.cohort_month = s.cohort_month
    ORDER BY m.cohort_month, m.month_offset
    """,
    doc="Month-cohort retention matrix over orders: customers active k "
    "months after their acquisition month, per cohort, with rates off the "
    "offset-0 diagonal (which IS the cohort size by construction). One "
    "customer-keyed shuffle reduces the corpus — the distinct activity "
    "grid pre-aggregates map-side and the cohort month is a window MIN "
    "over the same partitioning — then everything runs on the tiny "
    "cohort x offset matrix with a broadcast self-join for the rates.",
)
def cohort_retention_matrix_query(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    return cohort_retention_matrix(load_table(spark, "orders", sf_dir))


# --------------------------------------------------------------------------
# Inter-purchase gap profile — the repeat-purchase cadence behind every
# retention/LTV model: per customer, the gaps between consecutive
# orders; reported as an exact day-bucket histogram plus exact integer
# summary moments.
# --------------------------------------------------------------------------

_GAP_BUCKETS = ((0, 7), (8, 30), (31, 90), (91, 365), (366, 10**9))
_GAP_LABELS = ("0-7d", "8-30d", "31-90d", "91-365d", "365d+")


def interpurchase_gaps(orders: DataFrame) -> DataFrame:
    """(bucket, n_gaps, share, mean_gap_days) — consecutive-order gap
    histogram over fixed day buckets, with each bucket's exact mean gap.

    One customer-keyed lag window produces the gaps (exact integer
    days); the rollup is map-side combined over 5 bucket keys; shares
    and means are fixed-order doubles over exact BIGINTs. 100 TB shape:
    the window partitions by customer (state = one prior row), the tail
    is O(buckets).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey", "o_orderkey",
            F.expr("CAST(o_orderdate AS DATE)").alias("d"),
        )
        .withColumn("gap", F.expr(
            "datediff(d, lag(d) OVER (PARTITION BY o_custkey "
            "ORDER BY d, o_orderkey))"))
        .where(F.col("gap").isNotNull())
    )
    bucket = F.when(F.col("gap") <= 7, _GAP_LABELS[0])
    for (lo, hi), lab in zip(_GAP_BUCKETS[1:], _GAP_LABELS[1:]):
        bucket = bucket.when((F.col("gap") >= lo) & (F.col("gap") <= hi),
                             lab)
    hist = (
        gaps.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_gaps"),
             F.sum("gap").alias("gap_days"))
    )
    total = hist.agg(F.sum("n_gaps").alias("n_total"))
    return (
        hist.crossJoin(F.broadcast(total))
        .selectExpr(
            "bucket",
            "CAST(n_gaps AS BIGINT) AS n_gaps",
            "ROUND(CAST(n_gaps AS DOUBLE) / n_total, 6) AS share",
            "ROUND(CAST(gap_days AS DOUBLE) / n_gaps, 4) AS mean_gap_days",
        )
        .orderBy("bucket")
    )


@register(
    "customer_interpurchase_gaps",
    oracle=f"""
    WITH gaps AS (
      SELECT datediff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ),
    labeled AS (
      SELECT CASE
        WHEN gap <= 7 THEN '{_GAP_LABELS[0]}'
        WHEN gap <= 30 THEN '{_GAP_LABELS[1]}'
        WHEN gap <= 90 THEN '{_GAP_LABELS[2]}'
        WHEN gap <= 365 THEN '{_GAP_LABELS[3]}'
        ELSE '{_GAP_LABELS[4]}' END AS bucket, gap
      FROM gaps WHERE gap IS NOT NULL
    ),
    hist AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS gap_days
      FROM labeled GROUP BY bucket
    )
    SELECT bucket, n_gaps,
           ROUND(CAST(n_gaps AS DOUBLE)
                 / (SELECT SUM(n_gaps) FROM hist), 6) AS share,
           ROUND(CAST(gap_days AS DOUBLE) / n_gaps, 4) AS mean_gap_days
    FROM hist ORDER BY bucket
    """,
    doc="Repeat-purchase cadence: consecutive-order gaps per customer "
    "(one customer-keyed lag window, exact integer days) rolled into a "
    "fixed day-bucket histogram with per-bucket shares and exact mean "
    "gaps — the retention/LTV input, O(buckets) tail after one "
    "bounded-state window.",
)
def customer_interpurchase_gaps(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    return interpurchase_gaps(load_table(spark, "orders", sf_dir))

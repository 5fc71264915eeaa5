"""Kaplan-Meier survival estimation over ``orders`` — the time-to-churn
curve (customer lifetime in months, right-censored by the observation
horizon) that subscription/retention analytics runs beside the cohort
matrix. No reference analogue (tdiprima/covid-19-data-engineering
delegates all analytics to its warehouses); SURVEY §2 C-extensions.

Semantics: a customer's lifetime runs from their first order month to
their last; the churn event is observed only when the last order sits at
least CENSOR_MONTHS before the corpus horizon (otherwise the lifetime is
right-censored — the customer may still be active). The KM estimator over
the distinct lifetime durations t is

    S(t) = prod_{s <= t, d_s > 0} (1 - d_s / n_s)

with d_s churn events at duration s and n_s the at-risk count (everyone
whose lifetime, censored or not, is >= s).

Float-parity strategy: the corpus reduces to exact BIGINT (duration,
events, censored) triples via one customer-keyed shuffle + one tiny
duration groupBy; at-risk counts are an integer reverse-cumulative window
(order-independent). The product is carried as a cumulative sum of
ln((n_s - d_s)/n_s) terms ROUNDED TO FIXED POINT per step (1e-12 units),
so the cumulative BIGINT sum is association-order-independent and the
final exp is a deterministic function of exact integers on both engines.
The d_s = n_s boundary (everyone at risk dies -> S = 0, where ln blows
up) is handled by an explicit cumulative flag rather than IEEE -inf.

100 TB shape: one customer-keyed map-side-combined groupBy is the only
corpus-wide work; every window runs over O(distinct durations) rows
(bounded by calendar months, never customers).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

CENSOR_MONTHS = 12
# fixed-point scale for ln survival terms: |ln((n-d)/n)| <= ln(n) ~ 21 at
# 1e9 customers, so 1e12 units keep 12 decimals inside BIGINT across any
# realistic number of curve steps
_LN_FX = 1_000_000_000_000


def kaplan_meier_lifetimes(orders: DataFrame,
                           censor_months: int = CENSOR_MONTHS) -> DataFrame:
    """(duration_months, n_risk, n_churned, n_censored, survival) — the
    KM curve over customer order-lifetime months."""
    horizon = orders.agg(
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hm")
    )
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.date_trunc("month", F.min("o_orderdate")).cast("date")
            .alias("fm"),
            F.date_trunc("month", F.max("o_orderdate")).cast("date")
            .alias("lm"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.months_between(F.col("lm"), F.col("fm")).cast("int")
            .alias("duration_months"),
            (F.months_between(F.col("hm"), F.col("lm"))
             >= censor_months).cast("long").alias("event"),
        )
    )
    life = cust.groupBy("duration_months").agg(
        F.sum("event").alias("n_churned"),
        F.sum(1 - F.col("event")).alias("n_censored"),
    )
    w_desc = Window.orderBy(F.desc("duration_months"))  # O(months) rows
    w_asc = Window.orderBy("duration_months")
    risk = life.withColumn(
        "n_risk",
        F.sum(F.col("n_churned") + F.col("n_censored")).over(w_desc),
    )
    stepped = (
        risk.withColumn(
            "term_fx",
            F.when(
                (F.col("n_churned") > 0)
                & (F.col("n_churned") < F.col("n_risk")),
                F.expr(
                    f"CAST(round(ln(CAST(n_risk - n_churned AS DOUBLE) "
                    f"/ n_risk) * {_LN_FX}) AS BIGINT)"
                ),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "dead",
            F.max((F.col("n_churned") == F.col("n_risk")).cast("int"))
            .over(w_asc),
        )
        .withColumn("cum_fx", F.sum("term_fx").over(w_asc))
    )
    return stepped.select(
        "duration_months",
        "n_risk",
        "n_churned",
        "n_censored",
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.expr(f"exp(CAST(cum_fx AS DOUBLE) / {_LN_FX})"), 6)
        )
        .alias("survival"),
    ).orderBy("duration_months")


@register(
    "customer_lifetime_km",
    oracle=f"""
    WITH horizon AS (
      SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hm
      FROM orders
    ),
    cust AS (
      SELECT datediff('month',
                      CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
                      CAST(date_trunc('month', MAX(o_orderdate)) AS DATE))
               AS duration_months,
             CASE WHEN datediff('month',
                       CAST(date_trunc('month', MAX(o_orderdate)) AS DATE),
                       (SELECT hm FROM horizon)) >= {CENSOR_MONTHS}
                  THEN 1 ELSE 0 END AS event
      FROM orders GROUP BY o_custkey
    ),
    life AS (
      SELECT CAST(duration_months AS INTEGER) AS duration_months,
             CAST(SUM(event) AS BIGINT) AS n_churned,
             CAST(SUM(1 - event) AS BIGINT) AS n_censored
      FROM cust GROUP BY 1
    ),
    risk AS (
      SELECT *,
             CAST(SUM(n_churned + n_censored)
                  OVER (ORDER BY duration_months DESC) AS BIGINT) AS n_risk
      FROM life
    ),
    stepped AS (
      SELECT *,
             CASE WHEN n_churned > 0 AND n_churned < n_risk
                  THEN CAST(round(ln(CAST(n_risk - n_churned AS DOUBLE)
                                     / n_risk) * {_LN_FX}) AS BIGINT)
                  ELSE 0 END AS term_fx,
             MAX(CASE WHEN n_churned = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY duration_months) AS dead
      FROM risk
    )
    SELECT duration_months, n_risk, n_churned, n_censored,
           CASE WHEN dead = 1 THEN 0.0
                ELSE ROUND(exp(CAST(SUM(term_fx)
                                    OVER (ORDER BY duration_months)
                                    AS DOUBLE) / {_LN_FX}), 6)
           END AS survival
    FROM stepped
    ORDER BY duration_months
    """,
    doc=f"Kaplan-Meier survival curve over customer order lifetimes "
    f"(months from first to last order, right-censored within "
    f"{CENSOR_MONTHS} months of the corpus horizon): one customer-keyed "
    "map-side-combined groupBy reduces the corpus to exact integer "
    "(duration, churned, censored) triples; at-risk counts are an integer "
    "reverse-cumulative window and the KM product is a cumulative sum of "
    "per-step fixed-point ln terms (1e-12 units), so the curve is "
    "engine-identical — with the everyone-dies boundary handled by an "
    "explicit flag, not IEEE -inf. All windows run over O(calendar-"
    "months) rows.",
)
def customer_lifetime_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kaplan_meier_lifetimes(load_table(spark, "orders", sf_dir))

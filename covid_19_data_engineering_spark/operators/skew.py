"""Skew-handling utilities: salted aggregation and salted join.

AQE's skew-join splitting handles most runtime skew; these are the explicit
tools for the pathological cases AQE can't fix — a groupBy where one key is
half the table (partial aggregation already collapses per-partition
duplicates, but a salted two-phase agg also spreads the REDUCE side), and a
shuffle join against a hot key.

Mechanics:
- salted agg: groupBy(key, salt) -> partial per-salt results -> groupBy(key)
  merge. Two small shuffles instead of one skewed one.
- salted join: replicate the small side R times (R = salt fanout), salt the
  big side uniformly; the hot key's rows spread over R reducers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def salted_sum(df: DataFrame, key: str, value: str, out: str,
               fanout: int = 16) -> DataFrame:
    """Two-phase salted sum: same result as groupBy(key).sum(value), but the
    first shuffle spreads each key over ``fanout`` reducers."""
    salt = (F.crc32(F.monotonically_increasing_id().cast("string")) % fanout).alias("_salt")
    partial = (
        df.select(F.col(key), F.col(value), salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                fanout: int = 16) -> DataFrame:
    """Inner equi-join where ``big`` has hot keys: salt the big side
    uniformly, explode the small side across all salt values, join on
    (key, salt). Each hot key spreads over ``fanout`` reducers."""
    big_salted = big.withColumn(
        "_salt", (F.crc32(F.monotonically_increasing_id().cast("string")) % fanout).cast("int")
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(fanout)]))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")


@register(
    "salted_lineitem_revenue",
    oracle="""
    -- DECIMAL sum: exact and order-independent, so the salted two-phase
    -- reduce can't drift a ULP from the oracle's single-phase sum
    SELECT l_suppkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,6))), 2) AS DOUBLE)
             AS supplier_revenue
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
    doc="Salted two-phase aggregation (16-way) — byte-identical to the plain "
    "groupBy, but each key's reduce work spreads over 16 partitions.",
)
def salted_lineitem_revenue(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "l_extendedprice", F.col("l_extendedprice").cast("decimal(20,6)")
    )
    out = salted_sum(li, key="l_suppkey", value="l_extendedprice", out="_sum", fanout=16)
    return out.select(
        "l_suppkey", F.round("_sum", 2).cast("double").alias("supplier_revenue")
    ).orderBy("l_suppkey")

"""Distributed global ranking without a single-partition window.

``order_price_distribution_ranks`` (plans/relational.py) computes
ntile/percent_rank/cume_dist with ``Window.orderBy(...)`` — the documented
anti-pattern: Spark plans it as ``Exchange SinglePartition``, so one task
sorts every row. Correct at any SF, impossible at 100 TB.

This module is the scale redesign (the classic distributed-rank
composition), entirely inside one Catalyst plan — no driver-side collect:

1. a 1-row min/max aggregate fixes B uniform bucket boundaries
   (broadcast); at heavy value skew substitute approxQuantile boundaries —
   the plan shape is identical;
2. rows hash-shuffle ONCE on their bucket; a per-bucket window computes
   local ranks over (key, tiebreak);
3. bucket counts (O(B) rows) get prefix-summed by a window over the tiny
   bucket table — the only "single partition" sort left is over B rows,
   not n;
4. global rank = local rank + broadcast offset, and ntile/percent_rank/
   cume_dist are pure arithmetic on (rank, total).

The ntile arithmetic replicates SQL NTILE(k) exactly: q = n div k,
r = n mod k, the first r buckets take q+1 rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

N_RANK_BUCKETS = 64


def with_global_rank(df: DataFrame, value_col: str, tiebreak_col: str,
                     n_buckets: int = N_RANK_BUCKETS) -> DataFrame:
    """Attach ``global_rank`` (1-based, dense over the unique
    (value, tiebreak) ordering) and ``total`` to every row, with no
    single-partition exchange over the data."""
    v, t = F.col(value_col), F.col(tiebreak_col)

    stats = df.agg(
        F.min(v).cast("double").alias("_mn"), F.max(v).cast("double").alias("_mx")
    )
    # width_bucket is right-exclusive per bucket; +1 on the upper bound keeps
    # the max value inside bucket n_buckets instead of the overflow slot
    bucketed = df.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.width_bucket(v.cast("double"), F.col("_mn"), F.col("_mx") + 1, n_buckets),
    )

    local_w = Window.partitionBy("_bkt").orderBy(v, t)
    ranked = bucketed.withColumn("_local_rank", F.row_number().over(local_w))

    counts = ranked.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    tiny_w = Window.orderBy("_bkt")  # O(n_buckets) rows — harmless
    offsets = counts.select(
        "_bkt",
        (F.sum("_cnt").over(tiny_w) - F.col("_cnt")).alias("_offset"),
        F.sum("_cnt").over(tiny_w.rowsBetween(Window.unboundedPreceding,
                                              Window.unboundedFollowing)).alias("total"),
    )

    return (
        ranked.join(F.broadcast(offsets), "_bkt")
        .withColumn("global_rank", (F.col("_local_rank") + F.col("_offset")).cast("long"))
        .drop("_bkt", "_mn", "_mx", "_local_rank", "_offset")
    )


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """SQL NTILE(k) replayed as arithmetic on a precomputed global rank:
    q = total div k and r = total mod k; the first r buckets hold q+1 rows."""
    q = F.floor(total / k)
    r = total % k
    head = r * (q + 1)
    return (
        F.when(rank <= head, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - head) / F.greatest(q, F.lit(1))))
        .cast("int")
    )


@register(
    "order_price_ranks_scalable",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="Scale twin of order_price_distribution_ranks: identical output "
    "(same oracle), but ntile/percent_rank/cume_dist derive from a "
    "distributed bucket+offset global rank — no single-partition window "
    "anywhere in the plan (pinned by tests/test_plans.py).",
)
def order_price_ranks_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    ranked = with_global_rank(o, "o_totalprice", "o_orderkey")
    rank, total = F.col("global_rank"), F.col("total")
    return (
        ranked.select(
            "o_orderkey",
            ntile_from_rank(rank, total, 4).alias("quartile"),
            # unique ordering (orderkey tiebreak) => rank has no ties, so
            # percent_rank = (rank-1)/(n-1) and cume_dist = rank/n exactly
            F.round((rank - 1) / (total - 1), 6).alias("pct_rank"),
            F.round(rank / total, 6).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Spearman rank correlation, built on the distributed ranking above — the
# robust (monotone, outlier-proof) correlation a profiler wants next to
# Pearson, and the classic "needs global ranks" operator that looks
# un-distributable until the bucket+offset decomposition pays off twice.
# --------------------------------------------------------------------------


def spearman(df: DataFrame, col_a: str, col_b: str,
             key_expr: str) -> DataFrame:
    """One-row (n_rows, spearman_rho) for ``col_a`` vs ``col_b``.

    Both columns are ranked with ``with_global_rank`` (deterministic
    total order via the ``key_expr`` tiebreak, so ranks are exact
    permutations of 1..n and rho = 1 - 6*sum(d^2)/(n(n^2-1)) holds with
    no tie correction). d^2 sums as DECIMAL(38,0) — exact to n ~ 4.6e12
    rows — and only the final rho expression touches doubles, with the
    identical shape on both engines. Two bucket+offset rankings (each:
    one corpus shuffle + an O(buckets) window), one join on the surrogate
    key, one 1-row aggregate. No single-partition sort anywhere.
    """
    base = df.select(F.expr(key_expr).alias("_k"),
                     F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    ra = with_global_rank(base.select("_k", "_a"), "_a", "_k") \
        .select("_k", F.col("global_rank").alias("ra"))
    rb = with_global_rank(base.select("_k", "_b"), "_b", "_k") \
        .select("_k", F.col("global_rank").alias("rb"), )
    return (
        ra.join(rb, "_k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST((ra - rb) * (ra - rb) AS DECIMAL(38,0))"))
            .alias("_sd2"),
        )
        .select(
            "n_rows",
            F.round(F.expr(
                "1 - 6 * CAST(_sd2 AS DOUBLE) / (CAST(n_rows AS DOUBLE) * "
                "(CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE) - 1))"), 6)
            .alias("spearman_rho"),
        )
    )


@register(
    "price_quantity_spearman",
    oracle="""
    WITH base AS (
      SELECT l_orderkey * 8 + l_linenumber AS k,
             l_quantity AS a, l_extendedprice AS b
      FROM lineitem
    ),
    ra AS (
      SELECT k, ROW_NUMBER() OVER (ORDER BY a, k) AS ra FROM base
    ),
    rb AS (
      SELECT k, ROW_NUMBER() OVER (ORDER BY b, k) AS rb FROM base
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(1 - 6 * CAST(SUM(CAST((ra - rb) * (ra - rb)
                                       AS DECIMAL(38,0))) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) *
                    (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
                     - 1)), 6) AS spearman_rho
    FROM ra JOIN rb USING (k)
    """,
    doc="Spearman rank correlation of quantity vs extended price: both "
    "columns ranked via the bucket+offset distributed ranking (exact "
    "1..n permutations under a deterministic surrogate-key tiebreak, so "
    "the classic 1 - 6*sum(d^2)/(n(n^2-1)) identity applies), d^2 summed "
    "exactly in DECIMAL(38,0), doubles only in the final one-row "
    "expression. The monotone, outlier-proof correlation — computed with "
    "two corpus shuffles and zero single-partition sorts, where the "
    "textbook formulation needs two global orderings.",
)
def price_quantity_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return spearman(li, "l_quantity", "l_extendedprice",
                    "l_orderkey * 8 + l_linenumber")

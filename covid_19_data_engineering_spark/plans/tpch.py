"""TPC-H-shape battery: the classic decision-support query patterns the
reference's downstream warehouses (PostgreSQL/Vertica) would have answered for
analysts, re-expressed natively (SURVEY.md §2 "delegated relational
operators"; the reference itself only ever emits count(*)/IS NOT NULL SQL —
/root/reference/load_tables_daily.py:258,287).

The driver testdata is TPC-H-ish but lacks ``partsupp`` and several comment /
address / shipmode columns, so each query is the canonical TPC-H *shape*
adapted to the available schema (FIXTURES.md §A), not a verbatim spec port.
Already-covered shapes live elsewhere (Q1 ≈ pricing_summary, Q3 ≈
shipping_priority_topk, Q4 ≈ late_shipment_orders, Q5 ≈ revenue_by_nation,
Q14 ≈ promo_revenue_share); this module adds the distinctive remaining ones:

- Q7  volume shipping between two nations (dual-nation join + year rollup)
- Q8  market share of one supplying nation inside a region's market
- Q10 returned-item revenue ranking (top-k customers by refund exposure)
- Q13 customer order-count distribution (outer join + histogram-of-counts)
- Q17 small-quantity-order revenue vs per-part average (pre-agg + join,
      the decorrelated form of TPC-H's correlated scalar subquery)
- Q18 large-volume customers (HAVING-filtered semi join into the fact)
- Q19 disjunctive multi-predicate revenue (OR-of-ANDs pushed to one scan)

Scale notes (100 TB posture):
- Every query broadcasts only dimension tables (nation ≤25 rows, filtered
  part subsets); facts join facts on their natural shuffle key (orderkey) or
  pre-aggregate to O(groups) before joining.
- Q17/Q18 pre-aggregate lineitem ONCE on its shuffle key and join the tiny
  result back — never a correlated per-row subquery, never a second scan.
- Q19's OR-of-ANDs is a single predicate on one scan: Catalyst pushes the
  shared ``p_brand IN (...)`` prefix down; no union-of-scans blowup.
- Float determinism vs DuckDB follows the repo patterns: exact
  DECIMAL(20,6) partial sums (order-independent), ratios via identical IEEE
  double ops on both engines (plans/advanced.py:44-52).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _dec(col: Column) -> Column:
    return col.cast("decimal(20,6)")


def _rev() -> Column:
    """Per-row revenue in exact decimal units: the double product is computed
    identically on both engines, the decimal sum is order-independent."""
    return _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))"


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations.
# --------------------------------------------------------------------------

@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           YEAR(l_shipdate) AS l_year,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by ship "
    "year. supplier+nation and customer+nation resolve via broadcasts; the "
    "only fact-fact shuffle is lineitem⋈orders on orderkey. The disjunctive "
    "nation-pair filter applies before the group-by, so the aggregate "
    "carries O(2 nations × years) groups.",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share inside a region's market.
# --------------------------------------------------------------------------

@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_volumes AS (
      SELECT YEAR(o_orderdate) AS o_year,
             SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_SQL}
                      ELSE CAST(0 AS DECIMAL(20,6)) END) AS nation_dec,
             SUM({_REV_SQL}) AS total_dec
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      GROUP BY o_year
    )
    SELECT o_year,
           CAST(ROUND(total_dec, 2) AS DOUBLE) AS total_revenue,
           FLOOR(CAST(nation_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS mkt_share
    FROM all_volumes
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_3's share of the ASIA STANDARD-part market "
    "by order year. One pass computes conditional and total exact-decimal "
    "sums together (no second scan for the denominator); the share divides "
    "identical doubles on both engines. All dims broadcast; the fact-fact "
    "shuffle is lineitem⋈orders on orderkey.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    r = (
        _t(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    zero = F.lit(0).cast("decimal(20,6)")
    agg = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero)
            ).alias("nation_dec"),
            F.sum(_rev()).alias("total_dec"),
        )
    )
    return agg.select(
        "o_year",
        F.round(F.col("total_dec"), 2).cast("double").alias("total_revenue"),
        (
            F.floor(
                F.col("nation_dec").cast("double")
                / F.col("total_dec").cast("double")
                * F.lit(1000000)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("mkt_share"),
    ).orderBy("o_year")


# --------------------------------------------------------------------------
# Q10 — returned-item revenue ranking.
# --------------------------------------------------------------------------

@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS lost_revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by revenue on returned items in "
    "one order year. Return-flag and date filters hit the scans "
    "(PushedFilters); the orderkey shuffle joins the filtered facts; "
    "customer/nation broadcast; TakeOrderedAndProject caps driver transfer "
    "at O(20).",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution.
# --------------------------------------------------------------------------

@register(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: histogram of per-customer order counts (customers "
    "with zero orders included via the outer join; in-progress orders "
    "excluded by the join-side predicate, preserving the left row). Two "
    "aggregations: the first shuffles on custkey, the second over O(distinct "
    "counts) rows — the histogram step is effectively free.",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    cond = (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (decorrelated per-part average).
# --------------------------------------------------------------------------

@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS pa_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pa_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < qty_threshold
    """,
    doc="TPC-H Q17 shape, decorrelated: the per-part average quantity is "
    "computed ONCE as a pre-aggregation on lineitem's own partkey (one "
    "shuffle, O(parts) output) and joined back — never a correlated per-row "
    "subquery. The brand filter prunes part before its broadcast. "
    "l_quantity values are integral doubles, so AVG is exact on both "
    "engines; the revenue sum is exact decimal.",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("pa_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.round(F.sum(_dec(F.col("l_extendedprice"))) / F.lit(7.0), 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers.
# --------------------------------------------------------------------------

@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    WITH big_orders AS (
      SELECT l_orderkey AS bo_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM big_orders
    JOIN orders   ON o_orderkey = bo_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: customers whose single orders exceed 300 total "
    "units. The HAVING pre-aggregation reduces lineitem to O(qualifying "
    "orders) BEFORE any join (quantity sums are exact: integral doubles); "
    "the tiny qualifying set then joins orders on its natural key and "
    "broadcasts customer. TakeOrderedAndProject caps output at 100 rows.",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bo_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(o, F.col("bo_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive multi-predicate revenue.
# --------------------------------------------------------------------------

@register(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape: OR-of-AND predicate blocks over a part⋈lineitem "
    "join, answered in ONE scan of each table (no union-of-queries blowup). "
    "Catalyst derives the implied p_brand IN (...) prefix for partition/scan "
    "pruning on the broadcast-side part table; the residual disjunction "
    "evaluates inside whole-stage codegen after the join.",
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    blocks = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(blocks)
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )

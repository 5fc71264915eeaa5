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

# --------------------------------------------------------------------------
# Joins. Dim side (nation/region, and customer against the order fact) rides
# broadcast-hash-join; the lineitem fact is never shuffled for a dim lookup.
# At 100 TB the same plans hold: AQE demotes to sort-merge only if a "dim"
# outgrows the broadcast threshold, and the equi-keys are the natural
# bucketing/partition keys for co-located storage.
# --------------------------------------------------------------------------

@register(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    doc="5-way star join: fact -> orders -> customer -> nation -> region, dims broadcast.",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    doc="Left-semi join (EXISTS): customers holding at least one big order.",
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "order_fill_outer",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.cnt, 0) AS order_count
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    ORDER BY order_count DESC, c_custkey
    LIMIT 200
    """,
    doc="Left outer join against a pre-aggregated fact (agg pushed below the join).",
)
def order_fill_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", F.coalesce("cnt", F.lit(0)).alias("order_count"))
        .orderBy(F.col("order_count").desc(), "c_custkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Window functions. partitionBy keys are the shuffle keys; a total ORDER
# BY tiebreak keeps results deterministic for the oracle hash.
# --------------------------------------------------------------------------

@register(
    "top_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Per-group top-k via row_number window.",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           LAG(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Running sum + lag over per-customer order history.",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2
            ).alias("running_spend"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "segment_price_rank",
    oracle="""
    SELECT c_mktsegment,
           o_orderkey,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC) AS price_rank,
           ROUND(o_totalprice - AVG(o_totalprice) OVER (PARTITION BY c_mktsegment), 2) AS delta_vs_segment
    FROM orders JOIN customer ON o_custkey = c_custkey
    QUALIFY price_rank <= 5
    ORDER BY c_mktsegment, price_rank, o_orderkey
    """,
    doc="Rank + windowed avg delta per market segment (join then window).",
)
def segment_price_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc())
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            F.rank().over(w).alias("price_rank"),
            F.round(
                F.col("o_totalprice") - F.avg("o_totalprice").over(Window.partitionBy("c_mktsegment")), 2
            ).alias("delta_vs_segment"),
        )
        .where(F.col("price_rank") <= 5)
        .orderBy("c_mktsegment", "price_rank", "o_orderkey")
    )


@register(
    "trailing_30d_spend",
    oracle="""
    -- RANGE frame over epoch days: trailing-30-day window per customer.
    -- 2-decimal money sums round exactly (true sums are representable
    -- 2-decimal values, never on a .005 boundary)
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="RANGE-frame window: trailing 30-day spend per customer (value-based "
    "frame over epoch days, not row counts).",
)
def trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "order_price_distribution_ranks",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="Distribution window battery: ntile / percent_rank / cume_dist over a "
    "global price ordering. Backed by the distributed bucket+offset rank "
    "(operators/distrank.py) so no registered plan contains a fact-size "
    "single-partition sort; the naive Window.orderBy form survives below as "
    "the unregistered pytest equivalence baseline.",
)
def order_price_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_19_data_engineering_spark.operators.distrank import (
        order_price_ranks_scalable,
    )

    return order_price_ranks_scalable(spark, sf_dir)


def order_price_distribution_ranks_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNREGISTERED anti-pattern twin: global Window.orderBy plans an
    Exchange SinglePartition over the whole fact — correct at any SF,
    impossible at 100 TB. Kept as the plan-contrast and equivalence
    baseline for tests/test_plans.py only."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube; distinct aggregation; set operations.
# --------------------------------------------------------------------------

@register(
    "rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP over (returnflag, linestatus) incl. grand total row.",
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "cube_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE over (status, priority): all 4 grouping combinations.",
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
    doc="Exact distinct aggregation (expand-based multi-distinct).",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "approx_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           COUNT(*) AS n_orders,
           TRUE AS hll_within_2pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="approx_count_distinct (HyperLogLog++): the sketch path for distinct "
    "cardinality at 100 TB — mergeable, fixed memory, single shuffle of "
    "sketch bytes instead of an expand/exchange of raw keys. The raw sketch "
    "estimate differs across engines, so the driver-checked output carries "
    "the exact count plus a deterministic within-2%-of-exact flag (HLL++ is "
    "order-independent, so the flag is stable); the oracle pins the flag "
    "TRUE. At 100 TB you would drop the exact column and keep the sketch. "
    "Accuracy is additionally pinned in tests/test_plans.py.",
)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-13 optimization (guide §2.3): countDistinct beside the
    # rsd=0.01 sketch made the distinct-rewrite ship the 1640-word HLL
    # buffer per (priority, custkey) group through the exchange (~13 KB
    # per distinct pair). Dedupe pairs first — HLL registers are
    # duplicate-insensitive, so the estimate (and the flag) is identical —
    # and aggregate the 5 priority groups over small rows. 3.8s -> ~1s at
    # sf0.1; sketch bytes now total 5 groups x 13 KB per map partition.
    o = _t(spark, sf_dir, "orders")
    pairs = (
        o.groupBy("o_orderpriority", "o_custkey")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Round-14 (guide §1.2): approx_count_distinct(rsd=0.01) plans 1640
    # LONG aggregate attributes (HLL++ words as columns) — too wide for
    # codegen, interpreted + re-JITed every bench pass. The Datasketches
    # HLL aggregate (lgK=14, rsd 0.81% <= the 1% contract) keeps one
    # compact binary buffer; output rows identical (exact count + flag,
    # flag true at every gate SF with margin — small groups stay in the
    # sketch's exact sparse mode). See hourly_active_users for the full
    # measurement.
    return (
        pairs.groupBy("o_orderpriority")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))")
            .alias("approx"),
            F.count("o_custkey").alias("exact_customers"),
            F.sum("_c").alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("approx") - F.col("exact_customers"))
                # |err| <= max(5, 2% of exact): the absolute floor is the
                # small-cardinality accommodation (round-12 ADVICE low —
                # a purely relative band reads one register collision on
                # a tiny group as a red flag)
                <= F.greatest(F.lit(5.0), 0.02 * F.col("exact_customers"))
            ).alias("hll_within_2pct"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "segment_set_ops",
    oracle="""
    WITH building AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         machinery AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    SELECT 'intersect' AS op, c_nationkey FROM (SELECT * FROM building INTERSECT SELECT * FROM machinery)
    UNION ALL
    SELECT 'except' AS op, c_nationkey FROM (SELECT * FROM building EXCEPT SELECT * FROM machinery)
    ORDER BY op, c_nationkey
    """,
    doc="INTERSECT / EXCEPT over nation keys of two market segments.",
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machinery = c.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    both = building.intersect(machinery).select(F.lit("intersect").alias("op"), "c_nationkey")
    # subtract = EXCEPT DISTINCT; exceptAll would leak multiplicity (keys
    # present in both sides survive when the left has more occurrences)
    only = building.subtract(machinery).select(F.lit("except").alias("op"), "c_nationkey")
    return both.unionAll(only).orderBy("op", "c_nationkey")


# --------------------------------------------------------------------------
# Scalar function surface: string / date / math / conditional.
# --------------------------------------------------------------------------

@register(
    "part_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake
    FROM part
    WHERE p_type LIKE '%STEEL%' OR REGEXP_MATCHES(p_name, 'red|blue')
    ORDER BY p_partkey
    """,
    doc="String function battery with LIKE + regex predicates pushed to scan.",
)
def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(F.col("p_type").like("%STEEL%") | F.col("p_name").rlike("red|blue"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        )
        .orderBy("p_partkey")
    )


@register(
    "monthly_order_stats",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS month_revenue,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY 1
    ORDER BY order_month
    """,
    doc="Calendar bucketing: date_trunc month + year filter + min/max/sum.",
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.year("o_orderdate").between(1996, 1998))
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("order_month")
    )


@register(
    "conditional_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS high_discount,
           COUNT(*) FILTER (WHERE l_discount <= 0.05) AS low_discount,
           ROUND(SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END), 2) AS taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Conditional aggregation (FILTER / CASE WHEN) — manual pivot shape.",
)
def conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_discount"),
            F.count(F.when(F.col("l_discount") <= 0.05, 1)).alias("low_discount"),
            F.round(
                F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)), 2
            ).alias("taxed_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 50000.0), 2) AS abs_delta,
           ROUND(SQRT(l_quantity), 4) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 4) AS price_ln,
           ROUND(POWER(1 + l_discount, 2), 4) AS discount_sq,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
           MOD(l_orderkey, 97) AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey <= 2000
    ORDER BY l_orderkey
    """,
    doc="Math scalar battery: abs/sqrt/ln/power/floor/mod.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_linenumber") == 1) & (F.col("l_orderkey") <= 2000))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_extendedprice") - 50000.0), 2).alias("abs_delta"),
            F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
            F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
            F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 4).alias("discount_sq"),
            F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
            (F.col("l_orderkey") % 97).alias("key_mod"),
        )
        .orderBy("l_orderkey")
    )


# --------------------------------------------------------------------------
# Semi-structured: JSON props on the events stream table; arrays on
# embeddings. from_json is JVM-side (Jackson) — no Python in the path.
# --------------------------------------------------------------------------

@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="from_json over events.props, aggregate the extracted field.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("k"), 4).alias("avg_k"))
        .orderBy("event_type")
    )


@register(
    "embedding_array_stats",
    oracle="""
    SELECT vec_id,
           label,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_component,
           ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS component_sum
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
    doc="Array functions over embedding vectors: size, index, aggregate-sum.",
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    return (
        em.where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            F.round(F.col("embedding").getItem(0).cast("double"), 4).alias("first_component"),
            F.round(
                F.aggregate(
                    F.col("embedding"), F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
                4,
            ).alias("component_sum"),
        )
        .orderBy("vec_id")
    )


@register(
    "status_priority_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS notspec,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="pivot(): priority columns per status. With explicit pivot values the "
    "plan is a single two-phase agg — no extra pass to discover the domain.",
)
def status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority",
               ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
        .count()
        .select(
            "o_orderstatus",
            F.coalesce("1-URGENT", F.lit(0)).alias("urgent"),
            F.coalesce("2-HIGH", F.lit(0)).alias("high"),
            F.coalesce("3-MEDIUM", F.lit(0)).alias("medium"),
            F.coalesce("4-NOT SPECIFIED", F.lit(0)).alias("notspec"),
            F.coalesce("5-LOW", F.lit(0)).alias("low"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "price_quantiles_by_segment",
    oracle="""
    -- quantiles over integer cents: interpolation between 2-decimal money
    -- values lands on half-cent boundaries where ROUND() diverges between
    -- engines; identical double ops on exact cents are deterministic
    SELECT c_mktsegment,
           median(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS median_price,
           quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) / 100.0 AS p25,
           quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) / 100.0 AS p75
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Exact median / continuous quantiles per segment (percentile sort-based "
    "agg; the approx path is approx_percentile at scale).",
)
def price_quantiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        j.select("c_mktsegment", cents.alias("cents"))
        .groupBy("c_mktsegment")
        .agg(
            (F.median("cents") / 100.0).alias("median_price"),
            (F.percentile("cents", F.lit(0.25)) / 100.0).alias("p25"),
            (F.percentile("cents", F.lit(0.75)) / 100.0).alias("p75"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "order_price_percentile_sketch",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
             / 100.0 AS exact_p50,
           COUNT(*) AS n_orders,
           TRUE AS sketch_within_band
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Mergeable percentile SKETCH beside the exact median — the same "
    "production-vs-audit split the HLL family uses (round-13; the "
    "approx path previously existed only in prose on "
    "price_quantiles_by_segment). percentile_approx is Spark's "
    "QuantileSummaries sketch: single pass, mergeable partials, fixed "
    "memory — at 100 TB it replaces the sort-based exact percentile "
    "the same way HLL replaces countDistinct. The sketch guarantees "
    "rank error <= n/accuracy (= n/10000), so the gate renders it as a "
    "deterministic flag: the sketch median must land between the exact "
    "p45 and p55 values (a +/-5%-rank band, ~500x the guarantee) — "
    "stable regardless of partition merge order, pinned TRUE by the "
    "oracle. Exact columns are the audit; the production query keeps "
    "only the sketch.",
)
def order_price_percentile_sketch(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            (F.percentile("cents", F.lit(0.5)) / 100.0).alias("exact_p50"),
            F.count(F.lit(1)).alias("n_orders"),
            F.percentile_approx("cents", F.lit(0.5), F.lit(10000))
            .alias("approx_cents"),
            F.percentile("cents", F.lit(0.45)).alias("lo_cents"),
            F.percentile("cents", F.lit(0.55)).alias("hi_cents"),
        )
        .select(
            "o_orderpriority",
            "exact_p50",
            "n_orders",
            ((F.col("approx_cents") >= F.col("lo_cents"))
             & (F.col("approx_cents") <= F.col("hi_cents")))
            .alias("sketch_within_band"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "embedding_component_profile",
    oracle="""
    SELECT pos,
           CAST(ROUND(SUM(CAST(comp AS DECIMAL(20,6))), 4) AS DOUBLE) AS comp_sum,
           ROUND(MIN(comp), 4) AS comp_min,
           ROUND(MAX(comp), 4) AS comp_max
    FROM (
      SELECT i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS comp
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    )
    GROUP BY pos
    ORDER BY pos
    """,
    doc="posexplode over array<float>: per-dimension distribution profile "
    "(lateral view shape; decimal sums for order-independence).",
)
def embedding_component_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    return (
        em.select(F.posexplode("embedding").alias("pos", "comp"))
        .select("pos", F.col("comp").cast("double").alias("comp"))
        .groupBy("pos")
        .agg(
            F.round(F.sum(F.col("comp").cast("decimal(20,6)")), 4).cast("double").alias("comp_sum"),
            F.round(F.min("comp"), 4).alias("comp_min"),
            F.round(F.max("comp"), 4).alias("comp_max"),
        )
        .orderBy("pos")
    )


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


@register(
    "embedding_class_separation",
    oracle="""
    WITH comp AS (
      SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS c
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    per AS (
      SELECT label, pos, COUNT(*) AS n,
             SUM(CAST(c AS DECIMAL(25,12))) AS s,
             SUM(CAST(c * c AS DECIMAL(25,12))) AS ss
      FROM comp GROUP BY label, pos
    ),
    tot AS (
      SELECT pos, CAST(SUM(n) AS BIGINT) AS n_all,
             SUM(s) AS s_all, COUNT(*) AS n_labels
      FROM per GROUP BY pos
    ),
    terms AS (
      SELECT p.pos, t.n_all, t.n_labels,
             CAST(CAST(p.n AS DOUBLE)
                  * (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE)
                     - CAST(t.s_all AS DOUBLE) / CAST(t.n_all AS DOUBLE))
                  * (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE)
                     - CAST(t.s_all AS DOUBLE) / CAST(t.n_all AS DOUBLE))
                  AS DECIMAL(25,12)) AS bt,
             CAST(CAST(p.ss AS DOUBLE)
                  - CAST(p.n AS DOUBLE)
                    * (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE))
                    * (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE))
                  AS DECIMAL(25,12)) AS wt
      FROM per p JOIN tot t USING (pos)
    )
    SELECT pos,
           CAST(MAX(n_labels) AS BIGINT) AS n_labels,
           ROUND(CAST(SUM(bt) AS DOUBLE) / MAX(n_all), 6) AS between_var,
           ROUND(CAST(SUM(wt) AS DOUBLE) / MAX(n_all), 6) AS within_var,
           ROUND((CAST(SUM(bt) AS DOUBLE) / MAX(n_all))
                 / NULLIF(CAST(SUM(wt) AS DOUBLE) / MAX(n_all), 0), 4)
             AS fisher_ratio
    FROM terms
    GROUP BY pos
    ORDER BY pos
    """,
    doc="Per-dimension Fisher ratio (between-class variance / within-class "
    "variance) over the labeled embedding table — the separability audit "
    "run before trusting labels for classifier training or class-balanced "
    "sampling. Two-level aggregation: per-(label, dim) exact DECIMAL "
    "partial sums (order-independent — the 100 TB shuffle is 64 x L tiny "
    "rows), then per-dim scalar double algebra identical on both engines; "
    "squares are explicit multiplications (pow() implementations vary).",
)
def embedding_class_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    comp = em.select("label", F.posexplode("embedding").alias("pos", "c0")).select(
        "label", "pos", F.col("c0").cast("double").alias("c")
    )
    per = comp.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(25,12)")).alias("s"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(25,12)")).alias("ss"),
    )
    tot = per.groupBy("pos").agg(
        F.sum("n").alias("n_all"),
        F.sum("s").alias("s_all"),
        F.count(F.lit(1)).alias("n_labels"),
    )
    mu_l = F.col("s").cast("double") / F.col("n").cast("double")
    mu = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    terms = per.join(F.broadcast(tot), "pos").select(
        "pos",
        "n_all",
        "n_labels",
        (F.col("n").cast("double") * (mu_l - mu) * (mu_l - mu))
        .cast("decimal(25,12)")
        .alias("bt"),
        (F.col("ss").cast("double") - F.col("n").cast("double") * mu_l * mu_l)
        .cast("decimal(25,12)")
        .alias("wt"),
    )
    bvar = F.sum("bt").cast("double") / F.max("n_all")
    wvar = F.sum("wt").cast("double") / F.max("n_all")
    return (
        terms.groupBy("pos")
        .agg(
            F.max("n_labels").alias("n_labels"),
            F.round(bvar, 6).alias("between_var"),
            F.round(wvar, 6).alias("within_var"),
            # constant dims have zero within-class variance: NULL, not an
            # ANSI divide-by-zero
            F.round(bvar / F.nullif(wvar, F.lit(0.0)), 4).alias("fisher_ratio"),
        )
        .orderBy("pos")
    )

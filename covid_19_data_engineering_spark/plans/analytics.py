"""Analytics query surface, part 2: validation checks, list aggregation,
calendar gap-filling, exact-moment statistics, multiplicity set ops, and
correlated subqueries.

Determinism notes (the driver hashes values):
- statistical moments are computed from EXACT integer/decimal sums, with the
  final arithmetic in identical IEEE double ops on both engines — never from
  engine-native double accumulations (order-dependent last bits);
- list aggregations are sort_array'ed (collect_list order is partition-
  dependent by contract).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@register(
    "referential_integrity_check",
    oracle="""
    SELECT 'lineitem->orders' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS orphan_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    ORDER BY check_name
    """,
    doc="Referential-integrity validation via anti joins — the engine-native "
    "form of the reference's post-load quality checks (README.md:21).",
)
def referential_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    checks = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for name, child, fk, parent, pk in checks:
        orphans = (
            _t(spark, sf_dir, child)
            .join(_t(spark, sf_dir, parent), F.col(fk) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias("orphan_rows"))
            .select(F.lit(name).alias("check_name"), "orphan_rows")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("check_name")


@register(
    "nation_top_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           array_to_string(list_sort(list(c_name))[1:5], '|') AS sample_names
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="collect_list aggregation, sort_array'ed for determinism (collect "
    "order is partition-dependent by contract), sliced to a sample.",
)
def nation_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # '|'-joined rather than array<string>: the driver's pandas-based
            # canonicalizer cannot hash Python lists (unhashable type).
            F.concat_ws(
                "|", F.slice(F.sort_array(F.collect_list("c_name")), 1, 5)
            ).alias("sample_names"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "monthly_order_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders
    ),
    calendar AS (
      -- list-returning generate_series + unnest (the table-function form
      -- can't take lateral column args in DuckDB)
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
      FROM bounds
    ),
    actual AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT c.month, COALESCE(a.n_orders, 0) AS n_orders,
           CASE WHEN a.month IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM calendar c LEFT JOIN actual a ON c.month = a.month
    ORDER BY c.month
    """,
    doc="Calendar gap-filling: sequence() month spine + left join, zero-filled "
    "missing months flagged (time-series densification).",
)
def monthly_order_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    actual = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        calendar.join(actual, "month", "left")
        .select(
            "month",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.when(F.col("n_orders").isNull(), 1).otherwise(0).alias("is_gap"),
        )
        .orderBy("month")
    )


@register(
    "lineitem_moment_stats",
    oracle="""
    -- moments from EXACT sums (quantity is integral-valued, price is cents),
    -- final arithmetic in doubles — identical on both engines; native
    -- STDDEV/CORR accumulate doubles in engine-specific orders
    WITH s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sx,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
      FROM lineitem
    )
    -- CAST AS DOUBLE, never "* 1.0": a bare 1.0 is DECIMAL in DuckDB, so
    -- sy * 1.0 * sy ran the multiply in DECIMAL(38) — which OVERFLOWS at
    -- sf0.1's magnitudes (syy ~ 3e25) where smaller SFs squeaked through
    -- (round-12 three-SF sweep finding); Spark's 1.0 is DOUBLE, so the
    -- double tree below is what the Spark side always computed
    SELECT n,
           ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_qty,
           ROUND(SQRT((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1)), 4)
             AS stddev_qty,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy)), 6) AS corr_qty_price
    FROM s
    """,
    doc="Mean / stddev / correlation from exact integer sums (deterministic "
    "twin of stddev_samp + corr; SUMs shuffle one row of moments).",
)
def lineitem_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(cents).alias("sy"),
        F.sum(qty * qty).alias("sxx"),
        F.sum((cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)"))).alias("syy_d"),
        F.sum(qty * cents).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy_d").cast("double"), F.col("sxy")
    return s.select(
        n,
        F.round((sx * 1.0) / n, 4).alias("mean_qty"),
        F.round(F.sqrt((sxx - (sx * 1.0) * sx / n) / (n - 1)), 4).alias("stddev_qty"),
        F.round(
            (n * (sxy * 1.0) - (sx * 1.0) * sy)
            / F.sqrt(
                (n * (sxx * 1.0) - (sx * 1.0) * sx) * (n * syy - (sy * 1.0) * sy)
            ),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "null_semantics_battery",
    oracle="""
    -- NULLs are manufactured via NULLIF (the synthetic orders table has
    -- none): COUNT skips them, COALESCE backfills, <=> compares through them
    SELECT o_orderstatus,
           COUNT(*) AS n,
           COUNT(NULLIF(o_orderpriority, '4-NOT SPECIFIED')) AS specified_priority,
           COUNT(*) FILTER (WHERE o_orderstatus IS DISTINCT FROM 'O') AS not_open,
           COALESCE(MIN(NULLIF(o_orderpriority, '1-URGENT')), '<none>') AS min_nonurgent,
           COUNT(*) FILTER (WHERE NULLIF(o_orderpriority, '1-URGENT') IS NULL) AS urgent_as_null
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Three-valued-logic battery: NULLIF / COALESCE / IS DISTINCT FROM / "
    "COUNT-over-nullable — the null semantics a SQL engine must own.",
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    nullif_pri = F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    nullif_urgent = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(nullif_pri).alias("specified_priority"),
            F.count(
                F.when(~F.col("o_orderstatus").eqNullSafe("O"), 1)
            ).alias("not_open"),
            F.coalesce(F.min(nullif_urgent), F.lit("<none>")).alias("min_nonurgent"),
            F.count(F.when(nullif_urgent.isNull(), 1)).alias("urgent_as_null"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "part_name_fuzzy_pairs",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 10
    ORDER BY part_a, part_b
    """,
    doc="Edit-distance fuzzy matching (levenshtein) blocked on "
    "(brand, size) — the typo-tolerant dedup modality; blocking bounds "
    "the pair space exactly like LSH banding.",
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= 10)
        .orderBy("part_a", "part_b")
    )


@register(
    "segment_except_all",
    oracle="""
    SELECT c_nationkey FROM (
      SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT ALL
      SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    ORDER BY c_nationkey
    """,
    doc="EXCEPT ALL (multiplicity-preserving difference): each BUILDING "
    "occurrence of a nation key survives per unmatched MACHINERY occurrence.",
)
def segment_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machinery = c.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return building.exceptAll(machinery).orderBy("c_nationkey")


@register(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
    doc="Correlated scalar subquery (decorrelated by Catalyst into an "
    "aggregate + join — run through spark.sql to exercise the SQL planner).",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )


@register(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.active_week) / 7 AS INTEGER)
             AS week_offset,
           COUNT(DISTINCT f.user_id) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
    doc="Weekly retention cohorts: users bucketed by first-event week, "
    "counted per week offset they return in. Two aggregations on user_id "
    "(one shuffle family) + an O(cohorts x offsets) result — the standard "
    "large-scale product-analytics shape.",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_19_data_engineering_spark.sources.tables import events_with_time_cols

    # min(ts_week) == date_trunc('week', min(ts)): trunc is monotonic
    e = events_with_time_cols(spark, sf_dir).select("user_id", "ts_week")
    firsts = e.groupBy("user_id").agg(
        F.min("ts_week").cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.col("ts_week").cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_ohlc_daily",
    oracle="""
    WITH r AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts), event_type
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT day, event_type,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM r
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
    doc="Time-series resample (OHLC): per day and event type, the opening/"
    "closing values by (ts, event_id) order plus min/max/count — the metric-"
    "downsampling shape for dashboards over raw event streams. One shuffle "
    "on (day, event_type); open/close come from the same window pass, and "
    "no arithmetic touches the doubles (exact picks, exact hash parity).",
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from covid_19_data_engineering_spark.sources.tables import events_with_time_cols

    e = events_with_time_cols(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value",
        F.col("ts_day").cast("date").alias("day"),
    )
    w = Window.partitionBy("day", "event_type")
    rn_a = F.row_number().over(w.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    rn_d = F.row_number().over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    r = e.withColumn("rn_a", rn_a).withColumn("rn_d", rn_d)
    return (
        r.groupBy("day", "event_type")
        .agg(
            F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# Market-basket pair mining: within-order part co-occurrence.
# --------------------------------------------------------------------------

@register(
    "part_copurchase_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a,
           b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    HAVING COUNT(*) >= 3
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
    doc="Co-occurrence pair mining (market-basket / recsys co-view shape): "
    "part pairs bought together in >=3 orders, top 50. The self-join is "
    "BLOCKED on l_orderkey — both sides shuffle once on the same key and "
    "pairs explode only within an order (~7 lines -> <=21 pairs), so the "
    "join output is O(rows x avg_basket), never O(n^2); the same plan shape "
    "mines co-occurring n-grams or co-clicked items at 100 TB. The distinct "
    "pre-projection collapses duplicate (order, part) lines before pairing.",
)
def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs_src = (
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = pairs_src.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = pairs_src.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 3)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS curr_type, COUNT(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, curr_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS p
    FROM pairs
    ORDER BY prev_type, curr_type
    """,
    doc="Markov transition matrix over per-user event sequences: P(next "
    "event type | current) — the path-analysis primitive behind funnel "
    "discovery and session modeling. One window shuffle on user_id "
    "produces the lag pairs; the matrix itself is O(types^2) rows, so the "
    "probability window runs over a broadcast-sized frame.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    pw = Window.partitionBy("prev_type")
    return (
        pairs.select(
            "prev_type", "curr_type", "n_transitions",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(pw), 6
            ).alias("p"),
        )
        .orderBy("prev_type", "curr_type")
    )


# --------------------------------------------------------------------------
# Association rules on the co-purchase pairs: support / confidence / lift.
# --------------------------------------------------------------------------

@register(
    "copurchase_association_rules",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_all AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
    supp AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM op GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    ),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, c, sa.s AS s_ant,
             sb.s AS s_con
      FROM pairs JOIN supp sa ON sa.l_partkey = pa
                 JOIN supp sb ON sb.l_partkey = pb
      UNION ALL
      SELECT pb, pa, c, sb.s, sa.s
      FROM pairs JOIN supp sa ON sa.l_partkey = pa
                 JOIN supp sb ON sb.l_partkey = pb
    )
    SELECT antecedent, consequent, c AS n_orders,
           ROUND(CAST(c AS DOUBLE) / s_ant, 6) AS confidence,
           ROUND(CAST(c * (SELECT n FROM n_all) AS DOUBLE)
                 / (s_ant * s_con), 6) AS lift
    FROM rules
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 30
    """,
    doc="Association rules over within-order part co-occurrence: both "
    "directions of each pair with support count, confidence c/s(A), and "
    "lift c*N / (s(A)*s(B)) — the classic market-basket readout on the "
    "order-blocked pair-mining shape (pairs explode only within a basket, "
    "O(rows x avg_basket), never O(n^2)). All inputs are exact BIGINT "
    "counts; confidence and lift are each ONE double division with the "
    "integer products formed first, so both engines rank identically.",
)
def copurchase_association_rules(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    op = _t(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey").distinct()
    n_all = op.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n"))
    supp = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = op.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pa"))
    b = op.select(F.col("l_orderkey").alias("ok2"),
                  F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2"))
               & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 3)
    )
    sa = supp.select(F.col("l_partkey").alias("pa"),
                     F.col("s").alias("s_a"))
    sb = supp.select(F.col("l_partkey").alias("pb"),
                     F.col("s").alias("s_b"))
    joined = pairs.join(F.broadcast(sa), "pa").join(F.broadcast(sb), "pb")
    fwd = joined.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"),
        "c", F.col("s_a").alias("s_ant"), F.col("s_b").alias("s_con"))
    rev = joined.select(
        F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"),
        "c", F.col("s_b").alias("s_ant"), F.col("s_a").alias("s_con"))
    return (
        fwd.unionByName(rev)
        .crossJoin(F.broadcast(n_all))
        .select(
            "antecedent", "consequent", F.col("c").alias("n_orders"),
            F.round(F.expr("CAST(c AS DOUBLE) / s_ant"), 6)
            .alias("confidence"),
            F.round(F.expr("CAST(c * n AS DOUBLE) / (s_ant * s_con)"), 6)
            .alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Sweep-line interval counting: how many orders were in flight on each
# active date? The "count intervals covering a point" query, WITHOUT the
# interval x date join (which explodes O(orders x duration) rows).
# --------------------------------------------------------------------------

@register(
    "orders_open_backlog_curve",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey, o.o_orderdate AS d_start,
             MAX(l.l_shipdate) AS d_end
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT d_start AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT d_end + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
      SELECT CAST(d AS DATE) AS d, CAST(SUM(delta) AS BIGINT) AS net
      FROM deltas GROUP BY 1
    )
    SELECT d, net AS net_change,
           CAST(SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_orders
    FROM daily
    ORDER BY d
    """,
    doc="Open-order backlog curve: for every date where the backlog "
    "changes, how many orders are in flight (orderdate through last line "
    "receipt). Sweep-line decomposition: each order contributes a +1/-1 "
    "delta pair (one groupBy on orderkey for the span, one on date), and "
    "the only ordered window runs over the O(distinct dates) daily-net "
    "table — bounded by the calendar, not order volume. The naive "
    "interval-x-date join this replaces explodes O(orders x duration) "
    "rows.",
)
def orders_open_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # o_orderdate is TIMESTAMP_NTZ in the parquet; the sweep runs on DATE
    # on both engines (the oracle CASTs identically)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("l_shipdate"))
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("d_end"))
    )
    deltas = (
        spans.select(F.col("o_orderdate").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            spans.select(F.date_add("d_end", 1).alias("d"),
                         F.lit(-1).alias("delta")))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    return (
        daily.select(
            "d", F.col("net").alias("net_change"),
            F.sum("net").over(w).alias("open_orders"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# Market concentration (HHI): how concentrated is each nation's supply
# base? The antitrust-style audit, made order-independent with fixed-point
# share terms.
# --------------------------------------------------------------------------

# one squared-share term in 1e12 fixed point. floor(x + 0.5), NOT each
# engine's round(): the identical IEEE ops on both sides (terms are
# arbitrary doubles, so a native-round ULP boundary could flip)
_HHI_TERM = ("CAST(floor(((CAST(r AS DOUBLE) / t) * (CAST(r AS DOUBLE) / t))"
             " * 1000000000000 + 0.5) AS BIGINT)")


@register(
    "supplier_concentration_hhi",
    oracle=f"""
    WITH rev AS (
      SELECT s.s_nationkey,
             l.l_suppkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT s_nationkey, CAST(SUM(r) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(MAX(r) AS BIGINT) AS top_r
      FROM rev GROUP BY 1
    )
    SELECT n.n_name AS nation, t2.n_suppliers,
           ROUND(CAST(SUM({_HHI_TERM}) AS DOUBLE) / 1000000000000, 6)
             AS hhi,
           ROUND(CAST(MAX(top_r) AS DOUBLE) / MAX(t), 6) AS top_share
    FROM rev
    JOIN tot t2 USING (s_nationkey)
    JOIN nation n ON n.n_nationkey = rev.s_nationkey
    GROUP BY n.n_name, t2.n_suppliers
    ORDER BY nation
    """,
    doc="Herfindahl-Hirschman concentration of supplier revenue per "
    "nation (sum of squared revenue shares, 1/n = perfectly even, 1.0 = "
    "monopoly) plus the top supplier's share — the supply-risk audit. "
    "Revenue folds to exact BIGINT cents per (nation, supplier); each "
    "squared share becomes a 1e12 fixed-point term via floor(x + 0.5) "
    "(the identical IEEE ops on both engines, immune to native-round ULP "
    "boundaries) so the HHI sum is association-order-independent. Two "
    "map-side-combined shuffles (supplier revenue, nation fold); the "
    "supplier dim broadcasts.",
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
             .alias("r"))
    )
    tot = rev.groupBy(F.col("s_nationkey").alias("_nk")).agg(
        F.sum("r").alias("t"),
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("r").alias("top_r"),
    )
    return (
        rev.join(F.broadcast(tot), rev["s_nationkey"] == tot["_nk"])
        .join(F.broadcast(nat), rev["s_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
        .agg(
            F.round(F.expr(f"CAST(SUM({_HHI_TERM}) AS DOUBLE) "
                           "/ 1000000000000"), 6).alias("hhi"),
            F.round(F.expr("CAST(MAX(top_r) AS DOUBLE) / MAX(t)"), 6)
            .alias("top_share"),
        )
        .select("nation", "n_suppliers", "hhi", "top_share")
        .orderBy("nation")
    )

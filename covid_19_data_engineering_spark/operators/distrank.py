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


# --------------------------------------------------------------------------
# Mann-Whitney AUC: does a score separate two classes? (rank-sum test)
# --------------------------------------------------------------------------

_AUC_POS = "purchase"
_AUC_NEG = "view"


def mannwhitney_auc(df: DataFrame, score_col: str, label_col: str,
                    tiebreak_col: str) -> DataFrame:
    """One-row (n_pos, n_neg, auc, rank_biserial): the probability a
    random positive outscores a random negative (ties at half credit) —
    the threshold-free classifier/quality-score evaluation, identically
    the Mann-Whitney U statistic normalized by n1*n0.

    Tie handling is EXACT average ranks, carried in integers: rows get
    unique global ranks via the bucket+offset ranking (no single-
    partition sort), then a groupBy on the exact score value recovers
    per-value (min_rank, count, n_pos); twice the positive rank-sum is
        2*R1 = sum_v n_pos_v * (2*min_rank_v + cnt_v - 1)
    (each tied row's average rank is min + (cnt-1)/2), so
        AUC = (2*R1 - n1*(n1+1)) / (2*n1*n0)
    is one fixed-order double expression over exact BIGINTs.

    100 TB shape: two corpus shuffles (the rank bucketing and the
    score-value groupBy), both map-side combinable; nothing else sees
    the corpus.
    """
    ranked = with_global_rank(df, score_col, tiebreak_col)
    per_value = ranked.groupBy(F.col(score_col).alias("v")).agg(
        F.min("global_rank").alias("min_rank"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("np"),
    )
    agg = per_value.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).alias("n_neg"),
        F.sum(F.expr("np * (2 * min_rank + cnt - 1)")).alias("r1_x2"),
    )
    auc = ("(CAST(r1_x2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1)) "
           "/ (2.0 * CAST(n_pos AS DOUBLE) * n_neg)")
    return agg.select(
        "n_pos", "n_neg",
        F.round(F.expr(auc), 6).alias("auc"),
        F.round(F.expr(f"2 * ({auc}) - 1"), 6).alias("rank_biserial"),
    )


@register(
    "events_value_auc",
    oracle=f"""
    WITH two AS (
      SELECT event_id, value,
             CASE WHEN event_type = '{_AUC_POS}' THEN 1 ELSE 0 END AS pos
      FROM events
      WHERE event_type IN ('{_AUC_POS}', '{_AUC_NEG}')
    ),
    ranked AS (
      SELECT value, pos,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk
      FROM two
    ),
    per_value AS (
      SELECT value, CAST(MIN(rk) AS BIGINT) AS min_rank,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS np
      FROM ranked GROUP BY value
    ),
    agg AS (
      SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - np) AS BIGINT) AS n_neg,
             CAST(SUM(np * (2 * min_rank + cnt - 1)) AS BIGINT) AS r1_x2
      FROM per_value
    )
    SELECT n_pos, n_neg,
           ROUND((CAST(r1_x2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (2.0 * CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc,
           ROUND(2 * ((CAST(r1_x2 AS DOUBLE)
                       - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (2.0 * CAST(n_pos AS DOUBLE) * n_neg)) - 1, 6)
             AS rank_biserial
    FROM agg
    """,
    doc=f"Mann-Whitney AUC of the value score separating '{_AUC_POS}' "
    f"from '{_AUC_NEG}' events: unique global ranks via the bucket+offset "
    "distributed ranking (no single-partition sort), exact average-rank "
    "tie handling recovered from per-value (min_rank, count) integers, "
    "AUC = (2R1 - n1(n1+1))/(2 n1 n0) as one fixed-order double over "
    "BIGINTs. The threshold-free score evaluation; two map-side-"
    "combinable corpus shuffles.",
)
def events_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    two = events.filter(
        F.col("event_type").isin(_AUC_POS, _AUC_NEG)
    ).select(
        "event_id", "value",
        (F.col("event_type") == _AUC_POS).alias("pos"),
    )
    return mannwhitney_auc(two, "value", "pos", "event_id")


# --------------------------------------------------------------------------
# Gini coefficient + Lorenz top-decile share of customer revenue.
# --------------------------------------------------------------------------

def gini_concentration(df: DataFrame, value_fp_col: str,
                       tiebreak_col: str) -> DataFrame:
    """One-row (n_units, total_fp, gini, top_decile_share) over exact
    fixed-point values: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    with i the ascending global rank — entirely BIGINT until the two
    final divisions.

    100 TB shape: the ranking is the bucket+offset composition (one
    corpus shuffle, no single-partition sort); the Gini reduction is one
    map-side-combined aggregate over the ranked rows.
    """
    ranked = with_global_rank(df, value_fp_col, tiebreak_col)
    x = F.col(value_fp_col)
    agg = ranked.agg(
        F.max("total").alias("n"),
        F.sum(x).alias("total_fp"),
        F.sum(F.col("global_rank") * x).alias("rank_weighted"),
        F.sum(F.when(F.col("global_rank") > F.col("total")
                     - F.floor(F.col("total") / 10), x)
              .otherwise(F.lit(0))).alias("top_dec_fp"),
    )
    return agg.select(
        F.col("n").alias("n_units"),
        "total_fp",
        F.round(
            F.expr("(2.0 * CAST(rank_weighted AS DOUBLE) "
                   "- (CAST(n AS DOUBLE) + 1) * total_fp) "
                   "/ (CAST(n AS DOUBLE) * total_fp)"), 6
        ).alias("gini"),
        F.round(F.expr("CAST(top_dec_fp AS DOUBLE) / total_fp"), 6)
        .alias("top_decile_share"),
    )


@register(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_fp
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev_fp,
             ROW_NUMBER() OVER (ORDER BY rev_fp, o_custkey) AS rk,
             COUNT(*) OVER () AS n
      FROM rev
    ),
    agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(rev_fp) AS BIGINT) AS total_fp,
             CAST(SUM(rk * rev_fp) AS BIGINT) AS rank_weighted,
             CAST(SUM(CASE WHEN rk > n - n // 10 THEN rev_fp ELSE 0 END)
                  AS BIGINT) AS top_dec_fp
      FROM ranked
    )
    SELECT n AS n_units, total_fp,
           ROUND((2.0 * CAST(rank_weighted AS DOUBLE)
                  - (CAST(n AS DOUBLE) + 1) * total_fp)
                 / (CAST(n AS DOUBLE) * total_fp), 6) AS gini,
           ROUND(CAST(top_dec_fp AS DOUBLE) / total_fp, 6)
             AS top_decile_share
    FROM agg
    """,
    doc="Gini coefficient and Lorenz top-decile share of per-customer "
    "revenue: revenues reduced to exact integer cents by one customer-"
    "keyed groupBy, ranked by the bucket+offset distributed ranking "
    "(deterministic custkey tiebreak, no single-partition sort), then "
    "G = (2*sum(i*x_i) - (n+1)*sum(x))/(n*sum(x)) entirely in BIGINT "
    "until the final division — the inequality/concentration readout "
    "beside the HHI.",
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .alias("rev_fp")
    )
    return gini_concentration(rev, "rev_fp", "o_custkey")


# --------------------------------------------------------------------------
# ABC inventory classification — bucket the catalog into A/B/C classes by
# cumulative revenue share (A: first 80% of revenue, B: to 95%, C: tail).
# The classic "needs a global ORDER BY rev DESC + running total"
# operator, done with the same bucket+offset decomposition as the global
# rank: a DISTRIBUTED prefix sum (within-bucket cumsum windows + one
# O(buckets) offset table), no single-partition window over the catalog.
# --------------------------------------------------------------------------

_ABC_A_PCT, _ABC_B_PCT = 80, 95


def abc_classification(lineitem: DataFrame,
                       n_buckets: int = N_RANK_BUCKETS) -> DataFrame:
    """(abc_class, n_parts, revenue, revenue_share) — parts classed by
    cumulative share of discounted revenue in descending-revenue order.

    Exactness: per-part revenue is an exact BIGINT cents sum (the
    double product l_extendedprice*(1-l_discount) is computed by the
    identical expression on both engines before the one half-up floor);
    the prefix sums and both class thresholds are pure integer
    arithmetic (cum*100 <= 80*total), so the classing is engine-exact —
    no float boundary anywhere. Ties in revenue break by p_partkey, so
    the cumulative order is total.

    100 TB shape: one part-keyed rollup (map-side combined), then the
    two-level prefix sum — within-bucket windows partitioned by revenue
    bucket + a broadcast O(buckets) offset table. The catalog never
    passes through one partition.
    """
    rev = (
        lineitem.groupBy("l_partkey")
        .agg(F.sum(F.expr(
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) "
            "AS BIGINT)")).alias("rev"))
    )
    stats = rev.agg(
        F.min(F.col("rev")).cast("double").alias("_mn"),
        F.max(F.col("rev")).cast("double").alias("_mx"),
        F.sum("rev").alias("_total"),
    )
    # bucket on NEGATED revenue so bucket order == descending revenue
    bucketed = rev.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.width_bucket(-F.col("rev").cast("double"),
                       -F.col("_mx"), -F.col("_mn") + 1, n_buckets),
    )
    local_w = Window.partitionBy("_bkt").orderBy(
        F.col("rev").desc(), F.col("l_partkey").asc())
    cumd = bucketed.withColumn(
        "_local_cum",
        F.sum("rev").over(local_w.rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow)))
    btotals = cumd.groupBy("_bkt").agg(F.sum("rev").alias("_bsum"))
    tiny_w = Window.orderBy("_bkt")
    offsets = btotals.select(
        "_bkt", (F.sum("_bsum").over(tiny_w) - F.col("_bsum"))
        .alias("_offset"))
    classed = (
        cumd.join(F.broadcast(offsets), "_bkt")
        .withColumn("_cum", F.col("_local_cum") + F.col("_offset"))
        .withColumn(
            "abc_class",
            F.when(F.col("_cum") * 100 <= _ABC_A_PCT * F.col("_total"), "A")
            .when(F.col("_cum") * 100 <= _ABC_B_PCT * F.col("_total"), "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev").cast("double") / 100.0, 2).alias("revenue"),
            F.round(F.sum("rev").cast("double")
                    / F.max("_total").cast("double"), 6)
            .alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "parts_abc_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM rev),
    cum AS (
      SELECT rev,
             CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS c,
             total
      FROM rev, tot
    ),
    classed AS (
      SELECT rev, total,
             CASE WHEN c * 100 <= {_ABC_A_PCT} * total THEN 'A'
                  WHEN c * 100 <= {_ABC_B_PCT} * total THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM cum
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE) / 100.0, 2)
             AS revenue,
           ROUND(CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE)
                 / CAST(MAX(total) AS DOUBLE), 6) AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    doc=f"ABC classification of parts by cumulative discounted-revenue "
    f"share (A <= {_ABC_A_PCT}%, B <= {_ABC_B_PCT}%, C tail): the global "
    "descending-revenue running total is a DISTRIBUTED two-level prefix "
    "sum (within-bucket cumsum windows over the width_bucket revenue "
    "partitioning + one broadcast O(buckets) offset table) and both "
    "thresholds are exact integer comparisons (cum*100 <= pct*total) — "
    "the inventory-policy classing with no single-partition window and "
    "no float boundary; the oracle states the same semantics as one "
    "flat window.",
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    return abc_classification(load_table(spark, "lineitem", sf_dir))


# --------------------------------------------------------------------------
# Hill tail-index estimator — how heavy is the revenue distribution's
# tail? alpha = k / sum_{i<=k} ln(x_(i) / x_(k+1)) over the top-k order
# statistics: alpha < 2 means infinite variance (whale-dominated
# revenue), the diagnostic behind the Gini/Lorenz and ABC readouts.
# --------------------------------------------------------------------------

HILL_K = 100
_HILL_FX = 1_000_000_000


def hill_tail_index(df: DataFrame, value_cents_expr: str,
                    key_col: str, k: int = HILL_K) -> DataFrame:
    """One row: (k, x_min, alpha, alpha_se) — the Hill estimator over
    the top-k per-``key_col`` totals of ``value_cents_expr``.

    The corpus reduces to per-key exact BIGINT cents (one rollup); the
    top k+1 rows return via TakeOrderedAndProject (O(k) per partition,
    never a global sort); each ln(x_i / x_(k+1)) term is one shared
    double expression over two exact integers, fixed-pointed to 1e-9
    before the k-term sum, so alpha is engine-exact. se = alpha/sqrt(k)
    (the estimator's asymptotic standard error).
    """
    from pyspark.sql import Window

    per_key = df.groupBy(key_col).agg(
        F.expr(f"SUM({value_cents_expr})").alias("cents"))
    topk1 = (
        per_key.orderBy(F.col("cents").desc(), F.col(key_col).asc())
        .limit(k + 1)
        .withColumn("rnk", F.row_number().over(
            Window.orderBy(F.col("cents").desc(), F.col(key_col).asc())))
    )
    xmin = topk1.where(F.col("rnk") == k + 1).select(
        F.col("cents").alias("xmin_cents"))
    terms = (
        topk1.where(F.col("rnk") <= k)
        .crossJoin(F.broadcast(xmin))
        .selectExpr(
            "xmin_cents",
            "CAST(FLOOR(ln(CAST(cents AS DOUBLE) "
            f"/ CAST(xmin_cents AS DOUBLE)) * {_HILL_FX} + 0.5) AS BIGINT)"
            " AS t_fx",
        )
    )
    return terms.groupBy().agg(
        F.lit(k).cast("long").alias("k"),
        F.round(F.max("xmin_cents").cast("double") / 100.0, 2)
        .alias("x_min"),
        F.expr(f"ROUND({k} / (CAST(SUM(t_fx) AS DOUBLE) / {_HILL_FX}), 4)")
        .alias("alpha"),
        F.expr(f"ROUND({k} / (CAST(SUM(t_fx) AS DOUBLE) / {_HILL_FX}) "
               f"/ sqrt({k}.0), 4)").alias("alpha_se"),
    )


@register(
    "customer_revenue_hill_tail",
    oracle=f"""
    WITH per_key AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    topk1 AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rnk
      FROM per_key
      ORDER BY cents DESC, o_custkey LIMIT {HILL_K + 1}
    ),
    xmin AS (SELECT cents AS xmin_cents FROM topk1
             WHERE rnk = {HILL_K + 1}),
    terms AS (
      SELECT xmin_cents,
             CAST(FLOOR(ln(CAST(t.cents AS DOUBLE)
                           / CAST(x.xmin_cents AS DOUBLE))
                        * {_HILL_FX} + 0.5) AS BIGINT) AS t_fx
      FROM topk1 t, xmin x WHERE t.rnk <= {HILL_K}
    )
    SELECT CAST({HILL_K} AS BIGINT) AS k,
           ROUND(CAST(MAX(xmin_cents) AS DOUBLE) / 100.0, 2) AS x_min,
           ROUND({HILL_K} / (CAST(SUM(t_fx) AS DOUBLE) / {_HILL_FX}), 4)
             AS alpha,
           ROUND({HILL_K} / (CAST(SUM(t_fx) AS DOUBLE) / {_HILL_FX})
                 / sqrt({HILL_K}.0), 4) AS alpha_se
    FROM terms
    """,
    doc=f"Hill tail-index of per-customer revenue over the top-{HILL_K} "
    "order statistics (alpha < 2 = infinite-variance whale dominance): "
    "one customer rollup, TakeOrderedAndProject top-(k+1) — never a "
    "global sort — and fixed-point ln-ratio terms summed as exact "
    "integers; the heavy-tail diagnostic behind the Gini/ABC readouts "
    "with its asymptotic standard error.",
)
def customer_revenue_hill_tail(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    return hill_tail_index(
        load_table(spark, "orders", sf_dir),
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)", "o_custkey")


# --------------------------------------------------------------------------
# Kruskal-Wallis H — the k-group rank ANOVA: the nonparametric companion
# to events_value_anova exactly as the Mann-Whitney AUC companions the
# two-group t-test. Reuses the bucket+offset distributed ranking, so no
# single-partition sort touches the corpus.
# --------------------------------------------------------------------------

_KW_FX = 1_000_000  # fixed-point scale for per-group H terms


def _kw_select() -> list[str]:
    """The shared (Spark == DuckDB) solve over the one sum row:
    H = sum_g [12 R_g^2 / (N(N+1) 4 n_g)] - 3(N+1), each group term
    already normalized and fixed-pointed; tie-corrected
    Hc = H / (1 - sum(t^3 - t)/(N^3 - N))."""
    fx = float(_KW_FX)
    h = f"(CAST(sh AS DOUBLE) / {fx} - 3.0 * (n_rows + 1))"
    hc = (f"({h} / (1.0 - CAST(tie_term AS DOUBLE) "
          f"/ (CAST(n_rows AS DOUBLE) * n_rows * n_rows - n_rows)))")
    return [
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(n_groups AS BIGINT) AS n_groups",
        "CAST(n_groups - 1 AS BIGINT) AS dof",
        "CAST(tie_term AS BIGINT) AS tie_term",
        f"ROUND({h}, 4) AS h_stat",
        f"ROUND({hc}, 4) AS h_corrected",
    ]


def kruskal_wallis(df: DataFrame, score_col: str, group_col: str,
                   tiebreak_col: str) -> DataFrame:
    """One-row Kruskal-Wallis rank test of ``score_col`` across the
    groups of ``group_col``: (n_rows, n_groups, dof, tie_term, h_stat,
    h_corrected).

    Tie handling is EXACT average ranks carried in integers (the AUC
    machinery generalized to k groups): unique global ranks come from
    the bucket+offset ranking, a per-value groupBy recovers each tied
    block's (min_rank, cnt), a per-(value, group) groupBy its group
    counts, and twice the group rank-sum
        2*R_g = sum_v c_gv * (2*min_rank_v + cnt_v - 1)
    is an exact BIGINT. Each group's H term R_g^2/n_g is ONE fixed-order
    double rounded to 1e-6 fixed point before the cross-group sum (k
    doubles would still be partition-order-dependent); H, the tie
    correction sum(t^3 - t)/(N^3 - N), and the corrected statistic are
    fixed-order expressions over the single sum row, shared verbatim
    with the oracle.

    100 TB shape: two corpus shuffles (rank bucketing, the value/group
    groupBys share the value key), then O(values) and O(groups) rows.
    """
    ranked = with_global_rank(df, score_col, tiebreak_col)
    per_value = ranked.groupBy(F.col(score_col).alias("v")).agg(
        F.min("global_rank").alias("min_rank"),
        F.count(F.lit(1)).alias("cnt"),
    )
    per_vg = ranked.groupBy(
        F.col(score_col).alias("v"), F.col(group_col).alias("g")
    ).agg(F.count(F.lit(1)).alias("c_gv"))
    groups = (
        per_vg.join(per_value, "v")
        .groupBy("g")
        .agg(
            F.sum("c_gv").alias("n_g"),
            F.sum(F.expr("c_gv * (2 * min_rank + cnt - 1)"))
            .alias("r_x2"),
        )
    )
    counts = groups.agg(
        F.sum("n_g").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    # normalize BEFORE fixed-pointing: the raw R_g^2/n_g term is O(N^2)
    # and overflows the 1e-6-unit BIGINT at scale (caught by the sf0.1
    # gate); the normalized term is O(H) at any corpus size
    sums = (
        groups.crossJoin(F.broadcast(counts))
        .groupBy("n_rows", "n_groups")
        .agg(F.sum(F.expr(
            f"CAST(round(12.0 * CAST(r_x2 AS DOUBLE) * r_x2 "
            f"/ (CAST(n_rows AS DOUBLE) * (n_rows + 1) * 4.0 * n_g) "
            f"* {_KW_FX}) AS BIGINT)")).alias("sh"))
    )
    ties = per_value.agg(
        F.coalesce(F.sum(F.expr("cnt * cnt * cnt - cnt")),
                   F.lit(0)).cast("bigint").alias("tie_term")
    )
    return sums.crossJoin(F.broadcast(ties)).selectExpr(*_kw_select())


@register(
    "events_value_kruskal",
    oracle=f"""
    WITH ranked AS (
      SELECT value, event_type,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk
      FROM events
    ),
    per_value AS (
      SELECT value, CAST(MIN(rk) AS BIGINT) AS min_rank,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ranked GROUP BY value
    ),
    per_vg AS (
      SELECT value AS v, event_type AS g,
             CAST(COUNT(*) AS BIGINT) AS c_gv
      FROM ranked GROUP BY value, event_type
    ),
    groups AS (
      SELECT g, CAST(SUM(c_gv) AS BIGINT) AS n_g,
             CAST(SUM(c_gv * (2 * p.min_rank + p.cnt - 1)) AS BIGINT)
               AS r_x2
      FROM per_vg j JOIN per_value p ON p.value = j.v
      GROUP BY g
    ),
    counts AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM groups
    ),
    sums AS (
      SELECT n_rows, n_groups,
             CAST(SUM(CAST(round(12.0 * CAST(r_x2 AS DOUBLE) * r_x2
                                 / (CAST(n_rows AS DOUBLE) * (n_rows + 1)
                                    * 4.0 * n_g)
                                 * {_KW_FX}) AS BIGINT))
                  AS BIGINT) AS sh
      FROM groups, counts
      GROUP BY n_rows, n_groups
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(cnt * cnt * cnt - cnt), 0) AS BIGINT)
               AS tie_term
      FROM per_value
    )
    SELECT {", ".join(_kw_select())} FROM sums, ties
    """,
    doc="Kruskal-Wallis H test of the value column across ALL event "
    "types: the k-group rank ANOVA (nonparametric companion to "
    "events_value_anova, as the Mann-Whitney AUC companions the "
    "t-test). Unique global ranks via the bucket+offset distributed "
    "ranking, exact average-rank ties from per-value (min_rank, cnt) "
    "BIGINTs, per-group H terms individually fixed-pointed before the "
    "cross-group sum, and the tie-corrected statistic as one shared "
    "expression over the sum row. Two map-side-combinable corpus "
    "shuffles; everything after runs on O(values)+O(groups) rows.",
)
def events_value_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return kruskal_wallis(
        events.select("event_id", "value", "event_type"),
        "value", "event_type", "event_id",
    )


# --------------------------------------------------------------------------
# Friedman test — the REPEATED-MEASURES rank test: within each day
# (block), rank the event types against each other, then ask whether
# some type consistently outranks the rest across days. Completes the
# rank-test family's design space: Mann-Whitney (2 groups), Kruskal-
# Wallis (k independent groups), Friedman (k matched groups).
# --------------------------------------------------------------------------


def friedman_test(df: DataFrame, block_col: str, group_col: str,
                  value_col: str) -> DataFrame:
    """One-row Friedman test: (n_blocks, n_groups, q_stat, verdict) of
    ``value_col`` ranked within each complete block across groups.

    Only COMPLETE blocks (all k groups present) enter, selected
    identically on both engines; within-block ranks are average-rank
    doubled integers from per-block (value) ordering — each block is k
    rows, so the rank window partitions by block and never exceeds k
    rows per partition at ANY corpus size. Group rank sums are exact
    BIGINTs (x2); Q = [12/(n k(k+1))] * sum R_j^2 - 3 n (k+1) is one
    fixed-order expression over the O(k) sum rows, each group term
    fixed-pointed before the cross-group sum (the KW lesson). The
    classical statistic assumes untied within-block values (block
    totals in exact cents make ties measure-zero here); under ties both
    engines still agree exactly — only the chi-square calibration
    shifts, stated rather than hidden.
    """
    from pyspark.sql import Window

    k = df.select(group_col).distinct().count()
    complete = (
        df.groupBy(block_col)
        .agg(F.countDistinct(group_col).alias("_k"))
        .where(F.col("_k") == k)
        .select(block_col)
    )
    blocked = df.join(complete, block_col)
    w = Window.partitionBy(block_col).orderBy(value_col)  # k rows/block
    ranked = blocked.withColumn("_rn", F.row_number().over(w))
    # average ranks (x2) under ties: per (block, value) min rank + count
    per_val = ranked.groupBy(block_col, value_col).agg(
        F.min("_rn").alias("_mn"), F.count(F.lit(1)).alias("_c"))
    r2 = (
        ranked.join(per_val, [block_col, value_col])
        .select(group_col,
                (2 * F.col("_mn") + F.col("_c") - 1).alias("_r_x2"))
        .groupBy(group_col)
        .agg(F.sum("_r_x2").alias("r_x2"), F.count(F.lit(1)).alias("n_b"))
    )
    fx = 1_000_000
    sums = (
        r2.agg(
            F.max("n_b").alias("n_blocks"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.expr(
                f"CAST(round(CAST(r_x2 AS DOUBLE) * r_x2 / 4.0 "
                f"* {fx}) AS BIGINT)")).alias("sr2"),
        )
    )
    q = (f"(12.0 / (CAST(n_blocks AS DOUBLE) * n_groups * (n_groups + 1))"
         f" * (CAST(sr2 AS DOUBLE) / {fx})"
         " - 3.0 * CAST(n_blocks AS DOUBLE) * (n_groups + 1))")
    return sums.selectExpr(
        "CAST(n_blocks AS BIGINT) AS n_blocks",
        "CAST(n_groups AS BIGINT) AS n_groups",
        f"ROUND({q}, 4) AS q_stat",
        f"(CASE WHEN ROUND({q}, 4) > 9.4877 THEN 'differs' "
        "ELSE 'none' END) AS verdict",  # chi2 df=4 5% (5 event types)
    )


@register(
    "events_friedman_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    k AS (SELECT COUNT(DISTINCT event_type) AS k FROM daily),
    complete AS (
      SELECT d FROM daily GROUP BY d
      HAVING COUNT(DISTINCT event_type) = (SELECT k FROM k)
    ),
    blocked AS (
      SELECT daily.* FROM daily JOIN complete USING (d)
    ),
    ranked AS (
      SELECT d, event_type, y,
             ROW_NUMBER() OVER (PARTITION BY d ORDER BY y) AS rn
      FROM blocked
    ),
    per_val AS (
      SELECT d, y, MIN(rn) AS mn, COUNT(*) AS c
      FROM ranked GROUP BY d, y
    ),
    r2 AS (
      SELECT r.event_type,
             CAST(SUM(2 * p.mn + p.c - 1) AS BIGINT) AS r_x2,
             CAST(COUNT(*) AS BIGINT) AS n_b
      FROM ranked r JOIN per_val p ON p.d = r.d AND p.y = r.y
      GROUP BY r.event_type
    ),
    sums AS (
      SELECT CAST(MAX(n_b) AS BIGINT) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CAST(round(CAST(r_x2 AS DOUBLE) * r_x2 / 4.0
                                 * 1000000) AS BIGINT)) AS BIGINT) AS sr2
      FROM r2
    )
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(n_groups AS BIGINT) AS n_groups,
           ROUND(12.0 / (CAST(n_blocks AS DOUBLE) * n_groups
                         * (n_groups + 1))
                 * (CAST(sr2 AS DOUBLE) / 1000000)
                 - 3.0 * CAST(n_blocks AS DOUBLE) * (n_groups + 1), 4)
             AS q_stat,
           (CASE WHEN ROUND(12.0 / (CAST(n_blocks AS DOUBLE) * n_groups
                                    * (n_groups + 1))
                 * (CAST(sr2 AS DOUBLE) / 1000000)
                 - 3.0 * CAST(n_blocks AS DOUBLE) * (n_groups + 1), 4)
                 > 9.4877 THEN 'differs' ELSE 'none' END) AS verdict
    FROM sums
    """,
    doc="Friedman repeated-measures rank test of daily value totals "
    "across event types: within each COMPLETE day-block the k types "
    "rank against each other (the rank window partitions by day, k "
    "rows per partition at any scale), group rank sums are exact "
    "doubled BIGINTs with average-rank ties, each group's Q term "
    "fixed-pointed before the cross-group sum, and the verdict reads "
    "chi-square df=k-1 at 5%. Completes the rank family: Mann-Whitney "
    "(2 groups) -> Kruskal-Wallis (k independent) -> Friedman (k "
    "matched).",
)
def events_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    daily = (
        events.groupBy(
            F.expr("CAST(ts AS DATE)").alias("d"),
            "event_type")
        .agg(F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
             .alias("y"))
    )
    return friedman_test(daily, "d", "event_type", "y")

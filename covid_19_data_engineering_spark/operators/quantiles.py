"""Exact distributed quantiles via histogram refine — order statistics
without a global sort.

``percentile`` over 100 TB has two classic failure modes: a global sort
(one total-order shuffle of the corpus) or an approximate sketch (whose
error bound then infects every downstream SLA). The histogram-refine
pattern gets EXACT order statistics in two bounded passes: pass 1 bins
the column into BINS equal-width buckets (a map-side-combined groupBy on
at most BINS groups); the tiny bin-count table locates, for each target
rank k, the bucket holding the k-th smallest value and the residual rank
within it; pass 2 ranks ONLY the rows of the (few, distinct) candidate
buckets — expected n/BINS rows each — with a window partitioned by
bucket. No stage ever sees a total order; a pathological bucket (all
mass on one value) still bounds pass 2 at that bucket's row count, and
the construction recurses if a deployment needs a hard cap.

Rank semantics are explicit order statistics — k = floor((n-1) * p) + 1,
the 1-based index of the p-quantile in the sorted column — so the oracle
can state the same rank arithmetic with a window instead of relying on
any engine's percentile interpolation flavor. Ties: equal values are
interchangeable at equal rank, so the readout is unique.

No reference analogue (the reference delegates aggregation SQL);
SURVEY §2 C-extensions. The mergeable-sketch alternatives (HLL, CMS)
live in operators/sketches.py; this is the exact path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.operators.lineage import (
    truncate as _truncate,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

BINS = 1024
QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)
# fixed-point units for the binned value: prices carry 2 decimals, so
# 100x units make the bin arithmetic exact integer on both engines
VAL_UNIT = 100
# pass-2 ranks each candidate bucket in one window task of expected
# n/bins rows; deriving bins from n caps that task at ~BIN_TARGET rows
# no matter the corpus size (a fixed BINS=1024 would put ~10^9 rows
# through one sort task on a 10^12-row column — round-7 verdict #2)
BIN_TARGET = 1_000_000


def _derive_bins(n: int, floor_bins: int, bin_target: int) -> int:
    """Bin count sized to the corpus: at least ``floor_bins`` (keeps the
    cumsum table tiny on small data), growing as n // bin_target so the
    expected pass-2 per-bucket row count stays ~bin_target at any scale.
    Same size-derivation pattern as SemDeDup's K (semdedup.py). The
    RESULT is bins-invariant — more buckets only narrow where the rank
    lands, never which value answers it — so the DuckDB oracle (a plain
    ranked window) needs no replay of this derivation."""
    return max(floor_bins, n // bin_target)


def _stats_row(df: DataFrame, col: str, floor_bins: int,
               bin_target: int) -> DataFrame:
    """One broadcastable row (_lo_u, _n, _width): integer-unit min plus
    the derived equal-width bucket width, all in exact BIGINT arithmetic
    inside the plan — no driver round-trip. The result downstream is
    bins-invariant (more/fewer or shifted buckets only narrow where a
    rank lands, never which value answers it), so the SQL half-up round
    here vs the former Python banker's round is immaterial."""
    return df.agg(
        F.expr(f"CAST(round(min({col}) * {VAL_UNIT}) AS BIGINT)").alias("_lo_u"),
        F.expr(f"CAST(round(max({col}) * {VAL_UNIT}) AS BIGINT)").alias("_hi_u"),
        F.count(F.lit(1)).alias("_n"),
    ).select(
        "_lo_u", "_n",
        F.expr(f"greatest(CAST(1 AS BIGINT), (_hi_u - _lo_u) div "
               f"greatest({floor_bins}, _n div {bin_target}) + 1)")
        .alias("_width"),
    )


def _located_values(binned: DataFrame, targets: DataFrame) -> DataFrame:
    """Shared refine tail: cumsum the per-bucket counts, locate each
    target rank's (bucket, residual rank), then row_number ONLY the
    candidate buckets and join the residual ranks. ``binned``:
    (v, b [, extra label cols on targets]); ``targets``: (<labels>, rank).
    Output: (<labels>, rank, value)."""
    counts = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    cum_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "below", F.coalesce(F.sum("cnt").over(cum_w), F.lit(0)))
    label_cols = [c for c in targets.columns if c != "rank"]
    # bucket holding rank k: below < k <= below + cnt  (tiny join: bins x q)
    # Round 14 (guide §5): ``located`` (<= q rows) is referenced twice
    # below (candidate-bucket semi-join + residual-rank join); without
    # truncation each reference re-instantiates the whole cumsum subtree
    # (another full pass-1 scan). Lazy checkpoint = both references read
    # the cached handful of rows; still one action.
    located = _truncate(
        targets.join(F.broadcast(cum),
                     (F.col("below") < F.col("rank"))
                     & (F.col("rank") <= F.col("below") + F.col("cnt")))
        .select(*label_cols, "rank", "b",
                (F.col("rank") - F.col("below")).alias("rk_in"))
    )
    ranked = (
        binned.join(F.broadcast(located.select("b").distinct()), "b")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("b").orderBy("v")))
    )
    return (
        located.join(ranked, (located["b"] == ranked["b"])
                     & (F.col("rk_in") == F.col("rn")))
        .select(*label_cols, "rank", F.col("v").alias("value"))
    )


def exact_quantiles_histogram(df: DataFrame, col: str,
                              quantiles: tuple[float, ...] = QUANTILES,
                              bins: int = BINS,
                              bin_target: int = BIN_TARGET) -> DataFrame:
    """(quantile, rank, value) — exact order statistics of ``df[col]``.

    Pass 1: integer-unit values bin into equal-width buckets — at least
    ``bins`` of them, scaled up to n // ``bin_target`` so pass 2's
    per-bucket window task is bounded at ~bin_target expected rows at
    any corpus size; the bin-count cumsum (a window over <= bins rows)
    converts each target rank into (bucket, rank-within-bucket). Pass 2:
    a row_number window over candidate buckets only.

    Round-13 optimization (guide §1.2: fewer passes): the whole refine is
    ONE plan / ONE action — min/max/n ride a broadcast one-row aggregate
    instead of a driver ``first()``, target ranks k = floor((n-1)p)+1 are
    derived in-plan with the identical integer arithmetic, and candidate
    buckets flow through a broadcast semi-join instead of a collected
    ``isin`` literal. Was 3 driver actions (3 jobs, 3 scans queued
    sequentially); now 1. Empty input yields an empty result frame (the
    former ValueError needed a driver-side count).

    Round 14 (guide §5): the ONE-ROW stats frame is referenced three
    times (binning twice, rank targets once) and each reference used to
    re-instantiate the min/max/count scan; a lazy checkpoint makes later
    references read the cached row — pass-1/pass-2 scans remain, the
    duplicated stat scans go (measured 1.35 -> 1.05 s warm, 6.1 -> 1.5 s
    cold at sf0.1; identical rows)."""
    stats = _truncate(_stats_row(df, col, bins, bin_target))
    binned = df.crossJoin(F.broadcast(stats)).select(
        F.col(col).alias("v"),
        F.expr(f"(CAST(round({col} * {VAL_UNIT}) AS BIGINT) - _lo_u) "
               "div _width").alias("b"),
    )
    # target ranks: k = floor((n-1) * p) + 1, exact integer arithmetic
    # (floor(double) is BIGINT-exact here and replayed by the oracle)
    targets = stats.select(
        F.explode(F.array(*[F.lit(float(p)) for p in quantiles]))
        .alias("quantile"),
        "_n",
    ).select(
        "quantile",
        (F.floor((F.col("_n") - 1) * F.col("quantile")) + 1)
        .cast("long").alias("rank"),
    )
    return _located_values(binned, targets)


def _quantiles_oracle_sql() -> str:
    qlist = ", ".join(str(p) for p in QUANTILES)
    return f"""
    WITH n_all AS (SELECT COUNT(*) AS n FROM lineitem),
    targets AS (
      -- CAST: DuckDB types the literal list DECIMAL(3,2); the engine's
      -- quantile column is DOUBLE and the parity canon is dtype-strict
      SELECT CAST(q AS DOUBLE) AS quantile,
             CAST(floor(((SELECT n FROM n_all) - 1) * q) AS BIGINT) + 1 AS rank
      FROM (SELECT unnest([{qlist}]) AS q)
    ),
    ranked AS (
      SELECT l_extendedprice AS value,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
      FROM lineitem
    )
    SELECT t.quantile, t.rank, r.value
    FROM targets t JOIN ranked r ON r.rn = t.rank
    ORDER BY t.quantile
    """


@register(
    "exact_price_quantiles",
    oracle=_quantiles_oracle_sql(),
    doc=f"Exact order statistics of l_extendedprice at p = {QUANTILES} via "
    f"histogram refine: integer-unit binning into max({BINS}, n // "
    f"{BIN_TARGET}) equal-width buckets (map-side combine, <= bins "
    "groups; the n-derived count caps pass 2's per-bucket window task "
    "at ~BIN_TARGET rows at any scale), cumsum over the tiny count "
    "table locates each rank's bucket + residual rank, then a window "
    "over candidate buckets ONLY — no global sort anywhere; the result "
    "is bins-invariant, so the oracle states the same k = floor((n-1)p)+1 "
    "ranks against a plain ranked window.",
)
def exact_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_extendedprice")
    return exact_quantiles_histogram(li, "l_extendedprice") \
        .orderBy("quantile")


# --------------------------------------------------------------------------
# Robust (median/MAD) outlier report — the scale-safe alternative to
# mean/stddev outlier fences, which a single fat-tailed shard can corrupt.
# Both order statistics come from the histogram-refine pass above, so the
# whole report costs four bounded passes and never sorts the corpus.
# --------------------------------------------------------------------------


def mad_outlier_report(df: DataFrame, col: str, group: str,
                       z: int = 3) -> DataFrame:
    """Per ``group``: rows whose |x - median| exceeds ``z`` * MAD, with the
    global median/MAD computed exactly via histogram refine.

    100 TB shape: median and MAD are each an exact_quantiles_histogram run
    (two bounded passes, no global sort); each yields ONE scalar — the
    only driver round-trips, both O(1) rows. The outlier fence is then a
    single map-side-combined groupBy where the decision runs in BIGINT
    cents (round(|x - med| * 100) > z * round(mad * 100)) so Spark and
    the oracle decide identically with no float boundary.
    """
    # (a _spread + checkpoint of the projection was tried here in
    # round 11 and MEASURED SLOWER — 3.6s -> 6.3s at sf0.1: the repeated
    # scans are cheap integer binning over a small file, and the
    # repartition shuffle + cache materialization cost more than the
    # single-task scans they replace. The fan-out rule only pays for
    # CPU-dense maps like md5 pipelines.)
    # Round 13 (guide §1.2): both order statistics stay IN the plan as
    # broadcast one-row frames instead of driver floats — the whole
    # report is ONE action (was 5: two quantile runs of first()+collect
    # each, then the final collect), with the identical integer-cents
    # fence arithmetic.
    # Round 14 (guide §5 lineage, r13 ADVICE): WITHOUT truncation the
    # med/mad one-row subplans nest MULTIPLICATIVELY — each textual
    # reference to med_row re-instantiates its whole quantile subtree,
    # and mad_row's subtree contains med_row several times over, so the
    # committed r13 plan held 162 lineitem scans and zero ReusedExchange
    # (plans/r14/robust_price_outliers_before.txt). Lazily checkpointing
    # each ONE-ROW frame makes every later reference read the cached
    # single row instead of replanting the subtree: the base table is
    # scanned O(passes) times total (8 scans, plans/..._after.txt), not
    # O(plan references). Still one driver action; materialization rides
    # the consuming job's broadcast build.
    med_row = _truncate(exact_quantiles_histogram(
        df.select(col), col, (0.5,)).select(F.col("value").alias("_med")))
    dev = (
        df.select(col).crossJoin(F.broadcast(med_row))
        .select(F.abs(F.col(col) - F.col("_med")).alias("dev"))
    )
    mad_row = _truncate(exact_quantiles_histogram(
        dev, "dev", (0.5,)).select(F.col("value").alias("_mad")))
    dev_c = F.expr(f"CAST(round(abs({col} - _med) * 100) AS BIGINT)")
    mad_c = F.expr("CAST(round(_mad * 100) AS BIGINT)")
    return (
        df.crossJoin(F.broadcast(med_row)).crossJoin(F.broadcast(mad_row))
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(dev_c > z * mad_c, 1).otherwise(0))
            .alias("n_outliers"),
            F.round(F.min("_med"), 2).alias("median_value"),
            F.round(F.min("_mad"), 2).alias("mad"),
        )
        .select(group, "n_rows", "n_outliers", "median_value", "mad")
        .orderBy(group)
    )


@register(
    "robust_price_outliers",
    oracle="""
    WITH n_all AS (SELECT COUNT(*) AS n FROM lineitem),
    med AS (
      SELECT value AS med FROM (
        SELECT l_extendedprice AS value,
               ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
        FROM lineitem
      ) WHERE rn = CAST(floor(((SELECT n FROM n_all) - 1) * 0.5) AS BIGINT) + 1
    ),
    mad AS (
      SELECT value AS mad FROM (
        SELECT abs(l_extendedprice - (SELECT med FROM med)) AS value,
               ROW_NUMBER() OVER (
                 ORDER BY abs(l_extendedprice - (SELECT med FROM med))) AS rn
        FROM lineitem
      ) WHERE rn = CAST(floor(((SELECT n FROM n_all) - 1) * 0.5) AS BIGINT) + 1
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN
                 CAST(round(abs(l_extendedprice - (SELECT med FROM med))
                            * 100) AS BIGINT)
                 > 3 * CAST(round((SELECT mad FROM mad) * 100) AS BIGINT)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND((SELECT med FROM med), 2) AS median_value,
           ROUND((SELECT mad FROM mad), 2) AS mad
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Robust outlier fence per return flag: count of prices more than "
    "3 MADs from the global median, both order statistics exact via "
    "histogram refine (no global sort, no percentile interpolation "
    "flavor). The fence decision runs in BIGINT cents on both engines; "
    "the oracle replays the identical k = floor((n-1)*0.5)+1 rank "
    "semantics with ranked windows. The robust twin of mean/stddev "
    "fences, which a single fat-tailed shard corrupts at 100 TB.",
)
def robust_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir) \
        .select("l_returnflag", "l_extendedprice")
    return mad_outlier_report(li, "l_extendedprice", "l_returnflag")


# --------------------------------------------------------------------------
# Weighted quantiles: the price below which a fraction of REVENUE sits.
# --------------------------------------------------------------------------

W_QUANTILES = (0.25, 0.5, 0.75, 0.9)


def weighted_quantiles_histogram(df: DataFrame, col: str, weight_expr: str,
                                 quantiles: tuple[float, ...] = W_QUANTILES,
                                 bins: int = BINS,
                                 bin_target: int = BIN_TARGET) -> DataFrame:
    """(quantile, weight_rank, value) — exact WEIGHTED order statistics:
    the smallest ``col`` value at which the running total of
    ``weight_expr`` (an integer-unit SQL expression) reaches the target
    weight rank kw = floor((W-1)*p) + 1 under the (value, input-order-
    free) total order. Same two bounded passes as the count version
    above: per-bin weight sums + a cumsum over <= bins rows locate each
    target's bucket; a weight-cumulative window over candidate buckets
    only finds the crossing row. Weights are exact BIGINTs, so the
    crossing test (cumw - w < kw_in <= cumw) never touches a float.
    """
    # one broadcast stats row carries lo/width (bins derive from the ROW
    # count — pass-2 work is rows ranked, not weight mass) plus the total
    # weight; the whole refine is ONE plan / ONE action (round-13, guide
    # §1.2 — was a driver first() + a cand-bin collect). Zero total
    # weight yields an empty result (the former ValueError needed the
    # driver round-trip).
    stats = _truncate(df.selectExpr(
        f"CAST(round(min({col}) * {VAL_UNIT}) AS BIGINT) AS _lo_u",
        f"CAST(round(max({col}) * {VAL_UNIT}) AS BIGINT) AS _hi_u",
        f"CAST(sum({weight_expr}) AS BIGINT) AS _w",
        "COUNT(*) AS _n",
    ).selectExpr(
        "_lo_u", "_w",
        f"greatest(CAST(1 AS BIGINT), (_hi_u - _lo_u) div "
        f"greatest({bins}, _n div {bin_target}) + 1) AS _width",
    ))
    binned = df.crossJoin(F.broadcast(stats)).selectExpr(
        f"{col} AS v",
        f"CAST({weight_expr} AS BIGINT) AS w",
        f"(CAST(round({col} * {VAL_UNIT}) AS BIGINT) - _lo_u) "
        "div _width AS b",
    )
    counts = binned.groupBy("b").agg(F.sum("w").alias("wcnt"))
    cum_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "below", F.coalesce(F.sum("wcnt").over(cum_w), F.lit(0)))
    targets = stats.select(
        F.explode(F.array(*[F.lit(float(p)) for p in quantiles]))
        .alias("quantile"),
        "_w",
    ).select(
        "quantile",
        (F.floor((F.col("_w") - 1) * F.col("quantile")) + 1)
        .cast("long").alias("weight_rank"),
    )
    located = _truncate(
        targets.join(F.broadcast(cum),
                     (F.col("below") < F.col("weight_rank"))
                     & (F.col("weight_rank") <= F.col("below") + F.col("wcnt")))
        .select("quantile", "weight_rank", "b",
                (F.col("weight_rank") - F.col("below")).alias("kw_in"))
    )
    in_w = Window.partitionBy("b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0)
    ranked = (
        binned.join(F.broadcast(located.select("b").distinct()), "b")
        .withColumn("cumw", F.sum("w").over(in_w))
    )
    # the crossing VALUE is unique (ties on v accumulate together under
    # the value ordering, and any row of the crossing value works), so
    # pick the minimal crossing row per target
    return (
        located.join(ranked, (located["b"] == ranked["b"])
                     & (F.col("cumw") >= F.col("kw_in"))
                     & (F.col("cumw") - F.col("w") < F.col("kw_in")))
        .groupBy("quantile", "weight_rank")
        .agg(F.min("v").alias("value"))
        .orderBy("quantile")
    )


def _wq_oracle_sql() -> str:
    qlist = ", ".join(str(p) for p in W_QUANTILES)
    return f"""
    WITH w_all AS (
      SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS w
      FROM lineitem
    ),
    targets AS (
      SELECT CAST(q AS DOUBLE) AS quantile,
             CAST(floor(((SELECT w FROM w_all) - 1) * q) AS BIGINT) + 1
               AS weight_rank
      FROM (SELECT unnest([{qlist}]) AS q)
    ),
    ranked AS (
      SELECT l_extendedprice AS v,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS w,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  OVER (ORDER BY l_extendedprice
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumw
      FROM lineitem
    )
    SELECT t.quantile, t.weight_rank, MIN(r.v) AS value
    FROM targets t JOIN ranked r
      ON r.cumw >= t.weight_rank AND r.cumw - r.w < t.weight_rank
    GROUP BY t.quantile, t.weight_rank
    ORDER BY t.quantile
    """


@register(
    "revenue_weighted_price_quantiles",
    oracle=_wq_oracle_sql(),
    doc="Exact revenue-weighted price quantiles: the price below which "
    "25/50/75/90% of total revenue (integer cents) sits — weighted order "
    "statistics with the same two bounded histogram-refine passes as the "
    "count version (per-bin BIGINT weight sums + a <= bins cumsum locate "
    "each target's bucket; a weight-cumulative window over candidate "
    "buckets finds the crossing row, decided entirely in integers). The "
    "'what price band carries the business' readout, with no global sort "
    "and no sketch error.",
)
def revenue_weighted_price_quantiles(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return weighted_quantiles_histogram(
        li, "l_extendedprice", "round(l_extendedprice * 100)")


# --------------------------------------------------------------------------
# Winsorized mean — the robust location estimate that CLIPS the tails at
# exact order statistics instead of dropping them (trimming loses the
# tail mass entirely; winsorizing keeps it at the fence). Composes the
# histogram-refine exact quantiles with one clipped aggregate.
# --------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_mean(df: DataFrame, col: str,
                    lo_p: float = WINSOR_LO,
                    hi_p: float = WINSOR_HI) -> DataFrame:
    """One row: (n_rows, p_lo, p_hi, raw_mean, winsorized_mean) for
    ``df[col]`` clipped at the exact lo_p/hi_p order statistics.

    The fences come from the two-pass histogram refine (no global sort,
    no sketch error); clipping and the mean run as ONE exact-integer
    aggregate over cents — least/greatest against the two broadcast
    fence scalars — so the estimate is association-order-free. Means use
    the shared half-up rounding (floor(x*1e4+0.5)/1e4; a clipped-cents
    mean CAN land on an exact decimal half where engine ROUNDs split).
    """
    fences = exact_quantiles_histogram(df, col, quantiles=(lo_p, hi_p))
    lo_hi = fences.groupBy().agg(
        F.min(F.when(F.col("quantile") == lo_p, F.col("value")))
        .alias("p_lo"),
        F.min(F.when(F.col("quantile") == hi_p, F.col("value")))
        .alias("p_hi"),
    )
    cents = f"CAST(round({col} * {VAL_UNIT}) AS BIGINT)"
    clipped = df.crossJoin(F.broadcast(lo_hi)).selectExpr(
        f"{cents} AS c",
        f"CAST(round(p_lo * {VAL_UNIT}) AS BIGINT) AS lo_c",
        f"CAST(round(p_hi * {VAL_UNIT}) AS BIGINT) AS hi_c",
        "p_lo", "p_hi",
    )
    mean4 = ("CAST(FLOOR(CAST(SUM({v}) AS DOUBLE) / COUNT(*) "
             f"/ {VAL_UNIT}.0 * 10000.0 + 0.5) AS DOUBLE) / 10000.0")
    return clipped.groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("p_lo").alias("p_lo"),
        F.min("p_hi").alias("p_hi"),
        F.expr(mean4.format(v="c")).alias("raw_mean"),
        F.expr(mean4.format(v="least(greatest(c, lo_c), hi_c)"))
        .alias("winsorized_mean"),
    )


@register(
    "winsorized_price_mean",
    oracle=f"""
    WITH n_all AS (SELECT COUNT(*) AS n FROM lineitem),
    ranked AS (
      SELECT l_extendedprice AS v,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
      FROM lineitem
    ),
    fences AS (
      SELECT
        MIN(CASE WHEN rn = CAST(floor(((SELECT n FROM n_all) - 1)
                                      * {WINSOR_LO}) AS BIGINT) + 1
                 THEN v END) AS p_lo,
        MIN(CASE WHEN rn = CAST(floor(((SELECT n FROM n_all) - 1)
                                      * {WINSOR_HI}) AS BIGINT) + 1
                 THEN v END) AS p_hi
      FROM ranked
    ),
    clipped AS (
      SELECT CAST(round(l_extendedprice * {VAL_UNIT}) AS BIGINT) AS c,
             CAST(round(p_lo * {VAL_UNIT}) AS BIGINT) AS lo_c,
             CAST(round(p_hi * {VAL_UNIT}) AS BIGINT) AS hi_c,
             p_lo, p_hi
      FROM lineitem, fences
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(p_lo) AS p_lo, MIN(p_hi) AS p_hi,
           CAST(FLOOR(CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / COUNT(*)
                      / {VAL_UNIT}.0 * 10000.0 + 0.5) AS DOUBLE) / 10000.0
             AS raw_mean,
           CAST(FLOOR(CAST(CAST(SUM(least(greatest(c, lo_c), hi_c))
                                AS BIGINT) AS DOUBLE) / COUNT(*)
                      / {VAL_UNIT}.0 * 10000.0 + 0.5) AS DOUBLE) / 10000.0
             AS winsorized_mean
    FROM clipped
    """,
    doc=f"Winsorized mean of l_extendedprice (tails clipped at the exact "
    f"p{int(WINSOR_LO * 100)}/p{int(WINSOR_HI * 100)} order statistics "
    "from the histogram-refine quantile pass, no global sort): clipping "
    "and both means are one exact-integer-cents aggregate against two "
    "broadcast fence scalars, with shared half-up rounding — the robust "
    "location estimate that keeps tail mass at the fence instead of "
    "discarding it.",
)
def winsorized_price_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_19_data_engineering_spark.sources.tables import load_table

    return winsorized_mean(
        load_table(spark, "lineitem", sf_dir), "l_extendedprice")


# --- distribution-free median confidence interval ---------------------------
# The classic nonparametric CI: for X_(1..n) sorted, [X_(r_lo), X_(r_hi)]
# covers the population median with >= 95% probability where the ranks
# come from Binomial(n, 1/2) normal approximation — no distributional
# assumption, just order statistics. Reuses the histogram-refine shape
# (bin, cumsum to locate, window candidate buckets only — never a global
# sort), with RANK targets instead of quantile fractions.


def values_at_ranks(df: DataFrame, col: str,
                    labeled_ranks: list[tuple[str, int]],
                    bins: int = BINS,
                    bin_target: int = BIN_TARGET,
                    n: int | None = None) -> DataFrame:
    """(stat, rank, value) — exact order statistics at explicit 1-based
    ranks. Same refine plan as exact_quantiles_histogram, and since
    round 13 the same single-plan / single-action shape (guide §1.2).
    ``n`` (when the caller already counted, as the median-CI rank
    derivation must) keeps the rank-bounds validation without its own
    count job; n=None skips validation — out-of-range ranks simply
    return no row."""
    if n is not None:
        if n == 0:
            raise ValueError(f"values_at_ranks: {col} has no rows")
        for _, r in labeled_ranks:
            if not 1 <= r <= n:
                raise ValueError(f"rank {r} outside [1, {n}]")
    stats = _truncate(_stats_row(df, col, bins, bin_target))
    binned = df.crossJoin(F.broadcast(stats)).select(
        F.col(col).alias("v"),
        F.expr(f"(CAST(round({col} * {VAL_UNIT}) AS BIGINT) - _lo_u) "
               "div _width").alias("b"),
    )
    tdf = df.sparkSession.createDataFrame(
        labeled_ranks, "stat string, rank long")
    return _located_values(binned, tdf)


def median_ci_ranks(n: int, z: float = 1.959963985) -> tuple[int, int, int]:
    """(r_lo, r_med, r_hi) — 1-based order-statistic ranks for the lower
    median and its distribution-free ~95% CI, Binomial(n, 1/2) normal
    approximation, clamped to [1, n]. Pure double arithmetic written
    identically in the oracle so both engines derive the SAME ranks."""
    import math

    half = z * math.sqrt(n) / 2.0
    r_lo = max(1, int(math.floor(n / 2.0 - half)))
    r_hi = min(n, int(math.ceil(1.0 + n / 2.0 + half)))
    r_med = (n + 1) // 2
    return r_lo, r_med, r_hi


@register(
    "order_price_median_ci",
    oracle="""
    WITH n_all AS (SELECT COUNT(*) AS n FROM orders),
    targets AS (
      SELECT 'ci95_lo' AS stat,
             GREATEST(1, CAST(floor(n / 2.0e0
                 - 1.959963985e0 * sqrt(n) / 2.0e0) AS BIGINT)) AS rank
      FROM n_all
      UNION ALL
      SELECT 'median', (n + 1) // 2 FROM n_all
      UNION ALL
      SELECT 'ci95_hi',
             LEAST(n, CAST(ceil(1.0e0 + n / 2.0e0
                 + 1.959963985e0 * sqrt(n) / 2.0e0) AS BIGINT))
      FROM n_all
    ),
    ranked AS (
      SELECT o_totalprice AS value,
             ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
      FROM orders
    )
    SELECT t.stat, t.rank, r.value
    FROM targets t JOIN ranked r ON r.rn = t.rank
    ORDER BY t.stat
    """,
    doc="Distribution-free ~95% CI for the median of o_totalprice: order-"
    "statistic ranks from the Binomial(n,1/2) normal approximation "
    "(identical double arithmetic on both engines), values fetched by "
    "the histogram-refine rank machinery — bin, cumsum-locate, window "
    "candidate buckets only, never a global sort. The uncertainty "
    "companion to the exact quantile battery.",
)
def order_price_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).select("o_totalprice")
    n = orders.count()
    r_lo, r_med, r_hi = median_ci_ranks(n)
    return values_at_ranks(
        orders, "o_totalprice",
        [("ci95_lo", r_lo), ("median", r_med), ("ci95_hi", r_hi)],
        n=n,
    ).orderBy("stat")

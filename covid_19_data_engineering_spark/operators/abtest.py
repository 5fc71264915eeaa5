"""Two-proportion z-test between user cohorts — the experimentation
readout query (A/B test significance) every product-analytics stack runs
on its event stream. No reference analogue (SURVEY §2 C-extensions).

Outcome: the user's FIRST event (by ts, event_id) is a purchase — a
~1-in-5 rate at any scale factor. ("Has any purchase" saturates to 100%
on this event density: every user converts, the pooled variance is zero
and z is 0/0 — the degenerate case the z guard below handles.) Cohort =
user_id parity, a deterministic stand-in for the assignment column a
real experiment framework writes.

The whole test reduces to FOUR integers (users and converters per
cohort) via one user-keyed aggregate + one tiny rollup; the z statistic

    z = (pa - pb) / sqrt(p0 * (1 - p0) * (1/na + 1/nb)),  p0 pooled

is a single fixed-order double expression over those integers —
identical on any engine with no rounding needed. The saturated case
(p0 in {0,1} -> se = 0) is pinned to NULL on BOTH engines explicitly:
Spark via try_divide (which would otherwise raise under ANSI mode),
the oracle via NULLIF(se, 0) (bare float division by zero in DuckDB is
configuration-dependent — NULL or IEEE inf depending on
ieee_floating_point_ops — so the oracle never relies on it). The planted
saturated-experiment parity test lives in tests/test_round4_ops.py.

Scale shape: one shuffle on user_id (the first-event rollup), then an
O(1) aggregate — embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

Z_CRIT = 1.96  # two-sided 5%


def ab_conversion_ztest(events: DataFrame,
                        convert_type: str = "purchase") -> DataFrame:
    """One-row result: cohort sizes, converters, rates, pooled z."""
    first_event = (
        events.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("event_id"),
                    F.col("event_type").alias("event_type"),
                )
            ).alias("fe")
        )
        .select(
            (F.col("user_id") % 2).alias("cohort"),
            (F.col("fe.event_type") == convert_type).cast("int").alias("converted"),
        )
    )
    counts = first_event.groupBy().agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("cohort") == 0, F.col("converted")).otherwise(0)).alias("xa"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("cohort") == 1, F.col("converted")).otherwise(0)).alias("xb"),
    )
    pa = F.col("xa").cast("double") / F.col("na")
    pb = F.col("xb").cast("double") / F.col("nb")
    p0 = (F.col("xa") + F.col("xb")).cast("double") / (F.col("na") + F.col("nb"))
    se = F.sqrt(p0 * (1 - p0) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    # try_divide: a saturated experiment (p0 in {0,1}) has se = 0 -> NULL z,
    # the same semantics the oracle pins with NULLIF(se, 0) (and Spark would
    # otherwise raise under ANSI mode)
    z = F.try_divide(pa - pb, se)
    return counts.select(
        "na", "xa", "nb", "xb",
        pa.alias("rate_a"), pb.alias("rate_b"), z.alias("z_stat"),
        (F.abs(z) >= Z_CRIT).alias("significant_5pct"),
    )


@register(
    "ab_conversion_ztest",
    oracle=f"""
    WITH first_event AS (
      SELECT user_id % 2 AS cohort,
             CASE WHEN first(event_type ORDER BY ts, event_id) = 'purchase'
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    counts AS (
      SELECT
        CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        CAST(SUM(CASE WHEN cohort = 0 THEN converted ELSE 0 END) AS BIGINT) AS xa,
        CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        CAST(SUM(CASE WHEN cohort = 1 THEN converted ELSE 0 END) AS BIGINT) AS xb
      FROM first_event
    )
    SELECT na, xa, nb, xb,
           CAST(xa AS DOUBLE) / na AS rate_a,
           CAST(xb AS DOUBLE) / nb AS rate_b,
           -- NULLIF pins the saturated case (p0 in {{0,1}} -> se = 0) to
           -- NULL regardless of DuckDB's ieee_floating_point_ops setting,
           -- matching Spark's try_divide exactly (round-4 ADVICE: the old
           -- bare division relied on a NULL-on-div-by-zero behavior that
           -- is configuration-dependent and never exercised at sf0.01)
           (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
             / NULLIF(sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                    * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 0) AS z_stat,
           abs((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
               / NULLIF(sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                      * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                      * (1.0 / na + 1.0 / nb)), 0)) >= {Z_CRIT}
             AS significant_5pct
    FROM counts
    """,
    doc="Two-proportion z-test of first-event purchase conversion between "
    "user_id-parity cohorts: one user-keyed rollup to four integers, then "
    "a single fixed-order double expression — the A/B experimentation "
    "readout, exact across engines with no rounding.",
)
def ab_conversion_ztest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return ab_conversion_ztest(events)


# --------------------------------------------------------------------------
# SPRT: sequential monitoring of the purchase-conversion rate.
# --------------------------------------------------------------------------

SPRT_BASELINE_DAYS = 7
SPRT_LIFT = 1.5           # H1: rate = LIFT * baseline rate
SPRT_ALPHA = 0.05         # = beta; boundaries ±ln((1-a)/a)
_SPRT_FX = 1_000_000_000


def sprt_conversion_monitor(events: DataFrame,
                            baseline_days: int = SPRT_BASELINE_DAYS,
                            lift: float = SPRT_LIFT) -> DataFrame:
    """Wald's sequential probability ratio test on the daily purchase
    conversion rate: the first ``baseline_days`` days fix the H0 rate
    p0 (and H1 = ``lift`` * p0); every later day adds its exact
    log-likelihood-ratio increment, and the cumulative LLR is compared
    against the ±ln((1-alpha)/alpha) boundaries — the always-valid
    sequential monitor that replaces peeking at a fixed-horizon z-test.

    (day, n_trials, n_conversions, llr, decision) for the monitored
    days, decision in 'accept_h1' | 'accept_h0' | 'continue' — the
    state AT that day (first boundary crossing latches via a cumulative
    extremum).

    Exactness: daily (trials, conversions) are exact BIGINTs off one
    day-keyed groupBy; p0 is one exact division of two corpus integers;
    each day's LLR increment is ONE fixed-order double expression
    rounded to 1e-9 units, so the cumulative sum and both boundary
    compares are integer arithmetic. 100 TB shape: one corpus shuffle,
    then O(days) windows.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .alias("x"),
        )
    )
    w_all = Window.orderBy("day")  # O(days) rows — harmless
    seq = daily.withColumn("k", F.row_number().over(w_all))
    base = seq.where(F.col("k") <= baseline_days).agg(
        F.sum("n").alias("n0"), F.sum("x").alias("x0")
    )
    # L1 = ln(p1/p0) = ln(lift); L0 = ln((1-p1)/(1-p0)) with p0 = x0/n0
    l0 = (f"ln((1.0 - {lift} * (CAST(x0 AS DOUBLE) / n0)) "
          "/ (1.0 - CAST(x0 AS DOUBLE) / n0))")
    term = (f"CAST(round((x * ln({lift}) + (n - x) * {l0}) * {_SPRT_FX}) "
            "AS BIGINT)")
    import math
    bound_fx = round(math.log((1 - SPRT_ALPHA) / SPRT_ALPHA) * _SPRT_FX)
    monitored = (
        seq.where(F.col("k") > baseline_days)
        .crossJoin(F.broadcast(base))
        .withColumn("term_fx", F.expr(term))
    )
    w = Window.orderBy("day")
    cum = (
        monitored.withColumn("cum_fx", F.sum("term_fx").over(w))
        .withColumn("hi", F.max("cum_fx").over(w))
        .withColumn("lo", F.min("cum_fx").over(w))
    )
    decision = (
        F.when(F.col("hi") >= bound_fx, F.lit("accept_h1"))
        .when(F.col("lo") <= -bound_fx, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return cum.select(
        "day",
        F.col("n").alias("n_trials"),
        F.col("x").alias("n_conversions"),
        F.round(F.expr(f"CAST(cum_fx AS DOUBLE) / {_SPRT_FX}"), 6)
        .alias("llr"),
        decision.alias("decision"),
    ).orderBy("day")


def _sprt_oracle_sql() -> str:
    import math
    bound_fx = round(math.log((1 - SPRT_ALPHA) / SPRT_ALPHA) * _SPRT_FX)
    l0 = (f"ln((1.0 - {SPRT_LIFT} * (CAST(x0 AS DOUBLE) / n0)) "
          "/ (1.0 - CAST(x0 AS DOUBLE) / n0))")
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    seq AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY day) AS k FROM daily
    ),
    base AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n0, CAST(SUM(x) AS BIGINT) AS x0
      FROM seq WHERE k <= {SPRT_BASELINE_DAYS}
    ),
    terms AS (
      SELECT day, n, x,
             CAST(round((x * ln({SPRT_LIFT}) + (n - x) * {l0})
                        * {_SPRT_FX}) AS BIGINT) AS term_fx
      FROM seq, base WHERE k > {SPRT_BASELINE_DAYS}
    ),
    cum1 AS (
      SELECT day, n, x,
             CAST(SUM(term_fx) OVER (ORDER BY day) AS BIGINT) AS cum_fx
      FROM terms
    ),
    cum AS (
      SELECT day, n, x, cum_fx,
             CAST(MAX(cum_fx) OVER (ORDER BY day) AS BIGINT) AS hi,
             CAST(MIN(cum_fx) OVER (ORDER BY day) AS BIGINT) AS lo
      FROM cum1
    )
    SELECT day, n AS n_trials, x AS n_conversions,
           ROUND(CAST(cum_fx AS DOUBLE) / {_SPRT_FX}, 6) AS llr,
           CASE WHEN hi >= {bound_fx} THEN 'accept_h1'
                WHEN lo <= -{bound_fx} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    ORDER BY day
    """


@register(
    "events_sprt_conversion",
    oracle=_sprt_oracle_sql(),
    doc=f"Wald SPRT on the daily purchase-conversion rate: the first "
    f"{SPRT_BASELINE_DAYS} days fix p0 (H1 = {SPRT_LIFT}x), each later "
    "day adds one fixed-order LLR increment rounded to 1e-9 units, and "
    "the cumulative integer sum latches against the +/-ln(19) "
    "boundaries via cumulative extrema — the always-valid sequential "
    "monitor that replaces peeking at a fixed-horizon z-test. One "
    "day-keyed corpus shuffle, then O(days) windows.",
)
def events_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sprt_conversion_monitor(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Welch's unequal-variance t-test on a continuous measure — the companion
# inference readout to the proportion z-test above: "did the mean move?"
# for experiment metrics that are amounts, not conversions. Welch (not
# pooled Student) because real experiment arms rarely share a variance.
# --------------------------------------------------------------------------

_TT_A, _TT_B = "R", "N"
T_CRIT = 1.96  # two-sided 5% (normal approx; df here is in the thousands)


def welch_ttest_price(lineitem: DataFrame) -> DataFrame:
    """One-row Welch t-test of mean l_extendedprice between returnflag
    groups 'R' and 'N': (n_a, n_b, mean_a, mean_b, t_stat, df,
    significant).

    The whole test reduces to SIX exact integers in ONE map-side-combined
    aggregate — per group: row count, sum of integer cents, sum of
    squared cents (squares pass BIGINT range near sf0.1, so the sums
    route through DECIMAL(38,0) then one correctly-rounded double cast,
    the OLS moment pattern). The t statistic, Welch-Satterthwaite df, and
    the decision are fixed-order double expressions over that single row,
    shared verbatim with the oracle. Means use the shared half-up
    rounding (floor(x*1e4+0.5)/1e4 — ROUND's half-tie handling differs
    between engines on exact decimal halves, which integer-cent means can
    hit); t and df round plainly (sqrt outputs never land on decimal
    halves). significant compares the ROUNDED t so both engines decide
    from the same value.

    100 TB shape: one aggregate, no shuffle wider than the partial rows.
    """
    cents = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
    moms = lineitem.where(
        F.col("l_returnflag").isin(_TT_A, _TT_B)
    ).agg(
        *[F.expr(e).alias(a) for e, a in (
            (f"SUM(CASE WHEN l_returnflag = '{_TT_A}' THEN 1 ELSE 0 END)",
             "n_a"),
            (f"SUM(CASE WHEN l_returnflag = '{_TT_B}' THEN 1 ELSE 0 END)",
             "n_b"),
            (f"CAST(SUM(CASE WHEN l_returnflag = '{_TT_A}' THEN "
             f"CAST({cents} AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)",
             "s_a"),
            (f"CAST(SUM(CASE WHEN l_returnflag = '{_TT_B}' THEN "
             f"CAST({cents} AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)",
             "s_b"),
            (f"CAST(SUM(CASE WHEN l_returnflag = '{_TT_A}' THEN "
             f"CAST({cents} * {cents} AS DECIMAL(38,0)) ELSE 0 END) "
             "AS DOUBLE)", "q_a"),
            (f"CAST(SUM(CASE WHEN l_returnflag = '{_TT_B}' THEN "
             f"CAST({cents} * {cents} AS DECIMAL(38,0)) ELSE 0 END) "
             "AS DOUBLE)", "q_b"),
        )]
    )
    return moms.selectExpr(*_welch_select())


def _welch_select() -> list[str]:
    """The shared (Spark == DuckDB) solve over the one moment row."""
    na, nb = "CAST(n_a AS DOUBLE)", "CAST(n_b AS DOUBLE)"
    ma, mb = f"(s_a / {na})", f"(s_b / {nb})"
    va = f"((q_a - s_a * s_a / {na}) / ({na} - 1))"
    vb = f"((q_b - s_b * s_b / {nb}) / ({nb} - 1))"
    se2 = f"({va} / {na} + {vb} / {nb})"
    t = f"(({ma} - {mb}) / sqrt({se2}))"
    df = (f"({se2} * {se2} / (({va} / {na}) * ({va} / {na}) / ({na} - 1)"
          f" + ({vb} / {nb}) * ({vb} / {nb}) / ({nb} - 1)))")
    return [
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        # CAST before the divide: Spark parses the 10000.0 literal as
        # DECIMAL, so FLOOR(...)/10000.0 would return Decimal (DuckDB's
        # FLOOR stays DOUBLE) — the driver canon tolerates it but the
        # schema contract shouldn't depend on that
        f"CAST(FLOOR({ma} / 100.0 * 10000.0 + 0.5) AS DOUBLE) / 10000.0"
        " AS mean_a",
        f"CAST(FLOOR({mb} / 100.0 * 10000.0 + 0.5) AS DOUBLE) / 10000.0"
        " AS mean_b",
        f"ROUND({t}, 4) AS t_stat",
        f"ROUND({df}, 1) AS df",
        f"(abs(ROUND({t}, 4)) > {T_CRIT}) AS significant",
    ]


@register(
    "price_welch_ttest",
    oracle=f"""
    WITH moms AS (
      SELECT
        SUM(CASE WHEN l_returnflag = '{_TT_A}' THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN l_returnflag = '{_TT_B}' THEN 1 ELSE 0 END) AS n_b,
        CAST(SUM(CASE WHEN l_returnflag = '{_TT_A}' THEN
          CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE) AS s_a,
        CAST(SUM(CASE WHEN l_returnflag = '{_TT_B}' THEN
          CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE) AS s_b,
        CAST(SUM(CASE WHEN l_returnflag = '{_TT_A}' THEN
          CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE) AS q_a,
        CAST(SUM(CASE WHEN l_returnflag = '{_TT_B}' THEN
          CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE) AS q_b
      FROM lineitem WHERE l_returnflag IN ('{_TT_A}', '{_TT_B}')
    )
    SELECT {", ".join(_welch_select())} FROM moms
    """,
    doc="Welch's unequal-variance t-test of mean extendedprice between "
    "returnflag groups: six exact integer moments (squared-cents sums "
    "through DECIMAL(38,0)) in ONE map-side-combined aggregate, then the "
    "t statistic, Welch-Satterthwaite df, and the 5% decision as "
    "fixed-order double expressions over the single moment row — the "
    "continuous-metric companion to the proportion z-test, with no "
    "second pass and no shuffle wider than the partial-agg rows.",
)
def price_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return welch_ttest_price(load_table(spark, "lineitem", sf_dir))


# --------------------------------------------------------------------------
# One-way ANOVA across event types — does the group explain the value?
# eta^2 (variance explained) + the F statistic from exact per-group
# moments: the k-group generalization of the Welch test above.
# --------------------------------------------------------------------------


def value_anova_by_type(events: DataFrame) -> DataFrame:
    """One row: (n_groups, n_rows, eta_sq, f_stat) — one-way ANOVA of
    ``value`` across event types.

    The corpus reduces to THREE exact integers per group (count, sum of
    cents, sum of squared cents through DECIMAL(38,0)) in one
    map-side-combined aggregate; SS_between / SS_within / eta^2 / F are
    fixed-order double expressions over the O(groups) table, shared
    verbatim with the oracle. 100 TB shape: one aggregate, O(groups)
    tail — the 'is this dimension worth segmenting on' screen.
    """
    cents = "CAST(round(value * 100) AS BIGINT)"
    g = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"SUM({cents})").alias("s"),
        F.expr(f"SUM(CAST({cents} AS DECIMAL(38,0)) "
               f"* CAST({cents} AS DECIMAL(38,0)))").alias("q"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.expr("CAST(SUM(q) AS DOUBLE)").alias("q_tot"),
        # SS_between pieces: sum over groups of s_g^2/n_g (double; each
        # term is a fixed-order expression over exact integers)
        F.sum(F.expr("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n"))
        .alias("sb_raw"),
    )
    grand = "(CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / n_tot)"
    ss_b = f"(sb_raw - {grand})"
    ss_w = f"(q_tot - sb_raw)"
    ss_t = f"(q_tot - {grand})"
    fstat = (f"(({ss_b} / (k - 1)) / NULLIF({ss_w} / (n_tot - k), 0))")
    return tot.selectExpr(
        "CAST(k AS BIGINT) AS n_groups",
        "CAST(n_tot AS BIGINT) AS n_rows",
        f"ROUND({ss_b} / NULLIF({ss_t}, 0), 6) AS eta_sq",
        f"ROUND({fstat}, 4) AS f_stat",
    )


@register(
    "events_value_anova",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
             SUM(CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0))
                 * CAST(CAST(round(value * 100) AS BIGINT)
                        AS DECIMAL(38,0))) AS q
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_tot,
             CAST(SUM(s) AS BIGINT) AS s_tot,
             CAST(SUM(q) AS DOUBLE) AS q_tot,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb_raw
      FROM g
    )
    SELECT k AS n_groups, n_tot AS n_rows,
           ROUND((sb_raw - (CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                            / n_tot))
                 / NULLIF(q_tot - (CAST(s_tot AS DOUBLE)
                                   * CAST(s_tot AS DOUBLE) / n_tot), 0), 6)
             AS eta_sq,
           ROUND(((sb_raw - (CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                             / n_tot)) / (k - 1))
                 / NULLIF((q_tot - sb_raw) / (n_tot - k), 0), 4) AS f_stat
    FROM tot
    """,
    doc="One-way ANOVA of value across event types: three exact integer "
    "moments per group (squared cents through DECIMAL(38,0)) in ONE "
    "map-side-combined aggregate, then eta^2 (variance explained) and F "
    "as fixed-order double expressions over the O(groups) row — the "
    "k-group generalization of the Welch test, the 'worth segmenting?' "
    "screen with no second pass.",
)
def events_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_anova_by_type(load_table(spark, "events", sf_dir))

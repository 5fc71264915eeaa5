"""Distribution-drift and anomaly-detection operators over ``events`` — the
monitoring half of a training-data pipeline: has a source's value
distribution shifted (Jensen-Shannon divergence vs the corpus), and which
readings are outliers against their own recent history (rolling z-score)?

Float-parity strategy (the module's defining trick): every quantity that
crosses an aggregation is carried as an exact BIGINT — histogram bins by
integer-cent arithmetic, JS terms as round(term * 1e9) fixed-point before
the SUM (double sums are association-order-dependent; integer sums are
not), and the rolling z-score test algebraically cleared of division:
(n*x - s1)^2 > 9*(n*s2 - s1^2) over integer cents. The DuckDB oracles
replay the identical expressions, so no ROUND boundary can flip.

No reference analogue (tdiprima/covid-19-data-engineering delegates all
analytics to its warehouses); SURVEY §2 C-extensions / events battery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

JS_BINS = 32
# fixed-point scale for JS terms: each term is <= ln(2) ~ 0.69, so 1e9
# units keep 9 significant decimals and the per-type sum of <= 2*JS_BINS
# terms stays far inside BIGINT
_FX = 1_000_000_000

# p*ln(2p/(p+q)) with the 0*ln(0) := 0 convention, in c (type count in
# bin), g (global count in bin), n_t (type total), n_all (corpus total).
# Written once, shared verbatim by Spark and DuckDB so doubles are
# bit-identical before the fixed-point rounding.
_P_TERM = ("(CASE WHEN c > 0 THEN (CAST(c AS DOUBLE) / n_t) * "
           "ln(2 * (CAST(c AS DOUBLE) / n_t) / "
           "((CAST(c AS DOUBLE) / n_t) + (CAST(g AS DOUBLE) / n_all))) "
           "ELSE 0.0 END)")
_Q_TERM = ("(CASE WHEN g > 0 THEN (CAST(g AS DOUBLE) / n_all) * "
           "ln(2 * (CAST(g AS DOUBLE) / n_all) / "
           "((CAST(c AS DOUBLE) / n_t) + (CAST(g AS DOUBLE) / n_all))) "
           "ELSE 0.0 END)")
_JS_FIXED = (f"CAST(round({_P_TERM} * {_FX}) AS BIGINT) + "
             f"CAST(round({_Q_TERM} * {_FX}) AS BIGINT)")


def js_divergence_by_type(events: DataFrame, bins: int = JS_BINS) -> DataFrame:
    """Jensen-Shannon divergence of each event_type's ``value`` histogram
    vs the whole corpus — (event_type, n_events, js_divergence).

    100 TB shape: bin assignment is a map-side integer expression off three
    O(1) broadcast scalars (global min/max cents, corpus count); the only
    corpus-wide work is one map-side-combined groupBy on (type, bin). The
    JS reduction then runs on <= types * bins aggregated rows: a dense
    type x bin grid (cross join of two tiny aggregates) left-joined with
    the observed counts, fixed-point term sums, done. Nothing after the
    first groupBy ever sees the corpus.
    """
    lim = events.agg(
        F.min(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("lo"),
        F.max(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("hi"),
        F.count(F.lit(1)).alias("n_all"),
    )
    binned = (
        events.crossJoin(F.broadcast(lim))
        .select(
            "event_type",
            F.expr(f"CAST((CAST(round(value * 100) AS BIGINT) - lo) * {bins} "
                   "DIV (hi - lo + 1) AS BIGINT)").alias("b"),
        )
    )
    cnt = binned.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("c"))
    per_type = cnt.groupBy("event_type").agg(F.sum("c").alias("n_t"))
    per_bin = cnt.groupBy("b").agg(F.sum("c").alias("g"))
    grid = (
        per_type.crossJoin(F.broadcast(per_bin))
        .join(cnt, ["event_type", "b"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .crossJoin(F.broadcast(lim.select("n_all")))
    )
    return (
        grid.groupBy("event_type")
        .agg(
            F.max("n_t").alias("n_events"),
            F.sum(F.expr(_JS_FIXED)).alias("js_fx"),
        )
        .select(
            "event_type",
            "n_events",
            F.round(F.expr(f"(CAST(js_fx AS DOUBLE) / 2.0) / {_FX}"), 6)
            .alias("js_divergence"),
        )
        .orderBy("event_type")
    )


@register(
    "events_drift_js",
    oracle=f"""
    WITH lim AS (
      SELECT MIN(CAST(round(value * 100) AS BIGINT)) AS lo,
             MAX(CAST(round(value * 100) AS BIGINT)) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_all
      FROM events
    ),
    binned AS (
      SELECT event_type,
             CAST((CAST(round(value * 100) AS BIGINT) - lo) * {JS_BINS}
                  // (hi - lo + 1) AS BIGINT) AS b
      FROM events, lim
    ),
    cnt AS (
      SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM binned GROUP BY event_type, b
    ),
    per_type AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_t FROM cnt GROUP BY event_type
    ),
    per_bin AS (
      SELECT b, CAST(SUM(c) AS BIGINT) AS g FROM cnt GROUP BY b
    ),
    grid AS (
      SELECT t.event_type, t.n_t, p.b, p.g,
             CAST(COALESCE(c.c, 0) AS BIGINT) AS c,
             (SELECT n_all FROM lim) AS n_all
      FROM per_type t CROSS JOIN per_bin p
      LEFT JOIN cnt c ON c.event_type = t.event_type AND c.b = p.b
    )
    SELECT event_type,
           MAX(n_t) AS n_events,
           ROUND((CAST(SUM({_JS_FIXED}) AS DOUBLE) / 2.0) / {_FX}, 6)
             AS js_divergence
    FROM grid
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=f"Jensen-Shannon divergence of each event_type's value histogram "
    f"vs the whole corpus over {JS_BINS} equal-width integer-cent bins — "
    "the drift monitor a mixture pipeline runs per source per day. One "
    "map-side-combined groupBy on (type, bin) is the only corpus-wide "
    "work; the JS reduction runs on the tiny dense grid with fixed-point "
    "BIGINT term sums so the readout is association-order-independent and "
    "bit-identical to the oracle.",
)
def events_drift_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    return js_divergence_by_type(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Rolling z-score anomalies: each reading vs its own user's recent history.
# --------------------------------------------------------------------------

_HIST = 12   # rolling window: the 12 prior readings of the same user
_MIN_N = 8   # score only with at least 8 prior readings
_Z2 = 9      # |z| > 3  <=>  (x - mean)^2 > 9 * var

# the z-test with division cleared: (n*x - s1)^2 > Z2 * (n*s2 - s1^2)
# over integer cents — no float exists anywhere in the decision
_ANOM_EXPR = (f"CASE WHEN n >= {_MIN_N} AND "
              f"(n * x - s1) * (n * x - s1) > {_Z2} * (n * s2 - s1 * s1) "
              "THEN 1 ELSE 0 END")


def rolling_zscore_anomalies(events: DataFrame,
                             hist: int = _HIST) -> DataFrame:
    """Per event_type: how many readings sit more than 3 rolling standard
    deviations from that user's trailing mean — (event_type, n_scored,
    n_anomalies, anomaly_rate).

    100 TB shape: one shuffle on user_id (high-cardinality, uniform), then
    a bounded ROWS window per user — map-only after the partition. The
    z-test runs entirely in BIGINT cents with the division cleared
    algebraically, so Spark and the oracle decide identically with no
    float boundary; the rolling sums are integer, immune to the
    segment-tree vs streaming summation-order differences that make
    floating window AVG/STDDEV engine-dependent.
    """
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-hist, -1))
    scored = events.select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).over(w).alias("s1"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT) * "
                     "CAST(round(value * 100) AS BIGINT)")).over(w).alias("s2"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum(F.expr(f"CASE WHEN n >= {_MIN_N} THEN 1 ELSE 0 END"))
            .alias("n_scored"),
            F.sum(F.expr(_ANOM_EXPR)).alias("n_anomalies"),
        )
        .select(
            "event_type", "n_scored", "n_anomalies",
            F.round(F.expr("CAST(n_anomalies AS DOUBLE) / n_scored"), 6)
            .alias("anomaly_rate"),
        )
        .orderBy("event_type")
    )


@register(
    "events_rolling_anomalies",
    oracle=f"""
    WITH scored AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)) OVER w,
                           0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT) *
                               CAST(round(value * 100) AS BIGINT)) OVER w,
                           0) AS BIGINT) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_HIST} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN n >= {_MIN_N} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_scored,
           CAST(SUM({_ANOM_EXPR}) AS BIGINT) AS n_anomalies,
           ROUND(CAST(SUM({_ANOM_EXPR}) AS DOUBLE) /
                 SUM(CASE WHEN n >= {_MIN_N} THEN 1 ELSE 0 END), 6)
             AS anomaly_rate
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=f"Rolling z-score anomaly counts: a reading is anomalous when it "
    f"sits more than 3 trailing standard deviations from the same user's "
    f"previous <= {_HIST} readings (scored only with >= {_MIN_N} of "
    "history). One user-keyed shuffle then a bounded ROWS window; the "
    "z-test is cleared of division into pure BIGINT-cent arithmetic "
    "((n*x - s1)^2 > 9*(n*s2 - s1^2)) so both engines decide identically "
    "with zero float boundaries.",
)
def events_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_zscore_anomalies(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# p-chart (attribute control chart): hourly error-rate vs binomial
# 3-sigma limits around the corpus rate — the SPC classic, as one pass.
# --------------------------------------------------------------------------

# decision with the division cleared: |e*N - n*E| > 3*sqrt(E*(N-E)*n).
# LHS is an exact BIGINT product cast once; sqrt is correctly rounded in
# both engines, so identical integer input -> identical double -> an
# identical comparison. No rate is ever divided before the decision.
_OOC_EXPR = ("CASE WHEN CAST(abs(e * n_all - n * e_all) AS DOUBLE) > "
             "3 * sqrt(CAST(e_all AS DOUBLE) * (n_all - e_all) * n) "
             "THEN 1 ELSE 0 END")


def error_control_chart(events: DataFrame) -> DataFrame:
    """Hourly p-chart of the error-event share — (hour, n_events,
    n_errors, error_rate, out_of_control).

    100 TB shape: one map-side-combined groupBy on the hour bucket (two
    conditional counts), corpus totals broadcast in-plan; the 3-sigma
    binomial test is decided from exact integer counts with the division
    algebraically cleared, so both engines flag the identical hours. The
    chart length grows with calendar time, never event volume.
    """
    hours = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .alias("e"),
        )
    )
    totals = hours.agg(F.sum("n").alias("n_all"), F.sum("e").alias("e_all"))
    return (
        hours.crossJoin(F.broadcast(totals))
        .select(
            "hour",
            F.col("n").alias("n_events"),
            F.col("e").alias("n_errors"),
            F.round(F.expr("CAST(e AS DOUBLE) / n"), 6).alias("error_rate"),
            F.expr(_OOC_EXPR).alias("out_of_control"),
        )
        .orderBy("hour")
    )


@register(
    "events_error_control_chart",
    oracle=f"""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS e
      FROM events GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(e) AS BIGINT) AS e_all
      FROM hours
    )
    SELECT hour, n AS n_events, e AS n_errors,
           ROUND(CAST(e AS DOUBLE) / n, 6) AS error_rate,
           {_OOC_EXPR} AS out_of_control
    FROM hours, totals
    ORDER BY hour
    """,
    doc="Hourly p-chart: error-event share per hour vs 3-sigma binomial "
    "control limits around the corpus rate — the SPC monitor an ingest "
    "pipeline runs to catch a bad upstream deploy. One hour-keyed "
    "map-side-combined groupBy + broadcast totals; the limit test is "
    "decided as |e*N - n*E| > 3*sqrt(E*(N-E)*n) from exact BIGINTs "
    "(division cleared, sqrt correctly rounded in both engines), so the "
    "flagged hours are engine-identical.",
)
def events_error_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return error_control_chart(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# CUSUM changepoint detection over the daily value series.
# --------------------------------------------------------------------------

def cusum_daily_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM changepoint scan over the daily value totals: the cumulative
    deviation from the series mean, with the day of maximum |deviation|
    flagged — the classic "when did the level shift?" estimator (the
    argmax of the CUSUM statistic is the maximum-likelihood single
    changepoint for a mean shift).

    Exactness: daily totals are exact integer cents (per-event
    round(value*100) then a BIGINT sum); the CUSUM deviation at day k is
    carried multiplied out as  d_k = n*cum_k - k*total  (all BIGINT, no
    float crosses an aggregation), so the flagged day is engine-identical.

    100 TB shape: one map-side-combined groupBy on the day — the only
    corpus-wide work. Everything after runs on O(distinct days) rows
    (bounded by calendar time, never event volume), where the single tiny
    ordered window is harmless — the same O(chart-length) posture as the
    control chart above.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("x_fp"))
    )
    totals = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("x_fp").alias("total_fp")
    )
    w = Window.orderBy("day")  # O(distinct days) rows — harmless
    cum = (
        daily.crossJoin(F.broadcast(totals))
        .withColumn("k", F.row_number().over(w))
        .withColumn("cum_fp", F.sum("x_fp").over(w))
        .withColumn("d_fp", F.expr("n_days * cum_fp - k * total_fp"))
    )
    mx = cum.agg(F.max(F.abs(F.col("d_fp"))).alias("d_max"))
    return (
        cum.crossJoin(F.broadcast(mx))
        .select(
            "day",
            F.col("x_fp").alias("daily_cents"),
            F.round(F.expr("CAST(d_fp AS DOUBLE) / (n_days * 100.0)"), 4)
            .alias("cusum_dollars"),
            (F.abs(F.col("d_fp")) == F.col("d_max")).alias("is_changepoint"),
        )
        .orderBy("day")
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x_fp
      FROM events GROUP BY 1
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x_fp) AS BIGINT) AS total_fp
      FROM daily
    ),
    cum AS (
      SELECT day, x_fp, n_days,
             ROW_NUMBER() OVER (ORDER BY day) AS k,
             SUM(x_fp) OVER (ORDER BY day) AS cum_fp
      FROM daily, totals
    ),
    dev AS (
      SELECT day, x_fp, n_days,
             n_days * cum_fp - k * (SELECT total_fp FROM totals) AS d_fp
      FROM cum
    )
    SELECT day, x_fp AS daily_cents,
           ROUND(CAST(d_fp AS DOUBLE) / (n_days * 100.0), 4) AS cusum_dollars,
           abs(d_fp) = (SELECT MAX(abs(d_fp)) FROM dev) AS is_changepoint
    FROM dev
    ORDER BY day
    """,
    doc="CUSUM changepoint scan over daily value totals: cumulative "
    "deviation from the series mean with the max-|deviation| day flagged "
    "(the ML single-changepoint estimator for a mean shift). One day-keyed "
    "map-side-combined groupBy is the only corpus-wide work; the deviation "
    "is carried as n*cum - k*total in exact BIGINT cents so the flagged "
    "day is engine-identical, and the ordered window runs over "
    "O(calendar-days) rows only.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_daily_changepoint(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Binned two-sample Kolmogorov-Smirnov drift between event types.
# --------------------------------------------------------------------------

KS_BINS = 256
_KS_A = "view"
_KS_B = "click"
# Kolmogorov two-sided 5% critical coefficient
_KS_C05 = 1.3581


def ks_binned_two_sample(events: DataFrame, type_a: str = _KS_A,
                         type_b: str = _KS_B,
                         bins: int = KS_BINS) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two event types: max ECDF gap over a shared
    equal-width integer-cent grid, with the 5% significance decision.

    The binned statistic is the exact KS of the binned distributions (a
    conservative reading of the continuous one); the ECDF gap is compared
    cross-multiplied —  |cumA*nB - cumB*nA|  in BIGINT — so the argmax
    bin and the max are engine-identical with no float anywhere in the
    scan. The one float expression (the critical value) is a single
    fixed-order formula over four integers.

    100 TB shape: bin assignment is a map-side expression off a broadcast
    1-row min/max; one map-side-combined groupBy on the bin is the only
    corpus-wide work; the ECDF window runs over <= bins observed rows.
    ECDFs only change at observed bins, so the max over observed bins is
    the max over the full grid.
    """
    two = events.filter(F.col("event_type").isin(type_a, type_b))
    lim = two.agg(
        F.min(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("lo"),
        F.max(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("hi"),
    )
    binned = two.crossJoin(F.broadcast(lim)).select(
        F.expr(f"CAST((CAST(round(value * 100) AS BIGINT) - lo) * {bins} "
               "DIV (hi - lo + 1) AS BIGINT)").alias("b"),
        (F.col("event_type") == type_a).cast("long").alias("in_a"),
    )
    cnt = binned.groupBy("b").agg(
        F.sum("in_a").alias("ca"), F.sum(1 - F.col("in_a")).alias("cb")
    )
    w = Window.orderBy("b")  # O(bins) rows — harmless
    ecdf = (
        cnt.withColumn("cum_a", F.sum("ca").over(w))
        .withColumn("cum_b", F.sum("cb").over(w))
    )
    tot = cnt.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    gaps = (
        ecdf.crossJoin(F.broadcast(tot))
        .withColumn("gap_fp", F.abs(F.expr("cum_a * nb - cum_b * na")))
    )
    mx = gaps.agg(F.max("gap_fp").alias("gap_max"))
    # tie-break the argmax bin to the smallest bin index, deterministically
    return (
        gaps.crossJoin(F.broadcast(mx))
        .groupBy()
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.max("gap_fp").alias("gap_max"),
            F.min(F.when(F.col("gap_fp") == F.col("gap_max"), F.col("b")))
            .alias("ks_bin"),
        )
        .select(
            "n_a", "n_b", "ks_bin",
            F.round(F.expr("CAST(gap_max AS DOUBLE) / (n_a * n_b)"), 6)
            .alias("ks_stat"),
            F.expr(f"CAST(gap_max AS DOUBLE) / (n_a * n_b) > "
                   f"{_KS_C05} * sqrt(CAST(n_a + n_b AS DOUBLE) / "
                   "(CAST(n_a AS DOUBLE) * n_b))").alias("significant_5pct"),
        )
    )


@register(
    "events_ks_drift",
    oracle=f"""
    WITH two AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    lim AS (
      SELECT MIN(CAST(round(value * 100) AS BIGINT)) AS lo,
             MAX(CAST(round(value * 100) AS BIGINT)) AS hi
      FROM two
    ),
    binned AS (
      SELECT CAST((CAST(round(value * 100) AS BIGINT) - lo) * {KS_BINS}
                  // (hi - lo + 1) AS BIGINT) AS b,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS in_a
      FROM two, lim
    ),
    cnt AS (
      SELECT b, CAST(SUM(in_a) AS BIGINT) AS ca,
             CAST(SUM(1 - in_a) AS BIGINT) AS cb
      FROM binned GROUP BY b
    ),
    ecdf AS (
      SELECT b, ca, cb,
             SUM(ca) OVER (ORDER BY b) AS cum_a,
             SUM(cb) OVER (ORDER BY b) AS cum_b
      FROM cnt
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM cnt
    ),
    gaps AS (
      SELECT b, na, nb, abs(cum_a * nb - cum_b * na) AS gap_fp
      FROM ecdf, tot
    )
    SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
           MIN(CASE WHEN gap_fp = (SELECT MAX(gap_fp) FROM gaps) THEN b END)
             AS ks_bin,
           ROUND(CAST(MAX(gap_fp) AS DOUBLE) / (MAX(na) * MAX(nb)), 6)
             AS ks_stat,
           CAST(MAX(gap_fp) AS DOUBLE) / (MAX(na) * MAX(nb)) >
             {_KS_C05} * sqrt(CAST(MAX(na) + MAX(nb) AS DOUBLE) /
                              (CAST(MAX(na) AS DOUBLE) * MAX(nb)))
             AS significant_5pct
    FROM gaps
    """,
    doc=f"Binned two-sample Kolmogorov-Smirnov drift between the "
    f"'{_KS_A}' and '{_KS_B}' value distributions over {KS_BINS} shared "
    "equal-width integer-cent bins: max ECDF gap compared cross-"
    "multiplied (|cumA*nB - cumB*nA| in BIGINT) so the statistic and its "
    "argmax bin are engine-identical, plus the 5% Kolmogorov decision. "
    "One bin-keyed map-side-combined groupBy is the only corpus-wide "
    "work; the ECDF window runs over <= bins rows.",
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_binned_two_sample(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Autocorrelation profile of the daily value series.
# --------------------------------------------------------------------------

ACF_MAX_LAG = 7
# fixed-point downscale for centered cross products: terms are rounded to
# units of 1e6 (squared-cents) before the SUM so the sums are association-
# order-independent while the per-term double product stays deterministic
_ACF_DOWN = 1_000_000


def acf_daily_profile(events: DataFrame,
                      max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """Autocorrelation of the daily value-total series at lags 1..max_lag
    — the seasonality/persistence readout (a weekly cycle shows as a
    lag-7 peak) every forecasting pipeline starts from.

    Estimator: r_l = sum_t (x_t - m)(x_{t-l} - m) / sum_t (x_t - m)^2
    with m the full-series mean, computed over the observed-day sequence.
    Centered values are carried multiplied out (c_t = n*x_t - S, exact
    BIGINT off integer-cent daily totals); each cross product is ONE
    double multiply (deterministic in both engines) rounded to fixed
    point before the SUM, so no association-order float sum exists.

    100 TB shape: one day-keyed map-side-combined groupBy; the lag
    windows run over O(calendar-days) rows.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("x_fp"))
    )
    totals = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("x_fp").alias("total_fp")
    )
    w = Window.orderBy("day")  # O(distinct days) rows — harmless
    centered = (
        daily.crossJoin(F.broadcast(totals))
        .withColumn("c", F.expr("n_days * x_fp - total_fp"))
    )
    lagged = centered.select(
        "day", "c", "n_days",
        *[F.lag("c", l).over(w).alias(f"c_l{l}") for l in range(1, max_lag + 1)],
    )
    den = lagged.agg(
        F.sum(F.expr(f"CAST(round(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) "
                     f"/ {_ACF_DOWN}) AS BIGINT)")).alias("den_fp")
    )
    # one explode stacks all lags so every lag aggregates in a single pass
    # over the tiny day table (no per-lag re-scan of the corpus groupBy)
    stacked = lagged.select(
        "c",
        F.explode(F.array(*[
            F.struct(F.lit(l).cast("int").alias("lag"),
                     F.col(f"c_l{l}").alias("cl"))
            for l in range(1, max_lag + 1)
        ])).alias("e"),
    ).select("c", F.col("e.lag").alias("lag"), F.col("e.cl").alias("cl"))
    acf = stacked.groupBy("lag").agg(
        F.sum(F.col("cl").isNotNull().cast("long")).alias("n_pairs"),
        F.sum(F.expr(
            f"CAST(round(CAST(c AS DOUBLE) * CAST(cl AS DOUBLE) "
            f"/ {_ACF_DOWN}) AS BIGINT)")).alias("num_fp"),
    )
    return (
        acf.crossJoin(F.broadcast(den))
        .select(
            "lag", "n_pairs",
            F.round(F.expr("CAST(num_fp AS DOUBLE) / den_fp"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "events_acf_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x_fp
      FROM events GROUP BY 1
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x_fp) AS BIGINT) AS total_fp
      FROM daily
    ),
    centered AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS k,
             n_days * x_fp - total_fp AS c
      FROM daily, totals
    ),
    lags AS (
      SELECT CAST(range AS INTEGER) AS lag FROM range(1, {ACF_MAX_LAG} + 1)
    ),
    pairs AS (
      SELECT l.lag, a.c AS c, b.c AS cl
      FROM lags l
      CROSS JOIN centered a
      LEFT JOIN centered b ON b.k = a.k - l.lag
    ),
    den AS (
      SELECT CAST(SUM(CAST(round(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
                           / {_ACF_DOWN}) AS BIGINT)) AS BIGINT) AS den_fp
      FROM centered
    )
    SELECT lag,
           CAST(COUNT(cl) AS BIGINT) AS n_pairs,
           ROUND(CAST(CAST(SUM(CASE WHEN cl IS NOT NULL THEN
                     CAST(round(CAST(c AS DOUBLE) * CAST(cl AS DOUBLE)
                          / {_ACF_DOWN}) AS BIGINT) END) AS BIGINT) AS DOUBLE)
                 / (SELECT den_fp FROM den), 6) AS acf
    FROM pairs
    GROUP BY lag
    ORDER BY lag
    """,
    doc=f"Autocorrelation of the daily value-total series at lags "
    f"1..{ACF_MAX_LAG} — the seasonality/persistence readout (a weekly "
    "cycle peaks at lag 7). Centered values carried multiplied out "
    "(n*x - S, exact BIGINT cents); each cross product is one "
    "deterministic double multiply rounded to fixed point before the SUM, "
    "so no association-order float sum exists. One day-keyed map-side-"
    "combined groupBy is the only corpus-wide work; all lags stack "
    "through one explode so the tiny day table aggregates in a single "
    "pass.",
)
def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return acf_daily_profile(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Day-of-week seasonality profile of the daily value series.
# --------------------------------------------------------------------------

def dow_seasonality_profile(events: DataFrame) -> DataFrame:
    """Per day-of-week (1 = Sunday .. 7 = Saturday, Spark's dayofweek
    convention): days observed, total value, and the seasonal index —
    that weekday's mean daily total over the all-days mean. The
    deseasonalization factor a forecast or anomaly pipeline divides by
    before comparing days; index > 1 = structurally busy weekday.

    Exactness: index = (sum_dow * N) / (n_dow * S) — one fixed-order
    double off four exact BIGINTs per row. 100 TB shape: one day-keyed
    map-side-combined groupBy, then O(7) rows.
    """
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("x_fp"))
    )
    per_dow = daily.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x_fp").alias("total_cents"),
    )
    tot = per_dow.agg(
        F.sum("n_days").alias("n_all"), F.sum("total_cents").alias("s_all")
    )
    return (
        per_dow.crossJoin(F.broadcast(tot))
        .select(
            "dow", "n_days", "total_cents",
            F.round(
                F.expr("(CAST(total_cents AS DOUBLE) * n_all) "
                       "/ (CAST(n_days AS DOUBLE) * s_all)"), 6
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@register(
    "events_dow_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x_fp
      FROM events GROUP BY 1
    ),
    per_dow AS (
      -- +1: DuckDB dayofweek is 0=Sunday..6, Spark's is 1=Sunday..7
      SELECT CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x_fp) AS BIGINT) AS total_cents
      FROM daily GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_days) AS BIGINT) AS n_all,
             CAST(SUM(total_cents) AS BIGINT) AS s_all
      FROM per_dow
    )
    SELECT dow, n_days, total_cents,
           ROUND((CAST(total_cents AS DOUBLE) * n_all)
                 / (CAST(n_days AS DOUBLE) * s_all), 6) AS seasonal_index
    FROM per_dow, tot
    ORDER BY dow
    """,
    doc="Day-of-week seasonality profile of daily value totals: per "
    "weekday, the mean-daily-total ratio vs the all-days mean (the "
    "deseasonalization factor), computed as (sum_dow * N)/(n_dow * S) "
    "off exact BIGINTs. One day-keyed map-side-combined groupBy, then "
    "O(7) rows — the calendar twin of the ACF profile above.",
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dow_seasonality_profile(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Benford first-digit audit of order totals.
# --------------------------------------------------------------------------

_BENFORD_FX = 1_000_000


def benford_first_digit(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit distribution of ``amount_col`` vs
    Benford's law, with the chi-square fit — the classic fabricated-
    numbers audit (real multiplicative amounts follow
    P(d) = log10(1 + 1/d); injected or invented ones usually don't).

    (digit, n_obs, observed_share, benford_share, chi_square) — one row
    per digit 1..9, the corpus-level chi-square repeated per row.

    Exactness: the digit is the first character of the integer-cent
    STRING (no float log in the extraction); expected shares are the 9
    fixed literals ln(1+1/d)/ln(10) evaluated identically; chi-square
    terms are fixed-pointed before the 9-term sum. One digit-keyed
    map-side-combined groupBy is the only corpus-wide work.
    """
    digits = df.select(
        F.expr(f"CAST(substring(CAST(CAST(round({amount_col} * 100) AS "
               "BIGINT) AS STRING), 1, 1) AS INT)").alias("digit")
    ).where(F.col("digit") >= 1)
    cnt = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = cnt.agg(F.sum("n_obs").alias("n"))
    share = "(ln(1.0 + 1.0 / digit) / ln(10.0))"
    term = (f"CAST(round((CAST(n_obs AS DOUBLE) - n * {share}) * "
            f"(CAST(n_obs AS DOUBLE) - n * {share}) / (n * {share}) "
            f"* {_BENFORD_FX}) AS BIGINT)")
    terms = cnt.crossJoin(F.broadcast(tot)).withColumn(
        "term_fx", F.expr(term))
    chi = terms.agg(F.sum("term_fx").alias("chi_fx"))
    return (
        terms.crossJoin(F.broadcast(chi))
        .select(
            "digit", "n_obs",
            F.round(F.expr("CAST(n_obs AS DOUBLE) / n"), 6)
            .alias("observed_share"),
            F.round(F.expr(share), 6).alias("benford_share"),
            F.round(F.expr(f"CAST(chi_fx AS DOUBLE) / {_BENFORD_FX}"), 4)
            .alias("chi_square"),
        )
        .orderBy("digit")
    )


@register(
    "orders_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
    ),
    cnt AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM digits WHERE digit >= 1 GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cnt),
    terms AS (
      SELECT digit, n_obs, n,
             CAST(round((CAST(n_obs AS DOUBLE)
                         - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
                        * (CAST(n_obs AS DOUBLE)
                           - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
                        / (n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
                        * {_BENFORD_FX}) AS BIGINT) AS term_fx
      FROM cnt, tot
    ),
    chi AS (SELECT CAST(SUM(term_fx) AS BIGINT) AS chi_fx FROM terms)
    SELECT digit, n_obs,
           ROUND(CAST(n_obs AS DOUBLE) / n, 6) AS observed_share,
           ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_share,
           ROUND(CAST(chi_fx AS DOUBLE) / {_BENFORD_FX}, 4) AS chi_square
    FROM terms, chi
    ORDER BY digit
    """,
    doc="Benford first-digit audit of o_totalprice: observed vs "
    "log10(1+1/d) shares per digit with the chi-square fit — the "
    "fabricated-numbers screen. Digits extract from the integer-cent "
    "STRING (no float log in the hot path); chi-square terms are "
    "fixed-pointed before the 9-term sum; one digit-keyed map-side-"
    "combined groupBy is the only corpus-wide work.",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_first_digit(load_table(spark, "orders", sf_dir),
                               "o_totalprice")


# --------------------------------------------------------------------------
# Lagged cross-correlation between two event-type daily series — the
# lead-lag discovery readout ("do clicks today predict purchases in k
# days?") behind attribution windows and forecasting features.
# --------------------------------------------------------------------------

XCORR_X, XCORR_Y = "click", "purchase"
XCORR_MAX_LAG = 7


def daily_xcorr(events: DataFrame, x_type: str = XCORR_X,
                y_type: str = XCORR_Y,
                max_lag: int = XCORR_MAX_LAG) -> DataFrame:
    """(lag, n_days, r) — Pearson correlation between the x-series daily
    count on day d and the y-series daily count on day d+lag, for lags
    0..max_lag, over days where BOTH series observed data (inner join:
    an absent day is missing data, not an implicit zero — stated because
    the two conventions genuinely differ and the oracle must share one).

    Exactness: the corpus reduces to per-(day, type) BIGINT counts in one
    map-side-combined groupBy; each lag's five moments are exact integer
    sums over the tiny joined day table, and r is one fixed-order double
    expression (NULL when either series is constant — zero variance has
    no defined correlation). 100 TB shape: the only corpus-wide work is
    the one (day, type) rollup; the lag join runs on O(days) rows, which
    grows with calendar time, never event volume.
    """
    daily = (
        events.where(F.col("event_type").isin(x_type, y_type))
        .groupBy(
            F.expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') "
                   "AS BIGINT)").alias("d"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    x = daily.where(F.col("event_type") == x_type).select(
        F.col("d").alias("xd"), F.col("n").alias("x"))
    y = daily.where(F.col("event_type") == y_type).select(
        F.col("d").alias("yd"), F.col("n").alias("y"))
    lags = F.explode(
        F.sequence(F.lit(0), F.lit(max_lag))).alias("lag")
    pairs = (
        x.select(lags, "xd", "x")
        .join(y, F.col("yd") == F.col("xd") + F.col("lag"))
    )
    moms = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    r = ("((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) "
         "/ sqrt(NULLIF((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
         " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0)))")
    return (
        moms.selectExpr(
            "CAST(lag AS INT) AS lag",
            "CAST(n AS BIGINT) AS n_days",
            f"ROUND({r}, 6) AS r",
        )
        .orderBy("lag")
    )


@register(
    "events_xcorr_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('{XCORR_X}', '{XCORR_Y}')
      GROUP BY 1, 2
    ),
    x AS (SELECT d AS xd, n AS x FROM daily
          WHERE event_type = '{XCORR_X}'),
    y AS (SELECT d AS yd, n AS y FROM daily
          WHERE event_type = '{XCORR_Y}'),
    lags AS (SELECT UNNEST(range(0, {XCORR_MAX_LAG + 1})) AS lag),
    pairs AS (
      SELECT lag, x.x, y.y FROM x CROSS JOIN lags
      JOIN y ON y.yd = x.xd + lag
    ),
    moms AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, n AS n_days,
           ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / sqrt(NULLIF((CAST(n AS DOUBLE) * sxx
                                 - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy), 0))), 6) AS r
    FROM moms ORDER BY lag
    """,
    doc=f"Lagged cross-correlation (lags 0..{XCORR_MAX_LAG}) between the "
    f"'{XCORR_X}' and '{XCORR_Y}' daily count series: one (day, type) "
    "map-side-combined rollup reduces the corpus to O(days) BIGINT "
    "counts; each lag's Pearson r comes from exact integer moments over "
    "the inner-joined day pairs with a fixed-order double solve — the "
    "lead-lag discovery behind attribution windows, at a tail cost that "
    "grows with calendar time, never event volume.",
)
def events_xcorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_xcorr(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Burstiness coefficient of inter-event times — B = (sigma - mu) /
# (sigma + mu) per event type (Goh & Barabasi 2008): -1 for a periodic
# process, ~0 for Poisson, -> +1 for heavy-tailed bursts. The one-number
# answer to "is this traffic human-bursty or machine-regular?" that
# sizes rate limits and anomaly baselines.
# --------------------------------------------------------------------------


def burstiness_by_type(events: DataFrame) -> DataFrame:
    """(event_type, n_gaps, mean_gap_s, burstiness) — per type, the
    burstiness of per-user inter-event times.

    Gaps are exact integer microseconds from one (user, type)-keyed lag
    window; the three moments are exact (the squared-micros sums route
    through DECIMAL(38,0) — a 30-day gap squares to ~7e24); sigma is the
    POPULATION deviation (stated; both engines share the expression) and
    B is one fixed-order double readout. 100 TB shape: one window
    shuffle keyed (user, type) with O(1) state, then an O(types) tail.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    gaps = (
        events.select(
            "user_id", "event_type", "event_id",
            F.expr("CAST(ts AS TIMESTAMP)").alias("tts"),
        )
        .withColumn("gap_us", F.expr(
            "unix_micros(tts) - unix_micros(lag(tts) OVER ("
            "PARTITION BY user_id, event_type ORDER BY tts, event_id))"))
        .where(F.col("gap_us").isNotNull())
    )
    moms = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_us").alias("s"),
        F.sum(F.expr("CAST(gap_us AS DECIMAL(38,0)) "
                     "* CAST(gap_us AS DECIMAL(38,0))")).alias("q"),
    )
    mu = "(CAST(s AS DOUBLE) / n)"
    sigma = (f"sqrt((CAST(q AS DOUBLE) - {mu} * {mu} * n) / n)")
    return (
        moms.selectExpr(
            "event_type",
            "CAST(n AS BIGINT) AS n_gaps",
            f"ROUND({mu} / 1e6, 4) AS mean_gap_s",
            f"ROUND(({sigma} - {mu}) / ({sigma} + {mu}), 6) AS burstiness",
        )
        .orderBy("event_type")
    )


@register(
    "events_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_us
      FROM events
    ),
    moms AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap_us) AS BIGINT) AS s,
             SUM(CAST(gap_us AS DECIMAL(38,0))
                 * CAST(gap_us AS DECIMAL(38,0))) AS q
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n AS n_gaps,
           ROUND((CAST(s AS DOUBLE) / n) / 1e6, 4) AS mean_gap_s,
           ROUND((sqrt((CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n)
                        * (CAST(s AS DOUBLE) / n) * n) / n)
                  - (CAST(s AS DOUBLE) / n))
                 / (sqrt((CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n)
                          * (CAST(s AS DOUBLE) / n) * n) / n)
                    + (CAST(s AS DOUBLE) / n)), 6) AS burstiness
    FROM moms ORDER BY event_type
    """,
    doc="Burstiness B = (sigma - mu)/(sigma + mu) of per-user inter-event "
    "times per type (Goh-Barabasi): -1 periodic, ~0 Poisson, +1 bursty. "
    "Exact integer-microsecond gaps from one (user, type) window, "
    "squared sums through DECIMAL(38,0), population sigma stated "
    "identically on both engines — the traffic-shape diagnostic that "
    "sizes rate limits, at one bounded-state window.",
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return burstiness_by_type(load_table(spark, "events", sf_dir))

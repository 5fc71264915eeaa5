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

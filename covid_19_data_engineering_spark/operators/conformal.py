"""Split-conformal prediction intervals — distribution-free uncertainty
quantification (Vovk et al. 2005; Lei et al. 2018) in its simplest honest
form: hold out a calibration half, measure nonconformity |y - prediction|
there, and take the ceil((n+1)(1-alpha))-th smallest score as the interval
half-width. The guarantee (coverage >= 1 - alpha on exchangeable data) holds
for ANY predictor; here the predictor is the calibration mean per event
type, so every ingredient is an exact aggregate and the whole procedure —
split, scores, order statistic, coverage — replays in the oracle.

100 TB shape: the split is a stateless md5 bucket (no sampling pass), the
per-type stats are one map-side-combined groupBy, the order statistic ranks
only the CALIBRATION rows of each type (a per-type window — at extreme type
cardinality skew the histogram-refine quantile pass in
operators/quantiles.py is the drop-in replacement), and coverage is one
more aggregate over the test half.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

CONF_ALPHA_NUM = 9  # 1 - alpha = 9/10, kept as integers so the rank
CONF_ALPHA_DEN = 10  # k = ceil((n+1) * 9/10) is exact on both engines
CONF_MIN_CAL = 20   # types below this calibration mass are dropped (the
# finite-sample rank k would exceed n_cal -> infinite interval)

_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
_BUCKET = ("conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
           " % 2")


def conformal_value_intervals(events: DataFrame) -> DataFrame:
    """Per event type: calibration-mean predictor, split-conformal
    half-width q at 90% target coverage, and the MEASURED coverage on the
    held-out half (the honesty check — on exchangeable data it lands at
    or above 900000 in 1e-6 units, up to finite-sample noise)."""
    base = events.selectExpr(
        "event_type",
        "event_id",
        f"{_CENTS} AS cents",
        f"CAST({_BUCKET} AS INT) AS bucket",
    )
    cal = base.where(F.col("bucket") == 0)
    test = base.where(F.col("bucket") == 1)
    stats = (
        cal.groupBy("event_type")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n_cal"))
        .where(F.col("n_cal") >= CONF_MIN_CAL)
        .selectExpr(
            "event_type", "n_cal",
            "CAST(s AS DOUBLE) / n_cal AS mu",
            f"(({CONF_ALPHA_NUM} * (n_cal + 1)) + {CONF_ALPHA_DEN - 1})"
            f" div {CONF_ALPHA_DEN} AS krank",
        )
    )
    w = Window.partitionBy("event_type").orderBy("score", "event_id")
    q = (
        cal.join(stats, "event_type")
        .withColumn("score", F.expr("ABS(CAST(cents AS DOUBLE) - mu)"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.col("krank"))
        .select("event_type", F.col("score").alias("q"))
    )
    return (
        test.join(stats, "event_type")
        .join(q, "event_type")
        .groupBy("event_type", "n_cal", "q")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.expr("CASE WHEN ABS(CAST(cents AS DOUBLE) - mu) <= q"
                       " THEN 1 ELSE 0 END")
            ).alias("covered"),
        )
        .selectExpr(
            "event_type", "n_cal", "n_test",
            "CAST(FLOOR(q + 0.5) AS BIGINT) AS q_cents",
            "covered",
            "CAST(FLOOR(CAST(covered AS DOUBLE) / n_test * 1000000 + 0.5)"
            " AS BIGINT) AS coverage_1e6",
        )
        .orderBy("event_type")
    )


def _conformal_oracle_sql() -> str:
    bucket = ("list_reduce(list_transform(range(1, 9), "
              "c -> CAST(strpos('0123456789abcdef', "
              "substr(md5(CAST(event_id AS VARCHAR)), c, 1)) AS BIGINT) - 1),"
              " (a, b) -> a * 16 + b) % 2")
    return f"""
    WITH base AS (
      SELECT event_type, event_id, {_CENTS} AS cents,
             CAST({bucket} AS INTEGER) AS bucket
      FROM events
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS n_cal,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mu,
             (({CONF_ALPHA_NUM} * (COUNT(*) + 1)) + {CONF_ALPHA_DEN - 1})
               // {CONF_ALPHA_DEN} AS krank
      FROM base WHERE bucket = 0
      GROUP BY event_type HAVING COUNT(*) >= {CONF_MIN_CAL}
    ),
    q AS (
      SELECT event_type, score AS q FROM (
        SELECT b.event_type,
               ABS(CAST(b.cents AS DOUBLE) - s.mu) AS score,
               s.krank,
               ROW_NUMBER() OVER (
                 PARTITION BY b.event_type
                 ORDER BY ABS(CAST(b.cents AS DOUBLE) - s.mu), b.event_id
               ) AS rn
        FROM base b JOIN stats s USING (event_type)
        WHERE b.bucket = 0
      ) WHERE rn = krank
    )
    SELECT b.event_type,
           CAST(s.n_cal AS BIGINT) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(FLOOR(q.q + 0.5) AS BIGINT) AS q_cents,
           CAST(SUM(CASE WHEN ABS(CAST(b.cents AS DOUBLE) - s.mu) <= q.q
                         THEN 1 ELSE 0 END) AS BIGINT) AS covered,
           CAST(FLOOR(CAST(SUM(CASE WHEN ABS(CAST(b.cents AS DOUBLE) - s.mu)
                                         <= q.q THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*) * 1000000 + 0.5) AS BIGINT)
             AS coverage_1e6
    FROM base b JOIN stats s USING (event_type) JOIN q USING (event_type)
    WHERE b.bucket = 1
    GROUP BY b.event_type, s.n_cal, q.q
    ORDER BY b.event_type
    """


@register(
    "conformal_value_intervals",
    oracle=_conformal_oracle_sql(),
    doc="Split-conformal 90% prediction intervals for event value per "
    "type: stateless md5 calibration split, calibration-mean predictor, "
    "exact ceil((n+1)*0.9) order-statistic half-width (integer rank "
    "arithmetic — no float rank), and the measured held-out coverage in "
    "tie-free 1e-6 fixed point. Distribution-free uncertainty the "
    "bootstrap-CI family complements: the interval is for the NEXT "
    "observation, not the mean.",
)
def conformal_value_intervals_query(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    return conformal_value_intervals(load_table(spark, "events", sf_dir))

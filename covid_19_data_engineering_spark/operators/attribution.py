"""Multi-touch marketing attribution over ``events`` — split each
purchase's value equally across the user's preceding touch events inside
the attribution window (linear attribution), with purchases that had no
touch credited to 'direct'. The revenue-accounting readout every
product-analytics stack runs beside the as-of (last-touch) join already
in operators/temporal.py.

No reference analogue (tdiprima/covid-19-data-engineering delegates all
analytics to its warehouses); SURVEY §2 C-extensions.

Exactness: each purchase's value becomes integer cents; a touch's credit
is (value_cents * 1e6) DIV n_touches — micro-cent integer division, so
per-touch credits are exact BIGINTs whose sums are association-order-
independent (the dropped sub-micro-cent remainder is identical on both
engines by construction). No float crosses an aggregation.

100 TB shape: one user-keyed equi-join between the (small) purchase side
and the touch side — both shuffles hash on user_id, the range predicate
evaluates inside the join, and per-user event counts bound the pair
blocks; the attribution rollup then runs on O(touch types) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

ATTR_WINDOW_H = 72            # touches inside 72h before the purchase
_TOUCH_TYPES = ("view", "click")
_CREDIT_FX = 1_000_000        # micro-cents


def linear_attribution(events: DataFrame,
                       window_h: int = ATTR_WINDOW_H) -> DataFrame:
    """(touch_type, n_touches, n_conversions, attributed_cents) — linear
    credit per touch type, plus the 'direct' row for untouched
    purchases. attributed_cents is exact micro-cent credit DIV'd back to
    cents at the end."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v_fp"),
    )
    touches = events.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(
            f"INTERVAL {window_h} HOURS")),
    )
    counted = pairs.groupBy("p_id", "v_fp").agg(
        F.count(F.lit(1)).alias("n_touch")
    )
    credits = (
        pairs.join(counted.select("p_id", "n_touch"), "p_id")
        .select(
            "touch_type", "p_id",
            F.expr(f"(v_fp * {_CREDIT_FX}) div n_touch").alias("credit_ufx"),
        )
    )
    attributed = credits.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("p_id").alias("n_conversions"),
        F.expr(f"sum(credit_ufx) div {_CREDIT_FX}").alias("attributed_cents"),
    )
    direct = (
        purchases.join(counted.select("p_id"), "p_id", "left_anti")
        .agg(
            F.lit("direct").alias("touch_type"),
            F.lit(0).cast("long").alias("n_touches"),
            F.count(F.lit(1)).alias("n_conversions"),
            F.coalesce(F.sum("v_fp"), F.lit(0)).alias("attributed_cents"),
        )
    )
    return attributed.unionByName(direct).orderBy("touch_type")


@register(
    "purchase_attribution_linear",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts,
             CAST(round(value * 100) AS BIGINT) AS v_fp
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id AS t_user, ts AS t_ts, event_type AS touch_type
      FROM events
      WHERE event_type IN ({", ".join(f"'{t}'" for t in _TOUCH_TYPES)})
    ),
    pairs AS (
      SELECT p.p_id, p.v_fp, t.touch_type
      FROM purchases p JOIN touches t
        ON p.p_user = t.t_user
       AND t.t_ts <= p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_H} HOURS
    ),
    counted AS (
      SELECT p_id, v_fp, CAST(COUNT(*) AS BIGINT) AS n_touch
      FROM pairs GROUP BY p_id, v_fp
    ),
    credits AS (
      SELECT pr.touch_type, pr.p_id,
             (c.v_fp * {_CREDIT_FX}) // c.n_touch AS credit_ufx
      FROM pairs pr JOIN counted c ON pr.p_id = c.p_id
    ),
    attributed AS (
      SELECT touch_type,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_conversions,
             CAST(SUM(credit_ufx) // {_CREDIT_FX} AS BIGINT)
               AS attributed_cents
      FROM credits GROUP BY touch_type
    ),
    direct AS (
      SELECT 'direct' AS touch_type,
             CAST(0 AS BIGINT) AS n_touches,
             CAST(COUNT(*) AS BIGINT) AS n_conversions,
             CAST(COALESCE(SUM(v_fp), 0) AS BIGINT) AS attributed_cents
      FROM purchases p
      WHERE NOT EXISTS (SELECT 1 FROM counted c WHERE c.p_id = p.p_id)
    )
    SELECT * FROM attributed
    UNION ALL
    SELECT * FROM direct
    ORDER BY touch_type
    """,
    doc=f"Linear multi-touch attribution: each purchase's value splits "
    f"equally (micro-cent integer DIV — exact, order-independent) across "
    f"the user's view/click touches in the {ATTR_WINDOW_H}h window before "
    "it, untouched purchases credited to 'direct'. One user-keyed "
    "equi-join with the range predicate inside (per-user blocks bound the "
    "pair volume) + an O(touch-types) rollup — the revenue-accounting "
    "twin of the as-of last-touch join.",
)
def purchase_attribution_linear(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    return linear_attribution(load_table(spark, "events", sf_dir))

"""RFM (recency / frequency / monetary) customer segmentation over
``events`` — the classic marketing segmentation: every purchasing user
gets a 1-4 quartile score on how recently, how often, and how much they
bought, and the readout is the 4x4x4 segment census. No reference
analogue (tdiprima/covid-19-data-engineering delegates all analytics to
its warehouses); SURVEY §2 C-extensions.

Scale shape: the corpus reduces by ONE user-keyed map-side-combined
groupBy to a user-level (recency, frequency, monetary) table; each of
the three quartile scores then rides the bucket+offset distributed
ranking (operators/distrank.py — no single-partition sort of the user
table either), and the census is a tiny 64-group aggregate.

Exactness: the three metrics are exact integers (days, counts, cents);
quartiles come from exact 1..n global ranks through the shared
``ntile_from_rank`` arithmetic — bit-identical to SQL NTILE(4) with the
same (metric, user) tiebreak — and the census is integer counts plus
one exact integer DIV for the per-segment average.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.distrank import (
    ntile_from_rank,
    with_global_rank,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def rfm_segments(events: DataFrame) -> DataFrame:
    """(r_quartile, f_quartile, m_quartile, n_users, avg_monetary_cents)
    — the RFM census over purchasing users. Quartile 4 = most recent /
    most frequent / highest spend (each metric ranks ascending on a
    better-is-higher orientation: recency ranks on -days_since)."""
    horizon = events.agg(F.max("ts").alias("hz"))
    users = (
        events.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(horizon))
        .groupBy("user_id")
        .agg(
            # negative days-since so ascending rank = older first and
            # quartile 4 = most recent, matching the f/m orientation
            F.min(F.expr("-datediff(CAST(hz AS DATE), CAST(ts AS DATE))"))
            .cast("long").alias("neg_recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .alias("monetary_cents"),
        )
    )

    def score(df: DataFrame, metric: str, out: str) -> DataFrame:
        ranked = with_global_rank(df, metric, "user_id")
        return ranked.withColumn(
            out, ntile_from_rank(F.col("global_rank"), F.col("total"), 4)
        ).drop("global_rank", "total")

    scored = score(score(score(users, "neg_recency", "r_quartile"),
                         "frequency", "f_quartile"),
                   "monetary_cents", "m_quartile")
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("sum(monetary_cents) div count(1)")
            .alias("avg_monetary_cents"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


@register(
    "rfm_customer_segments",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) AS hz FROM events),
    users AS (
      SELECT user_id,
             CAST(MIN(-datediff('day', CAST(ts AS DATE),
                                CAST((SELECT hz FROM horizon) AS DATE)))
                  AS BIGINT) AS neg_recency,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    scored AS (
      SELECT monetary_cents,
             NTILE(4) OVER (ORDER BY neg_recency, user_id) AS r_quartile,
             NTILE(4) OVER (ORDER BY frequency, user_id) AS f_quartile,
             NTILE(4) OVER (ORDER BY monetary_cents, user_id) AS m_quartile
      FROM users
    )
    SELECT CAST(r_quartile AS INTEGER) AS r_quartile,
           CAST(f_quartile AS INTEGER) AS f_quartile,
           CAST(m_quartile AS INTEGER) AS m_quartile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(monetary_cents) // COUNT(*) AS BIGINT)
             AS avg_monetary_cents
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="RFM segmentation census: purchasing users scored into "
    "recency/frequency/monetary quartiles (exact integer metrics; "
    "quartiles via the bucket+offset distributed ranking through the "
    "shared NTILE arithmetic — no single-partition sort anywhere, "
    "matching SQL NTILE(4) with a user_id tiebreak bit-for-bit), then "
    "the 4x4x4 segment census with an exact integer-DIV average spend.",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(load_table(spark, "events", sf_dir))

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
from pyspark.sql import DataFrame, SparkSession

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

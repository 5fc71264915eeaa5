"""Poisson bootstrap confidence intervals — the distributed bootstrap.

The classic bootstrap resamples n rows WITH replacement B times, which
is impossible to do directly on a distributed table (a global resample
needs coordinated row indices). The Poisson bootstrap (Hanley & MacGibbon
2006; the production form in Chamandy et al., "Estimating Uncertainty
for Massive Data Streams", Google 2012) replaces the multinomial
resample with an independent Poisson(1) count PER ROW PER REPLICA —
row-local, no coordination, exactly the transform that fits a map-only
stage — at the cost of replica sizes fluctuating around n, which is the
standard, well-understood approximation.

Determinism for the oracle: the Poisson(1) draw for (row, replica b) is
the inverse-CDF of a uniform derived from md5(row_id || ':' || b) (the
repo's standard hash-uniform trick: 13 hex chars -> exact 52-bit
integer -> /2^52, an exact double). The CDF thresholds are fixed double
literals shared by both engines, so every comparison lands identically;
counts truncate at 5 (P(X >= 5) = 1 - 0.99634 = 0.37% for Poisson(1) —
a deterministic, documented truncation applied on both sides, far
below the bootstrap's own Monte-Carlo noise). Values fold as
fixed-point cents, so
each replica's sum is exact integer arithmetic; the single division per
(group, replica) and the order-statistic pick are float-identical.

Scale shape: explode(1..B) is map-only (B x row fan-out feeding a
map-side-combined (group, b) aggregate — the shuffle carries at most
|groups| x B rows no matter the corpus); the final order-statistic pick
sorts B values per group. B = 64 here; production sizes B to the CI
resolution needed, not to the data.

No reference analogue (SURVEY §2 negative inventory — the reference
reports raw counts with no uncertainty anywhere).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

BOOT_B = 64
# Poisson(1) CDF thresholds P(X <= k), k = 0..4, as shared literals
BOOT_T = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
          0.9810118431238462, 0.9963401531726562)
_U_SCALE = 4503599627370496.0  # 2^52


def poisson_bootstrap_means(df: DataFrame, group_col: str, id_col: str,
                            value_col: str, b: int = BOOT_B) -> DataFrame:
    """(group_col, b, m): each replica's mean of ``value_col`` under
    deterministic Poisson(1) resampling. Values fold as exact cents;
    replicas whose total count drew zero (vanishing probability past
    tiny groups) drop out deterministically on both engines."""
    from covid_19_data_engineering_spark.operators.vectors import _spread

    xc = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    # _spread: the B-fold explode + per-(row, replica) md5 is the hot map
    # and a local table is ONE parquet split — without the spread the
    # whole 6.4M-md5 fan-out (sf0.1) runs in a single task (measured
    # ~6s -> ~1.5s); no-ops at scale where the scan has many splits
    base = _spread(df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col), F.col(id_col).alias("_rid"), xc.alias("xc")))
    drawn = base.withColumn(
        "b", F.explode(F.sequence(F.lit(1), F.lit(b))))
    u = (
        F.conv(F.substring(F.md5(F.concat(
            F.col("_rid").cast("string"), F.lit(":"),
            F.col("b").cast("string"))), 1, 13), 16, 10)
        .cast("long").cast("double") / F.lit(_U_SCALE)
    )
    c = (
        F.when(F.col("u") < BOOT_T[0], 0)
        .when(F.col("u") < BOOT_T[1], 1)
        .when(F.col("u") < BOOT_T[2], 2)
        .when(F.col("u") < BOOT_T[3], 3)
        .when(F.col("u") < BOOT_T[4], 4)
        .otherwise(5)
    )
    return (
        drawn.withColumn("u", u)
        .withColumn("c", c)
        .groupBy(group_col, "b")
        .agg(F.sum(F.col("c") * F.col("xc")).alias("s"),
             F.sum("c").alias("n"))
        .where(F.col("n") > 0)
        .select(
            group_col, "b",
            (F.col("s").cast("double") / F.col("n").cast("double")
             / F.lit(100.0)).alias("m"),
        )
    )


_BOOT_COUNT_SQL = f"""CASE WHEN u < {BOOT_T[0]!r} THEN 0
                   WHEN u < {BOOT_T[1]!r} THEN 1
                   WHEN u < {BOOT_T[2]!r} THEN 2
                   WHEN u < {BOOT_T[3]!r} THEN 3
                   WHEN u < {BOOT_T[4]!r} THEN 4
                   ELSE 5 END"""


@register(
    "events_value_bootstrap_ci",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(1, {BOOT_B + 1})) AS b),
    base AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS xc
      FROM events WHERE value IS NOT NULL
    ),
    drawn AS (
      SELECT base.event_type, reps.b, base.xc,
             CAST(('0x' || substr(md5(CAST(base.event_id AS VARCHAR)
                                       || ':' || CAST(reps.b AS VARCHAR)),
                                  1, 13))::BIGINT AS DOUBLE)
               / {_U_SCALE!r} AS u
      FROM base CROSS JOIN reps
    ),
    means AS (
      SELECT event_type, b,
             CAST(CAST(SUM(({_BOOT_COUNT_SQL}) * xc) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM({_BOOT_COUNT_SQL}) AS BIGINT) AS DOUBLE)
               / CAST(100.0 AS DOUBLE) AS m
      FROM drawn
      GROUP BY event_type, b
      HAVING SUM({_BOOT_COUNT_SQL}) > 0
    ),
    folded AS (
      SELECT event_type, list_sort(list(m)) AS arr
      FROM means GROUP BY event_type
    )
    SELECT event_type,
           ROUND(arr[2], 4) AS ci_lo,
           ROUND(arr[{BOOT_B // 2}], 4) AS boot_median,
           ROUND(arr[{BOOT_B - 1}], 4) AS ci_hi
    FROM folded ORDER BY event_type
    """,
    doc=f"Poisson bootstrap CI for the per-event_type mean value: "
    f"B = {BOOT_B} replicas via deterministic per-(row, replica) "
    "Poisson(1) counts (inverse-CDF over md5-derived exact uniforms — "
    "the row-local resampling that makes the bootstrap distributed; "
    "Chamandy et al. 2012), each replica's sum folded as exact cents, "
    "CI = the 2nd / 32nd / 63rd order statistics of the replica means. "
    "The explode is map-only and the (group, replica) shuffle carries "
    "at most |groups| x B rows out of the partial aggregate at any "
    "corpus size; the oracle replays hash, thresholds, folds, and "
    "order-statistic picks literal-for-literal.",
)
def events_value_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    means = poisson_bootstrap_means(events, "event_type", "event_id",
                                    "value")
    return (
        means.groupBy("event_type")
        .agg(F.array_sort(F.collect_list("m")).alias("arr"))
        .select(
            "event_type",
            F.round(F.element_at("arr", 2), 4).alias("ci_lo"),
            F.round(F.element_at("arr", BOOT_B // 2), 4)
            .alias("boot_median"),
            F.round(F.element_at("arr", BOOT_B - 1), 4).alias("ci_hi"),
        )
        .orderBy("event_type")
    )

"""Time-series linear interpolation and shuffle-skew diagnostics.

Two operational operators the reference's warehouse delegation has no
native analogue for (SURVEY §2 C-extensions):

- ``events_value_interpolation``: reconstruct dropped sensor readings by
  linear interpolation between the nearest surviving readings of the same
  user — the standard gap-repair step before windowed feature extraction.
  The dropout mask is deterministic (event_id % 10 == 0) so the operator
  is replayable and the oracle sees the identical gap set.
- ``shuffle_skew_report``: per-key cardinality skew statistics for the
  engine's two natural shuffle keys (lineitem.l_orderkey,
  events.user_id) — max/median/mean rows per key and the max/median skew
  ratio. This is the observability query a cluster operator runs BEFORE
  choosing salting (operators/skew.py) or AQE skew thresholds.

Scale shape: interpolation is one user-keyed window family (a single
shuffle; IGNORE NULLS last/first scans are streaming within the frame);
the skew report is one groupBy per table plus an O(keys) percentile
rollup.

Determinism: the interpolation formula is identically-parenthesized
double arithmetic over exact integer epoch-millis deltas — no rounding
needed; both engines' linear-interpolated percentile (Spark
``percentile``, DuckDB ``quantile_cont``) use the same p*(n-1) definition
over integer counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

DROP_MOD = 10  # deterministic dropout mask: event_id % DROP_MOD == 0


def interpolate_values(events: DataFrame, drop_mod: int = DROP_MOD) -> DataFrame:
    """Rows of the deterministic dropout set with their linearly
    interpolated values. Columns: event_id, user_id, ts_ms, interp_value
    (NULL when the gap has no surviving reading on one side)."""
    masked = events.select(
        "event_id", "user_id",
        # ts is TIMESTAMP_NTZ in the parquet; session tz is pinned UTC so
        # the cast is the identity and epoch millis match DuckDB epoch_ms
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.when(F.col("event_id") % drop_mod != 0, F.col("value")).alias("v"),
    )
    order = [F.col("ts_ms"), F.col("event_id")]
    wb = Window.partitionBy("user_id").orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, -1)
    wf = Window.partitionBy("user_id").orderBy(*order) \
        .rowsBetween(1, Window.unboundedFollowing)
    prev_v = F.last("v", ignorenulls=True).over(wb)
    next_v = F.first("v", ignorenulls=True).over(wf)
    prev_t = F.last(F.when(F.col("v").isNotNull(), F.col("ts_ms")),
                    ignorenulls=True).over(wb)
    next_t = F.first(F.when(F.col("v").isNotNull(), F.col("ts_ms")),
                     ignorenulls=True).over(wf)
    frac = (F.col("ts_ms") - F.col("pt")).cast("double") / \
        (F.col("nt") - F.col("pt")).cast("double")
    interp = F.when(
        F.col("nt") == F.col("pt"), F.col("pv")  # degenerate equal stamps
    ).otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    return (
        masked
        .withColumn("pv", prev_v).withColumn("nv", next_v)
        .withColumn("pt", prev_t).withColumn("nt", next_t)
        .where(F.col("v").isNull())
        .select("event_id", "user_id", "ts_ms", interp.alias("interp_value"))
    )


@register(
    "events_value_interpolation",
    oracle=f"""
    WITH masked AS (
      SELECT event_id, user_id,
             epoch_ms(ts) AS ts_ms,
             CASE WHEN event_id % {DROP_MOD} != 0 THEN value END AS v
      FROM events
    ),
    ctx AS (
      SELECT event_id, user_id, ts_ms, v,
             LAST_VALUE(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_ms, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             FIRST_VALUE(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_ms, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN ts_ms END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN ts_ms END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM masked
    )
    SELECT event_id, user_id, ts_ms,
           CASE WHEN nt = pt THEN pv
                ELSE pv + (nv - pv) * (CAST(ts_ms - pt AS DOUBLE)
                                       / CAST(nt - pt AS DOUBLE))
           END AS interp_value
    FROM ctx WHERE v IS NULL
    ORDER BY event_id
    """,
    doc=f"Linear interpolation of a deterministic dropout set (event_id % "
    f"{DROP_MOD} == 0) between the nearest surviving readings per user — "
    "one user-keyed window family, IGNORE-NULLS frame scans, exact "
    "epoch-millis arithmetic (no rounding needed).",
)
def events_value_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return interpolate_values(events).orderBy("event_id")


def _key_profile(df: DataFrame, key: str, label: str) -> DataFrame:
    per_key = df.groupBy(key).agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.lit(label).alias("shuffle_key"),
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_per_key"),
        F.expr("percentile(cnt, 0.5)").alias("p50_per_key"),
        F.expr("percentile(cnt, 0.99)").alias("p99_per_key"),
    )


def skew_report(tables: list[tuple[DataFrame, str, str]]) -> DataFrame:
    """One row per (table, key): per-key row-count distribution and the
    max/p50 skew ratio — the pre-flight check for salting / AQE skew
    thresholds."""
    out = None
    for df, key, label in tables:
        prof = _key_profile(df, key, label)
        out = prof if out is None else out.unionAll(prof)
    return out.select(
        "shuffle_key", "n_keys", "n_rows", "max_per_key",
        "p50_per_key", "p99_per_key",
        (F.col("max_per_key") / F.col("p50_per_key")).alias("skew_ratio"),
    )


@register(
    "shuffle_skew_report",
    oracle="""
    WITH li AS (
      SELECT 'lineitem.l_orderkey' AS shuffle_key, COUNT(*) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_per_key,
             quantile_cont(cnt, 0.5) AS p50_per_key,
             quantile_cont(cnt, 0.99) AS p99_per_key
      FROM (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey)
    ),
    ev AS (
      SELECT 'events.user_id' AS shuffle_key, COUNT(*) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_per_key,
             quantile_cont(cnt, 0.5) AS p50_per_key,
             quantile_cont(cnt, 0.99) AS p99_per_key
      FROM (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
    )
    SELECT shuffle_key, n_keys, n_rows, max_per_key, p50_per_key,
           p99_per_key, max_per_key / p50_per_key AS skew_ratio
    FROM (SELECT * FROM li UNION ALL SELECT * FROM ev)
    ORDER BY shuffle_key
    """,
    doc="Per-key skew statistics for the engine's two natural shuffle keys "
    "(max / p50 / p99 rows per key and the max/p50 skew ratio) — the "
    "observability query run before choosing salting or AQE skew "
    "thresholds. Linear-interpolated percentiles match across engines "
    "(same p*(n-1) definition over integer counts).",
)
def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    ev = load_table(spark, "events", sf_dir)
    return skew_report([
        (ev, "user_id", "events.user_id"),
        (li, "l_orderkey", "lineitem.l_orderkey"),
    ]).orderBy("shuffle_key")

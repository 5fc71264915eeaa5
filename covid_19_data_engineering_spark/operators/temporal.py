"""Temporal join operators over ``events``: as-of join and bounded range join.

The reference has neither (SURVEY.md §2, negative inventory) — these are the
time-series operators a warehouse user layers on an event stream, implemented
Spark-first:

- as-of join: NOT a per-row subquery (O(n^2)) and NOT a range-exploded join.
  Both sides union into one stream, shuffle ONCE on the entity key, and a
  last(ignorenulls) running window carries the most recent left-side match
  forward. One shuffle, sorted within partitions — the merge-join shape
  as-of joins want, and it scales to any event volume because state per row
  is O(1).
- range join: equi-key on the entity + bounded time predicate. Spark executes
  the equi-part as a hash join and post-filters the band, so the pair space
  is bounded by per-user event counts, not the cross product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str], strict: bool = True,
              tiebreak_col: str | None = None) -> DataFrame:
    """For each row of ``left``, attach the most recent prior row of ``right``
    with the same ``on`` key (strictly earlier ``ts`` when strict=True).

    ``tiebreak_col`` orders right rows that share a timestamp; pass a column
    unique per right row (an event id) for a deterministic winner. Without
    it, equal-ts right rows tie and the carried value is partition-order
    dependent — fine for semantics, not for hash-stable output.

    Plan shape: union both sides tagged, one shuffle on ``on``, running
    last(ignorenulls) window, filter back to left rows. No range explosion.
    """
    lt = left.withColumn("_side", F.lit(0))
    rt = right.withColumn("_side", F.lit(1))
    cols = set(lt.columns) | set(rt.columns)
    lt = lt.select(*[F.col(c) if c in lt.columns else F.lit(None).alias(c) for c in cols])
    rt = rt.select(*[F.col(c) if c in rt.columns else F.lit(None).alias(c) for c in cols])
    unioned = lt.unionByName(rt)
    # at equal ts: left rows sort first (so a strictly-prior right row is
    # required); among right rows, later rows win deterministically
    if strict:
        order = [F.col(ts), F.col("_side")]
        if tiebreak_col is not None:
            order.append(F.col(tiebreak_col))
    else:
        order = [F.col(ts), F.col("_side").desc()]
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    carried = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    return carried.where(F.col("_side") == 0).drop("_side", *[c for c in value_cols])


@register(
    "events_asof_click_before_purchase",
    oracle="""
    WITH tagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN value END AS click_value
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    seq AS (
      SELECT *,
             LAST_VALUE(click_id IGNORE NULLS) OVER w AS asof_click_id,
             LAST_VALUE(click_value IGNORE NULLS) OVER w AS asof_click_value
      FROM tagged
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts,
           asof_click_id,
           ROUND(asof_click_value, 2) AS asof_click_value
    FROM seq WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="As-of join: each purchase joined to the user's most recent strictly-"
    "prior click (union + one shuffle + running last, no range explosion).",
)
def events_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.col("event_id").alias("click_id"), F.col("value").alias("click_value"),
    )
    joined = asof_join(purchases, clicks, on="user_id", ts="ts",
                       value_cols=["click_id", "click_value"],
                       tiebreak_col="event_id")
    return (
        joined.select(
            "event_id", "user_id", "ts",
            F.col("asof_click_id").alias("asof_click_id"),
            F.round("asof_click_value", 2).alias("asof_click_value"),
        )
        .orderBy("event_id")
    )


@register(
    "events_error_burst",
    oracle="""
    SELECT a.event_id AS error_id,
           COUNT(b.event_id) AS n_following,
           ROUND(SUM(b.value), 2) AS following_value
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND b.event_type <> 'error'
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
    ORDER BY error_id
    """,
    doc="Bounded range join: per error event, activity by the same user in "
    "the following 5 minutes (equi-key hash join + band filter).",
)
def events_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("u"), F.col("ts").alias("t0")
    )
    others = e.where(F.col("event_type") != "error").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("t1"),
        F.col("event_id").alias("fid"), F.col("value").alias("fval"),
    )
    return (
        errors.join(
            others,
            (F.col("u") == F.col("u2"))
            & (F.col("t1") > F.col("t0"))
            & (F.col("t1") <= F.col("t0") + F.expr("INTERVAL 5 MINUTES")),
            "left",
        )
        .groupBy("error_id")
        .agg(
            F.count("fid").alias("n_following"),
            F.round(F.sum("fval"), 2).alias("following_value"),
        )
        .orderBy("error_id")
    )


# --------------------------------------------------------------------------
# Keyless interval join via bucket expansion.
# --------------------------------------------------------------------------


def interval_bucket_join(intervals: DataFrame, points: DataFrame,
                         start: str, end: str, ts: str,
                         bucket_seconds: int,
                         interval_keys: list[str] | None = None) -> DataFrame:
    """Join every ``points`` row into every [start, end) interval it falls
    in, WITHOUT an equi-key — the shape Spark would otherwise execute as a
    BroadcastNestedLoopJoin (all pairs filtered row-by-row, the non-equi
    join scale killer).

    The bucket-expansion rewrite makes it an equi-join: quantize time into
    ``bucket_seconds`` buckets, explode each interval to the buckets it can
    touch, map each point to its single bucket, hash-join on the bucket id,
    then apply the exact containment predicate as a residual. Requires
    interval length <= bucket_seconds, so an interval covers exactly
    {b0, b0 + 1} and every (interval, point) pair meets in AT MOST ONE
    bucket — the inner matches need no post-join dedup. Pair volume is
    O(points per bucket x intervals per bucket), time-local by
    construction, instead of |intervals| x |points|. (For longer
    intervals, raise bucket_seconds or explode to ceil(len/bucket)
    buckets; the residual stays exact.)

    Returns each interval row joined to its contained points, with empty
    intervals surviving EXACTLY ONCE as a single all-null-points row —
    the exact left-join semantics. The two exploded bucket copies are
    collapsed before returning (round-8 ADVICE medium: a left join over
    the exploded side leaked one spurious null row per unmatched bucket
    copy, so an empty interval appeared twice and a matched interval
    grew an extra null row; only null-ignoring aggregation masked it):
    the exploded sides INNER-join (copies that match nothing vanish),
    and the original un-exploded interval rows LEFT-join back onto the
    matches over ``interval_keys`` to re-attach empty intervals once.

    ``interval_keys`` names the columns identifying an interval row (an
    interval id). When None, all interval columns form the key — correct
    whenever interval rows are distinct; duplicate identical interval
    rows would each re-attach to the same matches (pass an explicit
    unique key to disambiguate). The re-attach join is NULL-SAFE, so an
    interval row carrying NULL in a key column still recovers its
    matches. Point columns must not collide with interval column names
    (raises ValueError — the pre-round-9 left join silently returned
    two same-named columns, a worse failure).
    """
    keys = interval_keys if interval_keys is not None else list(intervals.columns)
    clash = sorted(
        (set(points.columns) & set(intervals.columns))
        | ({"_b"} & (set(points.columns) | set(intervals.columns))))
    if clash:
        raise ValueError(
            f"interval/point column collision: {clash} — rename one side; "
            "the bucket join needs disjoint names ('_b' is reserved)")
    b0 = F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds).cast("long")
    iv = intervals.withColumn("_b", F.explode(F.array(b0, b0 + 1)))
    pt = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
    )
    cond = (
        (iv["_b"] == pt["_b"])
        & (pt[ts] >= iv[start])
        & (pt[ts] < iv[end])
    )
    matched = iv.join(pt, cond, "inner").drop("_b")
    # re-attach empty intervals exactly once: the original (un-exploded)
    # interval rows left-join the matches' point columns over the key,
    # null-safe per key column (NULL keys are real rows, not non-matches)
    point_cols = [c for c in matched.columns if c not in intervals.columns]
    # alias both sides: m derives from intervals, so bare attribute
    # references would be ambiguous self-join lineage
    a = intervals.alias("_iv_side")
    m = matched.select(*keys, *point_cols).alias("_pt_side")
    join_cond = None
    for k in keys:
        c = F.col(f"_iv_side.{k}").eqNullSafe(F.col(f"_pt_side.{k}"))
        join_cond = c if join_cond is None else (join_cond & c)
    return a.join(m, join_cond, "left").select(
        *[F.col(f"_iv_side.{c}") for c in intervals.columns],
        *[F.col(f"_pt_side.{c}") for c in point_cols],
    )


@register(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT event_id AS interval_id, ts AS t0,
             ts + INTERVAL 5 MINUTE AS t1
      FROM events WHERE event_type = 'error'
    )
    SELECT iv.interval_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_in_window,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           ROUND(SUM(e.value), 2) AS window_value
    FROM iv LEFT JOIN events e
      ON e.ts >= iv.t0 AND e.ts < iv.t1
    GROUP BY iv.interval_id
    ORDER BY iv.interval_id
    """,
    doc="Per-incident coverage rollup: every error event opens a 5-minute "
    "[t0, t0+5m) window; count ALL events (any user — there is no shared "
    "key) falling inside each window. The non-equi join is rewritten as a "
    "bucket-expansion equi-join (intervals explode to 2 time buckets, "
    "points map to 1, hash-join on bucket, exact residual) so the pair "
    "space is time-local instead of |windows| x |events| — plan-gated to "
    "never contain a BroadcastNestedLoopJoin. Empty windows survive with "
    "zero counts. Oracle states the naive non-equi join directly.",
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    iv = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t1"),
    )
    pts = events.select("event_id", "user_id", "ts", "value")
    joined = interval_bucket_join(iv, pts, "t0", "t1", "ts", 300,
                                  interval_keys=["interval_id"])
    return (
        joined.groupBy("interval_id")
        .agg(
            F.count("event_id").alias("n_in_window"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("window_value"),
        )
        .orderBy("interval_id")
    )


# --------------------------------------------------------------------------
# Lateness profile: how out-of-order would this stream arrive through a
# realistic transport? withWatermark("ts", delay) silently DROPS every
# event later than the chosen delay, so a deployment measures the lateness
# distribution BEFORE picking one. The events table carries no arrival
# column, so arrival is modeled as ts + a deterministic md5-derived
# network delay in [0, 10 min) — reproducible on both engines, same trick
# as weighted_sample_wor's hash-derived uniforms.
# --------------------------------------------------------------------------

_DELAY_MOD_MS = 600_000          # network delay in [0, 10 min)
_ARRIVAL_BKT_MS = 600_000        # 10-min arrival-time buckets for level 1

# shared bucket classifier over event-time lateness in millis
_LATE_CLASS = ("CASE WHEN late_ms <= 0 THEN 0 "
               "WHEN late_ms <= 60000 THEN 1 "
               "WHEN late_ms <= 300000 THEN 2 "
               "WHEN late_ms <= 600000 THEN 3 "
               "ELSE 4 END")
_LATE_LABEL = ("CASE bucket_id WHEN 0 THEN 'in_order' "
               "WHEN 1 THEN 'le_1m' WHEN 2 THEN 'le_5m' "
               "WHEN 3 THEN 'le_10m' ELSE 'gt_10m' END")


def lateness_profile(events: DataFrame,
                     delay_mod_ms: int = _DELAY_MOD_MS,
                     bucket_ms: int = _ARRIVAL_BKT_MS) -> DataFrame:
    """Distribution of event-time lateness vs the running high-watermark
    in (simulated) arrival order — (bucket_id, lateness_bucket, n_events,
    share).

    An event's lateness is how far its event time sits behind the max
    event time among all earlier ARRIVALS. The running max is the classic
    sequential scan; here it is a two-level distributed prefix-max (the
    packing prefix-sum decomposition, keyed on TIME): within each 10-min
    arrival bucket the prefix max runs parallel across buckets; the
    per-bucket maxima take the only ordered window — O(deployment-minutes
    / 10) rows, growing with calendar time, never with event volume; the
    watermark is greatest(bucket base, local prefix). Nothing sorts the
    stream globally at any scale.
    """
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    delay = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                1, 13), 16, 10)
             .cast("long") % delay_mod_ms)
    base = events.select(
        "event_id", ts_ms.alias("ts_ms"),
        (ts_ms + delay).alias("arr_ms"),
    ).withColumn("bkt", F.expr(f"arr_ms div {bucket_ms}"))
    in_bkt = Window.partitionBy("bkt").orderBy("arr_ms", "event_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    local = base.withColumn(
        "local_max", F.coalesce(F.max("ts_ms").over(in_bkt), F.lit(-1)))
    bkt_w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        base.groupBy("bkt").agg(F.max("ts_ms").alias("bkt_max"))
        .withColumn("bkt_base",
                    F.coalesce(F.max("bkt_max").over(bkt_w), F.lit(-1)))
        .select("bkt", "bkt_base")
    )
    late = (
        local.join(F.broadcast(bases), "bkt")
        .select(
            F.expr("CASE WHEN greatest(local_max, bkt_base) < 0 THEN 0 "
                   "ELSE greatest(local_max, bkt_base) - ts_ms END")
            .alias("late_ms"),
        )
        .select(F.expr(_LATE_CLASS).alias("bucket_id"))
    )
    total = late.agg(F.count(F.lit(1)).alias("n_all"))
    return (
        late.groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "bucket_id",
            F.expr(_LATE_LABEL).alias("lateness_bucket"),
            "n_events",
            F.round(F.expr("CAST(n_events AS DOUBLE) / n_all"), 6)
            .alias("share"),
        )
        .orderBy("bucket_id")
    )


@register(
    "events_lateness_profile",
    oracle=f"""
    WITH arr AS (
      SELECT epoch_ms(ts) AS ts_ms,
             epoch_ms(ts) + (('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                             1, 13))::BIGINT
                             % {_DELAY_MOD_MS}) AS arr_ms,
             event_id
      FROM events
    ),
    scanned AS (
      SELECT ts_ms,
             COALESCE(MAX(ts_ms) OVER (
               ORDER BY arr_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS wm
      FROM arr
    ),
    classed AS (
      SELECT {_LATE_CLASS} AS bucket_id
      FROM (SELECT CASE WHEN wm < 0 THEN 0 ELSE wm - ts_ms END AS late_ms
            FROM scanned)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM classed)
    SELECT bucket_id, {_LATE_LABEL} AS lateness_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_all FROM tot), 6)
             AS share
    FROM classed
    GROUP BY bucket_id
    ORDER BY bucket_id
    """,
    doc="Event-time lateness distribution vs the running high-watermark "
    "under a deterministic md5-derived transport delay (0-10 min), in the "
    "buckets a streaming deployment cares about (in-order / <=1m / <=5m / "
    "<=10m / beyond) — the measurement that sizes withWatermark() before "
    "it silently drops late data. The sequential running max becomes a "
    "two-level distributed prefix-max over 10-min arrival buckets "
    "(parallel within-bucket windows; the only ordered window sees "
    "O(deployment-minutes/10) rows, growing with calendar time, never "
    "event volume); the oracle states the same semantics as one flat "
    "window.",
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lateness_profile(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Per-user exponential smoothing (EWMA, alpha = 1/2): the sequential
# stateful recurrence SQL windows cannot express (each output depends on
# the PREVIOUS OUTPUT, not a frame of inputs). This is exactly the class
# of operator the grouped-map Arrow seam exists for: one kernel per user
# group, vectorized transport, sequential math inside.
# --------------------------------------------------------------------------


def ewma_by_user(events: DataFrame) -> DataFrame:
    """Final EWMA state of ``value`` per user (s_1 = x_1;
    s_t = (x_t + s_{t-1}) / 2) in (ts, event_id) order —
    (user_id, n_events, ewma).

    100 TB shape: ONE shuffle on user_id (repartition under
    mapInPandas), then each PARTITION runs one vectorized kernel over
    all of its users — state is O(1) per user and users are
    independent, so the work parallelizes across partitions while the
    per-user Python overhead (round-8 verdict "what's wrong #2": a
    kernel invocation + 1-row DataFrame per user, plus a per-row Python
    loop) collapses into a single Cython pass:
    ``groupby("user_id").ewm(alpha=1/2, adjust=False).mean()``.

    Bit parity is PRESERVED, not approximated: pandas' adjust=False
    recurrence computes 0.5*s + 0.5*x per step — the two halvings are
    exact in IEEE doubles and the one rounded add satisfies
    RN(s/2 + x/2) = RN(s + x)/2 (scaling by powers of two commutes with
    rounding away from the subnormal range), so every step produces the
    same bits as the sequential (x + s)/2 fold the DuckDB recursive-CTE
    oracle replays — pinned empirically by
    test_ewma_groupby_kernel_bit_parity across 100k steps. alpha = 1/2
    is the parity-friendly choice; the final round(s, 6) stays Python's
    correctly-rounded round, one call per user.
    """
    import pandas as pd

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["uid_key", "ts", "event_id"])
        # dropna=False: a NULL user_id is a real group (the Spark
        # groupBy the old per-user kernel rode treated it as one).
        # The key travels as a STRING: with NULLs present Arrow hands a
        # nullable int64 column to pandas as float64-with-NaN, which
        # silently loses precision for key magnitudes above 2^53 and
        # could merge distinct users — a string key round-trips any
        # BIGINT exactly and Spark casts it back after the kernel.
        g = pdf.groupby("uid_key", sort=True, dropna=False)
        last = (g["value"].ewm(alpha=0.5, adjust=False).mean()
                .groupby(level=0, dropna=False).last())
        return pd.DataFrame({
            "uid_key": last.index.to_numpy(dtype=object),
            "n_events": g.size().to_numpy(),
            "ewma": [round(v, 6) for v in last.to_numpy()],
        })

    def gen(batches):
        # a partition streams as multiple Arrow batches and a user's rows
        # may straddle them: buffer the partition (same O(partition)
        # working set applyInPandas holds per group-batch), one kernel
        parts = list(batches)
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            if len(pdf):
                yield run(pdf)

    return (
        events.select(
            F.col("user_id").cast("string").alias("uid_key"),
            "ts", "event_id", "value",
        )
        .repartition("uid_key")
        .mapInPandas(gen, "uid_key string, n_events long, ewma double")
        .select(
            F.col("uid_key").cast("long").alias("user_id"),
            "n_events", "ewma",
        )
        .orderBy("user_id")
    )


@register(
    "events_ewma_smoothing",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    r AS (
      SELECT user_id, rn, n, CAST(value AS DOUBLE) AS s
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT seq.user_id, seq.rn, seq.n,
             (CAST(seq.value AS DOUBLE) + r.s) / 2.0
      FROM r JOIN seq ON seq.user_id = r.user_id AND seq.rn = r.rn + 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events, ROUND(s, 6) AS ewma
    FROM r WHERE rn = n
    ORDER BY user_id
    """,
    doc="Per-user exponential smoothing (s_t = (x_t + s_(t-1))/2 in "
    "arrival order): the sequential recurrence SQL windows cannot state "
    "— each output depends on the previous OUTPUT — so it runs as a "
    "grouped-map Arrow kernel: one user_id shuffle, O(1) state per "
    "group, groups independent. Halving is exact in IEEE doubles and "
    "both engines apply the identical op order, so the recursive-CTE "
    "oracle matches bit-for-bit with no fixed-point scaffolding.",
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_by_user(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Path mining: the most common 3-step event sequences.
# --------------------------------------------------------------------------

PATH_TOP = 20


def top_event_paths(events: DataFrame, top: int = PATH_TOP) -> DataFrame:
    """(step1, step2, step3, n_paths, n_users, support) — the ``top``
    most-traveled 3-step event-type paths across per-user timelines,
    with how many distinct users walk each. The path-analysis readout
    behind funnel DISCOVERY (the funnel query checks a known path; this
    finds the paths worth checking).

    100 TB shape: ONE user-keyed window shuffle produces both lags
    map-side; the path groupBy runs on O(types^3) keys (map-side
    combined), and the top-k is a TakeOrderedAndProject. Counts are
    exact integers; support is one fixed-order division rounded
    identically on both engines. Ties rank deterministically by the
    path triple.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        events.select(
            "user_id",
            F.lag("event_type", 2).over(w).alias("step1"),
            F.lag("event_type", 1).over(w).alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .where(F.col("step1").isNotNull())
    )
    paths = tri.groupBy("step1", "step2", "step3").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tot = paths.agg(F.sum("n_paths").alias("n_all"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "step1", "step2", "step3", "n_paths", "n_users",
            F.round(F.expr("CAST(n_paths AS DOUBLE) / n_all"), 6)
            .alias("support"),
        )
        .orderBy(F.col("n_paths").desc(), "step1", "step2", "step3")
        .limit(top)
    )


@register(
    "event_top_paths",
    oracle=f"""
    WITH tri AS (
      SELECT user_id,
             LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS step1,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS step2,
             event_type AS step3
      FROM events
    ),
    paths AS (
      SELECT step1, step2, step3,
             CAST(COUNT(*) AS BIGINT) AS n_paths,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM tri WHERE step1 IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(SUM(n_paths) AS BIGINT) AS n_all FROM paths)
    SELECT step1, step2, step3, n_paths, n_users,
           ROUND(CAST(n_paths AS DOUBLE) / n_all, 6) AS support
    FROM paths, tot
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT {PATH_TOP}
    """,
    doc=f"Top-{PATH_TOP} 3-step event paths across per-user timelines "
    "(counts, distinct walkers, support) — funnel DISCOVERY beside the "
    "known-path funnel query and the transition matrix. One user-keyed "
    "window shuffle computes both lags map-side; the path groupBy runs "
    "on O(types^3) map-side-combined keys and the top-k is a "
    "TakeOrderedAndProject with a deterministic path tiebreak.",
)
def event_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_event_paths(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Conversion latency quantiles: click -> purchase, exact order statistics.
# --------------------------------------------------------------------------

LATENCY_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def conversion_latency_quantiles(events: DataFrame) -> DataFrame:
    """(quantile, rank, latency_min) — exact order statistics of the
    minutes between each purchase and the same user's most recent prior
    click (the as-of pairing), via the histogram-refine quantile
    machinery. The p50/p99 "how long does conversion take" SLA readout,
    with no global sort and no sketch error.

    100 TB shape: one user-keyed window shuffle produces the as-of
    pairing map-side; latencies are exact integer minutes, and the
    quantile machinery adds one bin-keyed map-side-combined shuffle plus
    a bounded candidate-bucket window (operators/quantiles.py).
    """
    from covid_19_data_engineering_spark.operators.quantiles import (
        exact_quantiles_histogram,
    )

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = (
        events.withColumn(
            "last_click_ts",
            F.last(
                F.when(F.col("event_type") == "click", F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .where(
            (F.col("event_type") == "purchase")
            & F.col("last_click_ts").isNotNull()
        )
        .select(
            F.expr(
                "CAST(floor((unix_timestamp(ts) "
                "- unix_timestamp(last_click_ts)) / 60) AS BIGINT)"
            ).alias("latency_min")
        )
    )
    out = exact_quantiles_histogram(lat, "latency_min",
                                    quantiles=LATENCY_QUANTILES)
    return out.select(
        "quantile", "rank", F.col("value").alias("latency_min")
    ).orderBy("quantile")


@register(
    "conversion_latency_quantiles",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events
    ),
    lat AS (
      SELECT CAST(floor(epoch(ts - last_click_ts) / 60) AS BIGINT)
               AS latency_min
      FROM seq
      WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL
    ),
    n_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lat),
    targets AS (
      SELECT CAST(q AS DOUBLE) AS quantile,
             CAST(floor(((SELECT n FROM n_all) - 1) * q) AS BIGINT) + 1
               AS rank
      FROM (SELECT unnest([{", ".join(str(p) for p in LATENCY_QUANTILES)}])
            AS q)
    ),
    ranked AS (
      SELECT latency_min,
             ROW_NUMBER() OVER (ORDER BY latency_min) AS rn
      FROM lat
    )
    SELECT t.quantile, t.rank, r.latency_min
    FROM targets t JOIN ranked r ON r.rn = t.rank
    ORDER BY t.quantile
    """,
    doc="Exact click->purchase conversion-latency quantiles "
    "(p25/p50/p75/p90/p99 in whole minutes): the as-of pairing comes "
    "from one user-keyed window (most recent prior click, map-side "
    "after the partition), latencies are exact integer minutes, and the "
    "order statistics ride the histogram-refine machinery — the SLA "
    "readout with no global sort and no sketch error.",
)
def conversion_latency_quantiles_query(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    return conversion_latency_quantiles(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Month-over-month revenue growth (period-over-period readout).
# --------------------------------------------------------------------------

def monthly_revenue_growth(orders: DataFrame) -> DataFrame:
    """(month, revenue_cents, prev_cents, mom_growth) — monthly order
    revenue with the month-over-month growth rate; the first month (and
    any month following a calendar gap's missing neighbor) reads NULL
    growth rather than bridging the gap silently.

    Exactness: revenue is exact BIGINT cents off one month-keyed
    map-side-combined groupBy; growth is one fixed-order division of
    two integers per row. The lag runs over O(calendar-months) rows and
    is gap-aware: prev is taken by month arithmetic (join on
    month - 1 month), not by row adjacency, so a missing month yields
    NULL instead of comparing across the hole.
    """
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
             .alias("revenue_cents"))
    )
    prev = monthly.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("revenue_cents").alias("prev_cents"),
    )
    return (
        monthly.join(prev, "month", "left")
        .select(
            "month", "revenue_cents", "prev_cents",
            F.round(
                F.expr("(CAST(revenue_cents AS DOUBLE) - prev_cents) "
                       "/ prev_cents"), 6).alias("mom_growth"),
        )
        .orderBy("month")
    )


@register(
    "monthly_revenue_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1
    ),
    prev AS (
      SELECT month + INTERVAL 1 MONTH AS pm, revenue_cents AS prev_cents
      FROM monthly
    )
    SELECT m.month, m.revenue_cents, p.prev_cents,
           ROUND((CAST(m.revenue_cents AS DOUBLE) - p.prev_cents)
                 / p.prev_cents, 6) AS mom_growth
    FROM monthly m LEFT JOIN prev p ON CAST(p.pm AS DATE) = m.month
    ORDER BY m.month
    """,
    doc="Month-over-month revenue growth: exact BIGINT monthly cents off "
    "one month-keyed map-side-combined groupBy, growth as one fixed-order "
    "division per row. GAP-AWARE: the previous month comes from month "
    "arithmetic (a self-join on month - 1), not row adjacency, so a "
    "missing calendar month reads NULL instead of silently comparing "
    "across the hole — the period-over-period readout every revenue "
    "dashboard opens with.",
)
def monthly_revenue_growth_query(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    return monthly_revenue_growth(load_table(spark, "orders", sf_dir))


# --------------------------------------------------------------------------
# Time-weighted average value (TWAP) — the mean that weights each
# observation by how long it was the CURRENT one, the correct daily
# average for irregularly-sampled series (a plain AVG over-counts bursts
# of rapid updates and under-counts long-held values).
# --------------------------------------------------------------------------


def twap_daily(events: DataFrame, event_type: str = "view") -> DataFrame:
    """(day, n_obs, held_seconds, twap) — per day, the time-weighted
    average of ``value`` for one event type, each observation weighted by
    the micros until the next same-day observation (the last observation
    of a day holds until midnight).

    Exactness: weights are exact integer microseconds from one day-keyed
    lead() window; the weighted sum folds value CENTS x weight-micros as
    exact integers through DECIMAL(38,0) (cents x micros x rows passes
    BIGINT comfortably below sf1 but not at the 100 TB target), and the
    one division is a shared fixed-order double. 100 TB shape: one
    (day)-keyed window shuffle — the partition key is the day, so state
    is bounded by a day's traffic, and days parallelize.
    """
    from pyspark.sql import Window

    obs = (
        events.where(F.col("event_type") == event_type)
        .select(
            F.expr("CAST(ts AS DATE)").alias("day"),
            F.expr("CAST(ts AS TIMESTAMP)").alias("tts"),
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    w = Window.partitionBy("day").orderBy("tts", "event_id")
    weighted = obs.select(
        "day", "cents",
        F.expr(
            "CAST((unix_micros(COALESCE("
            "  lead(tts) OVER (PARTITION BY day ORDER BY tts, event_id),"
            "  CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))"
            "  - unix_micros(tts)) AS BIGINT)"
        ).alias("held_us"),
    )
    return (
        weighted.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.expr("CAST(SUM(held_us) AS BIGINT) div 1000000")
            .alias("held_seconds"),
            F.expr(
                "ROUND(CAST(SUM(CAST(cents * held_us AS DECIMAL(38,0))) "
                "AS DOUBLE) / CAST(SUM(held_us) AS DOUBLE) / 100.0, 6)"
            ).alias("twap"),
        )
        .orderBy("day")
    )


@register(
    "events_twap_daily",
    oracle="""
    WITH obs AS (
      SELECT CAST(ts AS DATE) AS day, CAST(ts AS TIMESTAMP) AS tts,
             event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'view'
    ),
    weighted AS (
      SELECT day, cents,
             CAST(epoch_us(COALESCE(
                    LEAD(tts) OVER (PARTITION BY day
                                    ORDER BY tts, event_id),
                    CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))
                  - epoch_us(tts) AS BIGINT) AS held_us
      FROM obs
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(CAST(SUM(held_us) AS BIGINT) // 1000000 AS BIGINT)
             AS held_seconds,
           ROUND(CAST(SUM(CAST(cents * held_us AS DECIMAL(38,0)))
                      AS DOUBLE)
                 / CAST(CAST(SUM(held_us) AS BIGINT) AS DOUBLE) / 100.0, 6)
             AS twap
    FROM weighted GROUP BY day ORDER BY day
    """,
    doc="Daily time-weighted average of 'view' values: each observation "
    "weighted by exact integer microseconds until the next same-day "
    "observation (last holds to midnight) via ONE day-keyed lead() "
    "window; cents x micros products fold through DECIMAL(38,0) and the "
    "single division is a shared fixed-order double — the "
    "irregular-sampling-correct mean a plain AVG gets wrong, at one "
    "bounded-state window shuffle.",
)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return twap_daily(load_table(spark, "events", sf_dir))


# --------------------------------------------------------------------------
# Maximum drawdown — the worst peak-to-trough collapse of the daily
# revenue series: the risk/monitoring readout finance runs on equity
# curves and an ops team runs on volume ("how bad did the worst slump
# get, and when"). Exact integers end to end.
# --------------------------------------------------------------------------


def max_drawdown_daily(orders: DataFrame, year: int = 1995) -> DataFrame:
    """One row: (n_days, peak_day, trough_day, peak_cents, trough_cents,
    drawdown_cents, drawdown_pct) for one calendar year of daily
    revenue.

    The corpus reduces to O(days) exact-BIGINT daily totals; a running
    max + a running drawdown are two ordered windows over those O(days)
    rows (bounded by calendar time, never event volume). The trough is
    the EARLIEST day achieving the maximal drawdown, and its peak the
    EARLIEST day at or before it achieving the running max — both
    deterministic under ties; drawdown_pct is one fixed-order final
    expression.
    """
    from pyspark.sql import Window

    daily = (
        orders.where(F.expr(f"year(CAST(o_orderdate AS DATE)) = {year}"))
        .groupBy(
            F.expr("CAST(datediff(CAST(o_orderdate AS DATE), "
                   "DATE '1970-01-01') AS BIGINT)").alias("x"))
        .agg(F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
             .alias("y"))
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("x")  # O(days) rows
    dd = (
        daily.withColumn("runmax", F.max("y").over(w))
        .withColumn("dd", F.col("runmax") - F.col("y"))
    ).localCheckpoint(eager=False)
    trough = (
        dd.orderBy(F.col("dd").desc(), F.col("x").asc()).limit(1)
        .select(F.col("x").alias("trough_day"),
                F.col("y").alias("trough_cents"),
                F.col("runmax").alias("peak_cents"),
                F.col("dd").alias("drawdown_cents"))
    )
    peak = (
        dd.crossJoin(F.broadcast(trough))
        .where((F.col("x") <= F.col("trough_day"))
               & (F.col("y") == F.col("peak_cents")))
        .orderBy(F.col("x").asc()).limit(1)
        .select(
            F.col("x").alias("peak_day"),
            "trough_day", "peak_cents", "trough_cents", "drawdown_cents",
        )
    )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return n.crossJoin(F.broadcast(peak)).selectExpr(
        "CAST(n_days AS BIGINT) AS n_days",
        "CAST(peak_day AS BIGINT) AS peak_day",
        "CAST(trough_day AS BIGINT) AS trough_day",
        "CAST(peak_cents AS BIGINT) AS peak_cents",
        "CAST(trough_cents AS BIGINT) AS trough_cents",
        "CAST(drawdown_cents AS BIGINT) AS drawdown_cents",
        "ROUND(CAST(drawdown_cents AS DOUBLE) / peak_cents * 100.0, 4)"
        " AS drawdown_pct",
    )


@register(
    "orders_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
      GROUP BY 1
    ),
    dd AS (
      SELECT x, y,
             CAST(MAX(y) OVER (ORDER BY x) AS BIGINT) AS runmax,
             CAST(MAX(y) OVER (ORDER BY x) - y AS BIGINT) AS dd
      FROM daily
    ),
    trough AS (
      SELECT x AS trough_day, y AS trough_cents, runmax AS peak_cents,
             dd AS drawdown_cents
      FROM dd ORDER BY dd DESC, x ASC LIMIT 1
    ),
    peak AS (
      SELECT d.x AS peak_day, t.trough_day, t.peak_cents,
             t.trough_cents, t.drawdown_cents
      FROM dd d, trough t
      WHERE d.x <= t.trough_day AND d.y = t.peak_cents
      ORDER BY d.x ASC LIMIT 1
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           peak_day, trough_day, peak_cents, trough_cents,
           drawdown_cents,
           ROUND(CAST(drawdown_cents AS DOUBLE) / peak_cents * 100.0, 4)
             AS drawdown_pct
    FROM peak
    """,
    doc="Maximum drawdown of the 1995 daily revenue series: running max "
    "and running drawdown as two ordered windows over the O(days) "
    "rollup (calendar-bounded, never event volume), earliest-trough / "
    "earliest-peak deterministic tiebreaks, exact BIGINT cents end to "
    "end with one final pct expression — the worst peak-to-trough "
    "collapse readout, beside the backlog curve and the control "
    "charts.",
)
def orders_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return max_drawdown_daily(load_table(spark, "orders", sf_dir))

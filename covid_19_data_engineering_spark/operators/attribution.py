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


# --------------------------------------------------------------------------
# Markov removal-effect attribution — the data-driven alternative to the
# positional (linear/last-touch) rules above: model each user's
# pre-conversion journey as a Markov chain over channels, compute the
# chain's conversion (absorption) probability, then re-compute it with
# each channel REMOVED (its incoming edges redirected to the NULL
# absorber). A channel's credit is how much conversion probability
# disappears without it (Anderl et al. 2014; every marketing-analytics
# warehouse ships this as "Markov attribution").
# --------------------------------------------------------------------------

MRK_ROUNDS = 16
MRK_UNIT = 1_000_000_000_000
# removal ratios scale by 1e6 (not 1e12): p_removed * ratio-unit must fit
# int64 (1e12 * 1e6 = 1e18 < 2^63), and 1e-6 matches the rounded output
MRK_RATIO = 1_000_000
_CONV, _NULL, _START = "CONV", "NULL_END", "START"


def _journey_edges(events: DataFrame) -> DataFrame:
    """(s, t, n) transition counts of the per-user journey chain.

    Journey = the user's events strictly before their FIRST purchase,
    ordered by (ts, event_id); outcome CONV if a purchase exists else
    NULL_END. Edges: START -> first channel (or straight to CONV for a
    zero-touch conversion), channel -> channel, last channel -> outcome.
    One user-keyed window shuffle; reduces the corpus to an
    O(channels^2) BIGINT count table.
    """
    from pyspark.sql import Window

    fp = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id").agg(F.min("ts").alias("pts"))
    )
    path = (
        events.join(fp, "user_id", "left")
        .where((F.col("event_type") != "purchase")
               & (F.col("pts").isNull() | (F.col("ts") < F.col("pts"))))
        .select("user_id", "event_type", "ts", "event_id",
                F.col("pts").isNotNull().alias("converts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = path.select(
        "user_id", "event_type", "converts",
        F.lag("event_type").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_path"),
    )
    internal = (
        seq.where(F.col("prev").isNotNull())
        .select(F.col("prev").alias("s"), F.col("event_type").alias("t"))
    )
    start = seq.where(F.col("rn") == 1).select(
        F.lit(_START).alias("s"), F.col("event_type").alias("t"))
    terminal = seq.where(F.col("rn") == F.col("n_path")).select(
        F.col("event_type").alias("s"),
        F.when(F.col("converts"), F.lit(_CONV)).otherwise(F.lit(_NULL))
        .alias("t"),
    )
    # zero-touch conversions: users whose first purchase precedes any
    # channel event (START -> CONV)
    zero = (
        fp.join(path.select("user_id").distinct(), "user_id", "left_anti")
        .select(F.lit(_START).alias("s"), F.lit(_CONV).alias("t"))
    )
    return (
        internal.unionByName(start).unionByName(terminal).unionByName(zero)
        .groupBy("s", "t").agg(F.count(F.lit(1)).alias("n"))
    )


def markov_removal_attribution(events: DataFrame,
                               rounds: int = MRK_ROUNDS) -> DataFrame:
    """(channel, p_full_units, p_removed_units, removal_units,
    attribution_share) — absorption-probability removal effects.

    p(s) = P(absorb at CONV from s), computed by ``rounds`` Jacobi steps
    of p <- T p with p(CONV) pinned at MRK_UNIT — pure (units * n) div r
    integer arithmetic, so every round is engine-identical and the
    oracle replays it CTE-for-CTE. Removing channel X = deleting edges
    into/out of X while keeping row totals (the redirected mass absorbs
    at NULL_END).

    Spark/driver split: the CORPUS work — reducing every user history to
    the (s, t, n) transition count table — is one distributed window
    shuffle (_journey_edges). The table that remains is
    alphabet-bounded: at most (channels + 2)^2 rows at ANY corpus scale,
    so the iteration runs on the driver over exact Python ints (the
    bounded-collect doctrine of inference.py/pq.py; a loud guard
    enforces the bound). The first cut iterated IN Spark — 16 rounds x
    (join + agg) on a ~40-row table cost ~6s of pure plan latency at
    every scale and zero distributed benefit.

    Removal credit in MRK_RATIO millionths: MRK_RATIO - (p_removed *
    MRK_RATIO) div p_full (fits int64 by construction; p_removed <=
    p_full because removal only redirects mass to NULL_END), normalized
    to shares at the end (rounded 6).
    """
    edge_rows = _journey_edges(events).collect()
    if len(edge_rows) > 400:  # (channels + 2)^2 with a wide margin
        raise ValueError(
            f"journey chain has {len(edge_rows)} edges; the event-type "
            "alphabet is expected to be domain-bounded — refusing an "
            "unbounded driver-side iteration")
    edges = {(r["s"], r["t"]): int(r["n"]) for r in edge_rows}
    r_tot: dict[str, int] = {}
    for (sx, _), n in edges.items():
        r_tot[sx] = r_tot.get(sx, 0) + n
    channels = sorted(
        {sx for sx, _ in edges} - {_START, _CONV, _NULL})

    def absorb(removed: str | None) -> int:
        tr = [
            (sx, tx, n, r_tot[sx]) for (sx, tx), n in edges.items()
            if removed is None or (sx != removed and tx != removed)
        ]
        p: dict[str, int] = {_CONV: MRK_UNIT}
        for _ in range(rounds):
            nxt: dict[str, int] = {}
            for sx, tx, n, rr in tr:
                if tx in p:
                    nxt[sx] = nxt.get(sx, 0) + (p[tx] * n) // rr
            nxt.pop(_CONV, None)
            nxt[_CONV] = MRK_UNIT
            p = nxt
        return p.get(_START, 0)

    p_full = absorb(None)
    out = []
    for ch in channels:
        p_rem = absorb(ch)
        removal = (0 if p_full == 0
                   else MRK_RATIO - (p_rem * MRK_RATIO) // p_full)
        out.append([ch, p_full, p_rem, removal])
    tot = sum(r[3] for r in out)
    spark = events.sparkSession
    return spark.createDataFrame(
        [(ch, pf, pr, ru,
          None if tot == 0 else round(ru / tot, 6))
         for ch, pf, pr, ru in sorted(out)],
        "channel string, p_full_units long, p_removed_units long, "
        "removal_units long, attribution_share double",
    )


def _markov_removal_oracle_sql() -> str:
    it = """
    it{i} AS MATERIALIZED (
      SELECT * FROM (
        SELECT tr.scenario, tr.s AS state,
               CAST(SUM((p.units * tr.n) // tr.r) AS BIGINT) AS units
        FROM it{p} p JOIN trans tr
          ON tr.t = p.state AND tr.scenario = p.scenario
        GROUP BY tr.scenario, tr.s
        HAVING tr.s <> 'CONV'
      )
      UNION ALL SELECT * FROM conv
    )"""
    chain = ",".join(it.format(i=i, p=i - 1)
                     for i in range(1, MRK_ROUNDS + 1))
    return f"""
    WITH fp AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS pts
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    path AS (
      SELECT e.user_id, e.event_type, CAST(e.ts AS TIMESTAMP) AS ts,
             e.event_id, fp.pts IS NOT NULL AS converts
      FROM events e LEFT JOIN fp USING (user_id)
      WHERE e.event_type <> 'purchase'
        AND (fp.pts IS NULL OR CAST(e.ts AS TIMESTAMP) < fp.pts)
    ),
    seq AS (
      SELECT user_id, event_type, converts,
             LAG(event_type) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_path
      FROM path
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    alledges AS (
      SELECT prev AS s, event_type AS t FROM seq WHERE prev IS NOT NULL
      UNION ALL
      SELECT 'START', event_type FROM seq WHERE rn = 1
      UNION ALL
      SELECT event_type,
             CASE WHEN converts THEN 'CONV' ELSE 'NULL_END' END
      FROM seq WHERE rn = n_path
      UNION ALL
      SELECT 'START', 'CONV'
      FROM fp WHERE user_id NOT IN (SELECT DISTINCT user_id FROM path)
    ),
    edges AS MATERIALIZED (
      SELECT s, t, CAST(COUNT(*) AS BIGINT) AS n FROM alledges GROUP BY 1, 2
    ),
    rt AS MATERIALIZED (SELECT s, CAST(SUM(n) AS BIGINT) AS r
                        FROM edges GROUP BY s),
    channels AS (
      SELECT DISTINCT s AS ch FROM edges
      WHERE s NOT IN ('START', 'CONV', 'NULL_END')
    ),
    scen AS (
      SELECT ch AS removed FROM channels
      UNION ALL SELECT NULL
    ),
    trans AS MATERIALIZED (
      SELECT COALESCE(removed, '__full__') AS scenario,
             e.s, e.t, e.n, rt.r
      FROM scen CROSS JOIN edges e JOIN rt ON rt.s = e.s
      WHERE removed IS NULL OR (e.s <> removed AND e.t <> removed)
    ),
    conv AS MATERIALIZED (
      SELECT DISTINCT scenario, 'CONV' AS state,
             CAST({MRK_UNIT} AS BIGINT) AS units
      FROM trans
    ),
    it0 AS MATERIALIZED (SELECT * FROM conv),
    {chain},
    starts AS (
      SELECT sl.scenario, COALESCE(iv.units, 0) AS pu
      FROM (SELECT DISTINCT scenario FROM trans) sl
      LEFT JOIN (SELECT scenario, units FROM it{MRK_ROUNDS}
                 WHERE state = 'START') iv
        ON iv.scenario = sl.scenario
    ),
    scored AS (
      SELECT r.scenario AS channel,
             f.pu AS p_full_units,
             r.pu AS p_removed_units,
             CASE WHEN f.pu = 0 THEN 0
                  ELSE {MRK_RATIO} - (r.pu * {MRK_RATIO}) // f.pu
             END AS removal_units
      FROM starts r CROSS JOIN
           (SELECT pu FROM starts WHERE scenario = '__full__') f
      WHERE r.scenario <> '__full__'
    )
    SELECT channel, p_full_units, p_removed_units, removal_units,
           CASE WHEN (SELECT SUM(removal_units) FROM scored) = 0
                THEN CAST(NULL AS DOUBLE)
                ELSE ROUND(CAST(removal_units AS DOUBLE)
                           / (SELECT SUM(removal_units) FROM scored), 6)
           END AS attribution_share
    FROM scored
    ORDER BY channel
    """


@register(
    "attribution_markov_removal",
    oracle=_markov_removal_oracle_sql(),
    doc=f"Markov removal-effect attribution: per-user pre-first-purchase "
    "journeys reduce (one window shuffle) to an O(channels^2) BIGINT "
    f"transition table; {MRK_ROUNDS} unrolled integer Jacobi rounds "
    "compute the chain's CONV-absorption probability for the full graph "
    "and for each channel-removed graph SIMULTANEOUSLY (scenario-keyed "
    "rows, one tiny join-aggregate per round, oracle unrolled "
    "CTE-for-CTE); credit = lost conversion probability, normalized.",
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return markov_removal_attribution(events)


# --------------------------------------------------------------------------
# Shapley-value attribution — the coalition-game companion of the Markov
# removal model (Zhao et al. 2018, "Shapley Value Methods for Attribution
# Modeling"): v(S) = observed average purchase revenue (exact cents) of
# users whose touched channel SET is S — the REVENUE game; the
# conversion-RATE game is degenerate on this corpus (every user with a
# long enough history converts, making v constant and every Shapley
# value exactly zero), while revenue varies per user and yields an
# informative split. Channel i's credit is its exact Shapley value.
#
# The computational trick that makes this corpus-scale: by LINEARITY the
# 2^k subset lattice never materializes. Each observed coalition M
# contributes w(|M|-1) * v(M) to every member channel (as the S u {i}
# term) and -w(|M|) * v(M) to every non-member (as the S term), with
# w(s) = s! (k-1-s)!. So Shapley = one join between the O(2^k)-row mask
# aggregate and the k-row channel dim — and only OBSERVED masks carry
# nonzero v, so the unobserved lattice contributes nothing by
# construction. All arithmetic is integer fixed-point (v in 1e-12 units,
# factorial weights exact BIGINTs, one final div by k!).
# --------------------------------------------------------------------------

# revenue-game fixed point: micro-cents per user (cents * 1e6); products
# with the k<=8 factorial weights stay far inside int64
SHAP_UNIT = 1_000_000

_FACT_CASE = ("CASE {x} WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 "
              "WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120 "
              "WHEN 6 THEN 720 WHEN 7 THEN 5040 WHEN 8 THEN 40320 END")


def shapley_attribution(events: DataFrame) -> DataFrame:
    """(channel, phi_units, attribution_share) — exact Shapley credit
    over the observed-coalition revenue game: v(S) = (sum of member
    users' lifetime purchase cents * SHAP_UNIT) div group size. Journey
    definition shared with the Markov model: the channel set touched
    strictly before the user's first purchase. Zero-touch purchasers
    land in the empty coalition and set the game's baseline v(empty)
    naturally. Both engines TRUNCATE integer division toward zero
    (Spark div == DuckDB //), which matters for negative phi."""
    fp = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id").agg(F.min("ts").alias("pts"))
    )
    touched = (
        events.join(fp, "user_id", "left")
        .where((F.col("event_type") != "purchase")
               & (F.col("pts").isNull() | (F.col("ts") < F.col("pts"))))
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    from pyspark.sql import Window

    chdim = (
        touched.select("channel").distinct()
        .select("channel",
                (F.row_number().over(Window.orderBy("channel")) - 1)
                .alias("bitpos"))
    )
    # every user participates; value = lifetime purchase cents (exact)
    rev = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.expr("CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
             .alias("cv"))
    )
    allu = events.select("user_id").distinct().join(rev, "user_id", "left")
    umask = (
        allu.join(
            touched.join(F.broadcast(chdim), "channel")
            .groupBy("user_id")
            .agg(F.sum(F.expr("CAST(1 AS BIGINT) * CAST(pow(2, bitpos) AS BIGINT)"))
                 .alias("mask")),
            "user_id", "left")
        .select(F.coalesce("mask", F.lit(0)).alias("mask"),
                F.coalesce("cv", F.lit(0)).alias("cv"))
    )
    msk = (
        umask.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_users"), F.sum("cv").alias("n_conv"))
        .select("mask",
                F.expr(f"(n_conv * {SHAP_UNIT}) div n_users").alias("v_units"),
                F.expr("CAST(bit_count(mask) AS BIGINT)").alias("pc"))
    )
    kf = chdim.agg(F.count(F.lit(1)).alias("k"))
    contrib = (
        msk.crossJoin(F.broadcast(chdim)).crossJoin(F.broadcast(kf))
        .select(
            "channel",
            F.expr(
                "CASE WHEN (mask div CAST(pow(2, bitpos) AS BIGINT)) % 2 = 1 "
                f"THEN ({_FACT_CASE.format(x='pc - 1')}) "
                f"     * ({_FACT_CASE.format(x='k - pc')}) * v_units "
                f"ELSE -({_FACT_CASE.format(x='pc')}) "
                f"     * ({_FACT_CASE.format(x='k - 1 - pc')}) * v_units END"
            ).alias("c"),
        )
    )
    phi = (
        contrib.groupBy("channel").agg(F.sum("c").alias("csum"))
        .crossJoin(F.broadcast(kf))
        .select("channel",
                F.expr(f"csum div ({_FACT_CASE.format(x='k')})")
                .alias("phi_units"))
    )
    tot = phi.agg(F.sum("phi_units").alias("tot"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel", "phi_units",
            F.when(F.col("tot") == 0, F.lit(None).cast("double"))
            .otherwise(F.round(F.col("phi_units").cast("double")
                               / F.col("tot"), 6))
            .alias("attribution_share"),
        )
        .orderBy("channel")
    )


def _shapley_oracle_sql() -> str:
    f_pc1 = _FACT_CASE.format(x="pc - 1")
    f_kpc = _FACT_CASE.format(x="k - pc")
    f_pc = _FACT_CASE.format(x="pc")
    f_k1pc = _FACT_CASE.format(x="k - 1 - pc")
    f_k = _FACT_CASE.format(x="k")
    return f"""
    WITH fp AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS pts
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touched AS (
      SELECT DISTINCT e.user_id, e.event_type AS channel
      FROM events e LEFT JOIN fp USING (user_id)
      WHERE e.event_type <> 'purchase'
        AND (fp.pts IS NULL OR CAST(e.ts AS TIMESTAMP) < fp.pts)
    ),
    chdim AS (
      SELECT channel,
             ROW_NUMBER() OVER (ORDER BY channel) - 1 AS bitpos
      FROM (SELECT DISTINCT channel FROM touched)
    ),
    rev AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cv
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    allu AS (
      SELECT u.user_id, COALESCE(rev.cv, 0) AS cv
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN rev ON rev.user_id = u.user_id
    ),
    umask AS (
      SELECT COALESCE(m.mask, 0) AS mask, a.cv
      FROM allu a LEFT JOIN (
        SELECT t.user_id,
               CAST(SUM(CAST(power(2, c.bitpos) AS BIGINT)) AS BIGINT) AS mask
        FROM touched t JOIN chdim c USING (channel)
        GROUP BY t.user_id
      ) m ON m.user_id = a.user_id
    ),
    msk AS (
      SELECT mask,
             (CAST(SUM(cv) AS BIGINT) * {SHAP_UNIT}) // COUNT(*) AS v_units,
             CAST(bit_count(mask) AS BIGINT) AS pc
      FROM umask GROUP BY mask
    ),
    kf AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM chdim),
    contrib AS (
      SELECT c.channel,
             CASE WHEN (mask // CAST(power(2, c.bitpos) AS BIGINT)) % 2 = 1
                  THEN ({f_pc1}) * ({f_kpc}) * v_units
                  ELSE -({f_pc}) * ({f_k1pc}) * v_units END AS cterm
      FROM msk CROSS JOIN chdim c CROSS JOIN kf
    ),
    phi AS (
      SELECT channel,
             CAST(SUM(cterm) AS BIGINT) // ({f_k}) AS phi_units
      FROM contrib CROSS JOIN kf
      GROUP BY channel, k
    )
    SELECT channel, phi_units,
           CASE WHEN (SELECT SUM(phi_units) FROM phi) = 0
                THEN CAST(NULL AS DOUBLE)
                ELSE ROUND(CAST(phi_units AS DOUBLE)
                           / (SELECT SUM(phi_units) FROM phi), 6)
           END AS attribution_share
    FROM phi
    ORDER BY channel
    """


@register(
    "attribution_shapley",
    oracle=_shapley_oracle_sql(),
    doc="Exact Shapley-value attribution over the observed-coalition "
    "REVENUE game (v(S) = mean lifetime purchase cents, exact "
    "micro-cent fixed point; the conversion-rate game is constant on "
    "this corpus and identically zero): per-user pre-first-purchase "
    "channel SETS "
    "collapse to an O(2^k)-row mask aggregate; by linearity each "
    "observed coalition contributes w(|M|-1)*v to members and "
    "-w(|M|)*v to non-members (w(s)=s!(k-1-s)!), so the subset lattice "
    "never materializes — one mask x channel-dim broadcast join, all "
    "integer fixed-point, final div by k!.",
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return shapley_attribution(events)

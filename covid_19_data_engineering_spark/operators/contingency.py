"""Contingency-table independence statistics between two categorical
columns — chi-square, mutual information, and Cramer's V in one pass: the
"are these two fields actually independent?" audit a data-quality or
feature-selection pipeline runs before trusting a stratification.

No reference analogue (tdiprima/covid-19-data-engineering delegates all
analytics to its warehouses); SURVEY §2 C-extensions.

Float-parity strategy (drift.py's trick applied to the R x C grid): the
corpus reduces to exact BIGINT cell counts via ONE map-side-combined
groupBy on the column pair; every statistic's per-cell term is a single
fixed-order double expression over those integers, rounded to fixed point
BEFORE the SUM so no association-order-dependent float sum exists. The
chi-square numerator is carried multiplied out — (n*n_ij - r_i*c_j)^2
over n*r_i*c_j — so expected counts never materialize as intermediate
floats.

100 TB shape: the pair groupBy is the only corpus-wide work; marginals,
the dense grid (empty cells matter for chi-square), and the reductions all
run on <= R*C aggregated rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

# fixed-point scale for per-cell terms: chi-square terms are bounded by n
# (~1e9 rows at extreme SF keeps 1e6-scaled terms inside BIGINT); MI terms
# are bounded by ln(min(R, C)) so 1e9 units keep 9 decimals
_CHI_FX = 1_000_000
_MI_FX = 1_000_000_000

# (n*n_ij - r_i*c_j)^2 / (n * r_i * c_j): the chi-square cell term with
# expected counts cleared to integers, one fixed-order double division
_CHI_TERM = ("(CAST(n * c AS DOUBLE) - CAST(ri * cj AS DOUBLE)) * "
             "(CAST(n * c AS DOUBLE) - CAST(ri * cj AS DOUBLE)) / "
             "(CAST(n AS DOUBLE) * CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE))")
_CHI_FIXED = f"CAST(round({_CHI_TERM} * {_CHI_FX}) AS BIGINT)"

# p_ij * ln(n * n_ij / (r_i * c_j)) with the 0*ln(0) := 0 convention
_MI_TERM = ("(CASE WHEN c > 0 THEN (CAST(c AS DOUBLE) / n) * "
            "ln(CAST(n AS DOUBLE) * c / (CAST(ri AS DOUBLE) * cj)) "
            "ELSE 0.0 END)")
_MI_FIXED = f"CAST(round({_MI_TERM} * {_MI_FX}) AS BIGINT)"


def contingency_independence(df: DataFrame, row_col: str,
                             col_col: str) -> DataFrame:
    """One-row profile: n, table shape, dof, chi_square, p-ish decision
    inputs (Cramer's V), and mutual information in nats."""
    cnt = (
        df.groupBy(F.col(row_col).alias("r"), F.col(col_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = cnt.groupBy("r").agg(F.sum("c").alias("ri"))
    cols = cnt.groupBy("k").agg(F.sum("c").alias("cj"))
    tot = cnt.agg(F.sum("c").alias("n"))
    # dense grid: chi-square charges empty cells (n_ij = 0 -> term
    # e_ij/n), so observed counts left-join onto the marginal cross join
    grid = (
        rows.crossJoin(F.broadcast(cols))
        .join(cnt, ["r", "k"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    prof = grid.agg(
        F.max("n").alias("n"),
        F.countDistinct("r").alias("n_rows"),
        F.countDistinct("k").alias("n_cols"),
        F.sum(F.expr(_CHI_FIXED)).alias("chi_fx"),
        F.sum(F.expr(_MI_FIXED)).alias("mi_fx"),
    )
    return prof.select(
        "n",
        "n_rows",
        "n_cols",
        F.expr("(n_rows - 1) * (n_cols - 1)").cast("long").alias("dof"),
        F.round(F.expr(f"CAST(chi_fx AS DOUBLE) / {_CHI_FX}"), 4)
        .alias("chi_square"),
        F.round(
            F.expr(
                f"sqrt((CAST(chi_fx AS DOUBLE) / {_CHI_FX}) / "
                "(n * least(n_rows - 1, n_cols - 1)))"
            ),
            6,
        ).alias("cramers_v"),
        F.round(F.expr(f"CAST(mi_fx AS DOUBLE) / {_MI_FX}"), 6)
        .alias("mi_nats"),
    )


@register(
    "order_status_priority_independence",
    oracle=f"""
    WITH cnt AS (
      SELECT o_orderstatus AS r, o_orderpriority AS k,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    rows_m AS (
      SELECT r, CAST(SUM(c) AS BIGINT) AS ri FROM cnt GROUP BY r
    ),
    cols_m AS (
      SELECT k, CAST(SUM(c) AS BIGINT) AS cj FROM cnt GROUP BY k
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
    ),
    grid AS (
      SELECT rm.r, rm.ri, cm.k, cm.cj,
             CAST(COALESCE(c.c, 0) AS BIGINT) AS c,
             (SELECT n FROM tot) AS n
      FROM rows_m rm CROSS JOIN cols_m cm
      LEFT JOIN cnt c ON c.r = rm.r AND c.k = cm.k
    ),
    prof AS (
      SELECT MAX(n) AS n,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT k) AS BIGINT) AS n_cols,
             CAST(SUM({_CHI_FIXED}) AS BIGINT) AS chi_fx,
             CAST(SUM({_MI_FIXED}) AS BIGINT) AS mi_fx
      FROM grid
    )
    SELECT n, n_rows, n_cols,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           ROUND(CAST(chi_fx AS DOUBLE) / {_CHI_FX}, 4) AS chi_square,
           ROUND(sqrt((CAST(chi_fx AS DOUBLE) / {_CHI_FX}) /
                      (n * least(n_rows - 1, n_cols - 1))), 6) AS cramers_v,
           ROUND(CAST(mi_fx AS DOUBLE) / {_MI_FX}, 6) AS mi_nats
    FROM prof
    """,
    doc="Chi-square test of independence, Cramer's V, and mutual "
    "information between o_orderstatus and o_orderpriority in one pass: "
    "ONE map-side-combined groupBy on the pair reduces the corpus to "
    "exact BIGINT cell counts; the dense R x C grid (empty cells charge "
    "chi-square) reduces with per-cell terms carried multiplied out — "
    "(n*n_ij - ri*cj)^2 over n*ri*cj — and rounded to fixed point before "
    "the SUM, so every statistic is engine-identical.",
)
def order_status_priority_independence(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return contingency_independence(orders, "o_orderstatus",
                                    "o_orderpriority")


# --------------------------------------------------------------------------
# Best binary split of a numeric feature by information gain.
# --------------------------------------------------------------------------

IG_BINS = 64
_IG_FX = 1_000_000_000

# weighted entropy in nat-counts: n*H(S) = T(n) - T(p) - T(n-p) with
# T(x) = x*ln(x) (0 for x = 0), each T fixed-pointed BEFORE any sum so
# the candidate scores are exact integer arithmetic over six terms
_T = ("(CASE WHEN {x} > 0 THEN CAST(round(CAST({x} AS DOUBLE) * "
      f"ln(CAST({{x}} AS DOUBLE)) * {_IG_FX}) AS BIGINT) ELSE 0 END)")


def _w(n: str, p: str) -> str:
    return (f"({_T.format(x=n)} - {_T.format(x=p)} "
            f"- {_T.format(x=f'({n} - {p})')})")


def best_split_information_gain(df: DataFrame, value_col: str,
                                label_col: str,
                                bins: int = IG_BINS) -> DataFrame:
    """One-row decision-stump search: the binary split of ``value_col``
    (over a shared equal-width integer-cent grid) that maximizes
    information gain against the boolean ``label_col`` — the
    feature-quality probe a quality-classifier pipeline runs before
    training anything.

    (split_cents, n_left, pos_left, n_right, pos_right, info_gain).

    Exactness: candidate scores are n*IG in fixed-point nat-counts —
    every x*ln(x) term is individually rounded to 1e-9 units off exact
    BIGINT counts, so the argmax (min-boundary tiebreak) and the gain
    are engine-identical. 100 TB shape: one map-side-combined bin
    groupBy is the only corpus-wide work; the 63-candidate scan is a
    window over <= bins rows.
    """
    lim = df.agg(
        F.min(F.expr(f"CAST(round({value_col} * 100) AS BIGINT)"))
        .alias("lo"),
        F.max(F.expr(f"CAST(round({value_col} * 100) AS BIGINT)"))
        .alias("hi"),
    )
    binned = df.crossJoin(F.broadcast(lim)).select(
        F.expr(f"CAST((CAST(round({value_col} * 100) AS BIGINT) - lo) "
               f"* {bins} DIV (hi - lo + 1) AS BIGINT)").alias("b"),
        F.col(label_col).cast("long").alias("pos"),
        "lo", "hi",
    )
    cnt = binned.groupBy("b", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    from pyspark.sql import Window

    w = Window.orderBy("b")  # O(bins) rows — harmless
    tot = cnt.agg(F.sum("n").alias("nt"), F.sum("p").alias("pt"))
    cum = (
        cnt.withColumn("nl", F.sum("n").over(w))
        .withColumn("pl", F.sum("p").over(w))
        .crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("nt"))  # a split must leave a right side
        .select(
            "b", "lo", "hi", "nl", "pl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("pt") - F.col("pl")).alias("pr"),
            "nt", "pt",
            F.expr(f"{_w('nt', 'pt')} - {_w('nl', 'pl')} "
                   f"- {_w('(nt - nl)', '(pt - pl)')}").alias("score_fx"),
        )
    )
    mx = cum.agg(F.max("score_fx").alias("best_fx"))
    return (
        cum.crossJoin(F.broadcast(mx))
        .where(F.col("score_fx") == F.col("best_fx"))
        .groupBy()
        .agg(
            F.min("b").alias("_b"),
            F.min(F.expr("lo + ((b + 1) * (hi - lo + 1)) div "
                         f"{bins}")).alias("split_cents"),
            F.min("nl").alias("n_left"),
            F.min("pl").alias("pos_left"),
            F.min("nr").alias("n_right"),
            F.min("pr").alias("pos_right"),
            F.min(F.expr(
                f"round(CAST(score_fx AS DOUBLE) / {_IG_FX} / nt, 6)"
            )).alias("info_gain"),
        )
        .drop("_b")
        .select("split_cents", "n_left", "pos_left", "n_right",
                "pos_right", "info_gain")
    )


@register(
    "error_value_split_gain",
    oracle=f"""
    WITH lim AS (
      SELECT MIN(CAST(round(value * 100) AS BIGINT)) AS lo,
             MAX(CAST(round(value * 100) AS BIGINT)) AS hi
      FROM events
    ),
    binned AS (
      SELECT CAST((CAST(round(value * 100) AS BIGINT) - lo) * {IG_BINS}
                  // (hi - lo + 1) AS BIGINT) AS b,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS pos,
             lo, hi
      FROM events, lim
    ),
    cnt AS (
      SELECT b, lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM binned GROUP BY b, lo, hi
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(p) AS BIGINT) AS pt
      FROM cnt
    ),
    cum AS (
      SELECT b, lo, hi,
             CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS nl,
             CAST(SUM(p) OVER (ORDER BY b) AS BIGINT) AS pl,
             nt, pt
      FROM cnt, tot
    ),
    scored AS (
      SELECT b, lo, hi, nl, pl, nt - nl AS nr, pt - pl AS pr, nt, pt,
             {_w('nt', 'pt')} - {_w('nl', 'pl')}
               - {_w('(nt - nl)', '(pt - pl)')} AS score_fx
      FROM cum WHERE nl < nt
    )
    SELECT MIN(lo + ((b + 1) * (hi - lo + 1)) // {IG_BINS})
             AS split_cents,
           MIN(nl) AS n_left, MIN(pl) AS pos_left,
           MIN(nr) AS n_right, MIN(pr) AS pos_right,
           MIN(round(CAST(score_fx AS DOUBLE) / {_IG_FX} / nt, 6))
             AS info_gain
    FROM scored
    WHERE score_fx = (SELECT MAX(score_fx) FROM scored)
    """,
    doc=f"Decision-stump feature probe: the binary split of the value "
    f"column (over {IG_BINS} shared integer-cent bins) that maximizes "
    "information gain against the error label. Candidate scores are n*IG "
    "in fixed-point nat-counts (every x*ln(x) term individually rounded "
    "off exact BIGINT counts), so the argmax and the gain are engine-"
    "identical; one bin groupBy is the only corpus-wide work and the "
    "candidate scan is a window over <= bins rows.",
)
def error_value_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return best_split_information_gain(
        events.select("value", (F.col("event_type") == "error")
                      .alias("is_error")),
        "value", "is_error")


# --------------------------------------------------------------------------
# Cochran-Mantel-Haenszel stratified 2x2 analysis — "does exposure
# associate with outcome CONTROLLING for a confounder?" The classic
# epidemiology readout (thematically the analysis the reference's COVID
# warehouse users would run downstream); statistically, the stratified
# upgrade of the chi-square independence test above, immune to
# Simpson's-paradox reversals that a pooled 2x2 invites.
# --------------------------------------------------------------------------

_MH_FX = 1_000_000  # fixed-point scale for per-stratum rational terms
_MH_CHI_CRIT = 3.8415  # chi-square df=1, two-sided 5%

# per-stratum 2x2 terms over exact BIGINT cells (a = exposed+outcome,
# b = exposed only, c = outcome only, d = neither, n = a+b+c+d), each a
# single fixed-order double expression rounded to fixed point BEFORE the
# cross-stratum sum (the module's float-parity strategy):
#   num/den : the Mantel-Haenszel common-odds-ratio components a*d/n, b*c/n
#   e       : E[a] under the stratum null, (a+b)(a+c)/n
#   v       : Var[a] hypergeometric, (a+b)(c+d)(a+c)(b+d) / (n^2 (n-1))
_MH_TERMS = {
    "num_fx": ("CAST(round(CAST(a AS DOUBLE) * d / n * {fx}) AS BIGINT)"),
    "den_fx": ("CAST(round(CAST(b AS DOUBLE) * c / n * {fx}) AS BIGINT)"),
    "e_fx": ("CAST(round(CAST(a + b AS DOUBLE) * (a + c) / n * {fx}) "
             "AS BIGINT)"),
    "v_fx": ("CAST(round(CAST(a + b AS DOUBLE) * (c + d) * (a + c) "
             "* (b + d) / (CAST(n AS DOUBLE) * n * (n - 1)) * {fx}) "
             "AS BIGINT)"),
}


def _mh_final_select() -> list[str]:
    """The shared (Spark == DuckDB) solve over the one sum row."""
    fx = float(_MH_FX)
    cmh = (f"((abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / {fx}) - 0.5) "
           f"* (abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / {fx}) - 0.5) "
           f"/ (CAST(sv AS DOUBLE) / {fx}))")
    return [
        "CAST(n_strata AS BIGINT) AS n_strata",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(sa AS BIGINT) AS exposed_outcome_total",
        "ROUND(CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE), 6) AS or_mh",
        f"ROUND({cmh}, 4) AS cmh_stat",
        f"(ROUND({cmh}, 4) > {_MH_CHI_CRIT}) AS significant",
    ]


def mantel_haenszel(df: DataFrame, stratum_col: str, exposed_col: str,
                    outcome_col: str) -> DataFrame:
    """One-row CMH test + MH common odds ratio of ``exposed_col`` vs
    ``outcome_col`` (both boolean) stratified by ``stratum_col``:
    (n_strata, n_rows, exposed_outcome_total, or_mh, cmh_stat,
    significant).

    The corpus reduces to FOUR exact BIGINT cells per stratum in ONE
    map-side-combined groupBy; every cross-stratum sum is over per-
    stratum terms individually rounded to 1e-6 fixed point (so no
    stratum-order-dependent float sum exists), and the continuity-
    corrected CMH statistic plus the Mantel-Haenszel pooled odds ratio
    are fixed-order double expressions over the single sum row, shared
    verbatim with the oracle. Degenerate strata (n < 2, where the
    hypergeometric variance divides by zero) are excluded identically
    on both engines.

    100 TB shape: one aggregate scan; everything after runs on
    O(strata) rows.
    """
    cells = (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(*[
            F.sum(F.expr(e)).cast("bigint").alias(nm)
            for nm, e in (
                ("a", f"CASE WHEN {exposed_col} AND {outcome_col} "
                      "THEN 1 ELSE 0 END"),
                ("b", f"CASE WHEN {exposed_col} AND NOT {outcome_col} "
                      "THEN 1 ELSE 0 END"),
                ("c", f"CASE WHEN NOT {exposed_col} AND {outcome_col} "
                      "THEN 1 ELSE 0 END"),
                ("d", f"CASE WHEN NOT {exposed_col} AND NOT {outcome_col} "
                      "THEN 1 ELSE 0 END"),
            )
        ])
        .withColumn("n", F.expr("a + b + c + d"))
        .where("n > 1")
    )
    terms = cells.select(
        "a", "n",
        *[F.expr(t.format(fx=_MH_FX)).alias(nm)
          for nm, t in _MH_TERMS.items()],
    )
    sums = terms.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("n").alias("n_rows"),
        F.sum("a").alias("sa"),
        F.sum("e_fx").alias("se"),
        F.sum("v_fx").alias("sv"),
        F.sum("num_fx").alias("snum"),
        F.sum("den_fx").alias("sden"),
    )
    return sums.selectExpr(*_mh_final_select())


def _mh_oracle_sql() -> str:
    terms = ", ".join(
        t.format(fx=_MH_FX) + f" AS {nm}" for nm, t in _MH_TERMS.items()
    )
    return f"""
    WITH flagged AS (
      SELECT year(CAST(l_shipdate AS DATE)) AS stratum,
             l_returnflag = 'R' AS exposed,
             l_discount > 0.05 AS outcome
      FROM lineitem
    ),
    cells AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN exposed AND outcome
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exposed AND NOT outcome
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN NOT exposed AND outcome
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN NOT exposed AND NOT outcome
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM flagged GROUP BY stratum
    ),
    sized AS (
      SELECT *, a + b + c + d AS n FROM cells WHERE a + b + c + d > 1
    ),
    terms AS (SELECT a, n, {terms} FROM sized),
    sums AS (
      SELECT COUNT(*) AS n_strata, SUM(n) AS n_rows, SUM(a) AS sa,
             SUM(e_fx) AS se, SUM(v_fx) AS sv,
             SUM(num_fx) AS snum, SUM(den_fx) AS sden
      FROM terms
    )
    SELECT {", ".join(_mh_final_select())} FROM sums
    """


@register(
    "lineitem_mantel_haenszel",
    oracle=_mh_oracle_sql(),
    doc="Cochran-Mantel-Haenszel analysis of returned (l_returnflag='R') "
    "vs deep-discounted (l_discount > 0.05) stratified by ship YEAR "
    "(the time confounder): the MH "
    "common odds ratio sum(a*d/n)/sum(b*c/n) and the continuity-"
    "corrected CMH chi-square from exact per-stratum BIGINT cells in "
    "ONE map-side-combined groupBy, per-stratum rational terms rounded "
    "to 1e-6 fixed point before the cross-stratum sums (no order-"
    "dependent float reduction). The Simpson's-paradox-proof stratified "
    "upgrade of the pooled chi-square independence audit.",
)
def lineitem_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return mantel_haenszel(
        li.select(
            F.expr("year(CAST(l_shipdate AS DATE))").alias("ship_year"),
            F.expr("l_returnflag = 'R'").alias("exposed"),
            F.expr("l_discount > 0.05").alias("outcome"),
        ),
        "ship_year", "exposed", "outcome",
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test — "does the OUTCOME RATE move monotonically
# with an ORDERED category?" The dose-response test that completes this
# module's family: chi-square (any association), CMH (association
# controlling a confounder), Cochran-Armitage (ordered trend).
# --------------------------------------------------------------------------

_CA_Z_CRIT = 1.96  # two-sided 5%


def _ca_select() -> list[str]:
    """The shared (Spark == DuckDB) solve over the one moment row:
    T = sum(score * failures); E[T] = p*sum(score*n); Var[T] =
    p(1-p)(sum(score^2 n) - (sum(score n))^2 / N) with p = R/N."""
    p = "(CAST(r_fail AS DOUBLE) / n_rows)"
    et = f"({p} * CAST(s1 AS DOUBLE))"
    vt = (f"({p} * (1 - {p}) * (CAST(s2 AS DOUBLE) "
          f"- CAST(s1 AS DOUBLE) * s1 / n_rows))")
    z = f"((CAST(t_stat AS DOUBLE) - {et}) / sqrt({vt}))"
    zr = f"ROUND({z}, 4)"
    return [
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(r_fail AS BIGINT) AS r_fail",
        "CAST(t_stat AS BIGINT) AS t_stat",
        f"{zr} AS z_stat",
        f"(CASE WHEN {zr} > {_CA_Z_CRIT} THEN 'increasing' "
        f"WHEN {zr} < -{_CA_Z_CRIT} THEN 'decreasing' "
        "ELSE 'none' END) AS trend",
    ]


def cochran_armitage(df: DataFrame, score_col: str,
                     outcome_col: str) -> DataFrame:
    """One-row Cochran-Armitage trend test of a boolean outcome across
    integer ordered scores: (n_rows, r_fail, t_stat, z_stat, trend).

    The corpus reduces to FIVE exact BIGINT moments (N, successes R,
    sum of scores, sum of squared scores, score-weighted successes T)
    in ONE map-side-combined aggregate — scores are single digits, so
    every sum fits BIGINT at any corpus size. The z statistic is one
    fixed-order double expression over the single moment row, shared
    verbatim with the oracle (Armitage 1955). 100 TB shape: one
    aggregate scan, nothing wider than the partial rows.
    """
    moms = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(outcome_col).cast("long")).alias("r_fail"),
        F.sum(F.col(score_col).cast("long")).alias("s1"),
        F.sum((F.col(score_col) * F.col(score_col)).cast("long"))
        .alias("s2"),
        F.sum((F.col(score_col)
               * F.col(outcome_col).cast("int")).cast("long"))
        .alias("t_stat"),
    )
    return moms.selectExpr(*_ca_select())


@register(
    "orders_cochran_armitage",
    oracle=f"""
    WITH moms AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_fail,
             CAST(SUM(CAST(substring(o_orderpriority, 1, 1) AS BIGINT))
                  AS BIGINT) AS s1,
             CAST(SUM(CAST(substring(o_orderpriority, 1, 1) AS BIGINT)
                      * CAST(substring(o_orderpriority, 1, 1) AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(substring(o_orderpriority, 1, 1) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS t_stat
      FROM orders
    )
    SELECT {", ".join(_ca_select())} FROM moms
    """,
    doc="Cochran-Armitage dose-response test: does the fulfilled rate "
    "(o_orderstatus='F') trend monotonically with the ordered priority "
    "score (the leading digit of o_orderpriority, 1-URGENT .. 5-LOW)? "
    "Five exact BIGINT moments in ONE map-side-combined aggregate, the "
    "z statistic as a fixed-order double expression over the single "
    "moment row — the ordered-category completion of the chi-square / "
    "CMH family (chi-square: any association; CMH: confounder-"
    "stratified; CA: ordered trend).",
)
def orders_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return cochran_armitage(
        orders.select(
            F.expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .alias("score"),
            F.expr("o_orderstatus = 'F'").alias("failed"),
        ),
        "score", "failed",
    )

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

"""Privacy / re-identification audits — the data-governance gate a dataset
passes before it leaves the curation pipeline.

The PII scrubber (operators/llmprep.py:pii_scrub_events) removes DIRECT
identifiers; this module measures the risk that remains in QUASI-identifiers
(Sweeney 2002): a row is k-anonymous iff at least k rows share its full
quasi-identifier combination, so an attacker who knows someone's attributes
cannot narrow them below a crowd of k. The audit reports, for a ladder of k
thresholds, how many equivalence classes fall below k and how many rows they
expose — the number a release review actually asks for.

100 TB shape: ONE groupBy on the QI tuple (uniform unless the data is
degenerate), then an O(classes) rollup per threshold crushed by map-side
combine; no joins, no windows, nothing keyed on the row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

# acctbal quantized to $2,500 bands: coarse enough to be a plausible
# released attribute, fine enough that classes are small and the audit has
# something to flag. FLOOR over an exact-cents double (not integer div —
# Spark's `div` truncates toward zero while DuckDB's `//` floors, and
# acctbal goes negative).
_BAND_SQL = ("CAST(FLOOR(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"
             " / 250000.0) AS BIGINT)")

K_LADDER = (2, 5, 10, 20)


def k_anonymity_report(customers: DataFrame,
                       ks: tuple[int, ...] = K_LADDER) -> DataFrame:
    """One row per k threshold: total rows/classes, classes below k, rows
    exposed by them, and the exposed share in 1e-6 fixed point."""
    classes = (
        customers.selectExpr(
            "c_nationkey", "c_mktsegment", f"{_BAND_SQL} AS acct_band"
        )
        .groupBy("c_nationkey", "c_mktsegment", "acct_band")
        .agg(F.count(F.lit(1)).alias("cls"))
    )
    per_k = [
        classes.agg(
            F.lit(k).cast("int").alias("k"),
            F.sum("cls").alias("n_rows"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("cls") < k, 1).otherwise(0))
            .alias("unsafe_classes"),
            F.sum(F.when(F.col("cls") < k, F.col("cls")).otherwise(0))
            .alias("exposed_rows"),
        )
        for k in ks
    ]
    out = per_k[0]
    for df in per_k[1:]:
        out = out.unionByName(df)
    return out.selectExpr(
        "k", "n_rows", "n_classes", "unsafe_classes", "exposed_rows",
        # one double division over exact BIGINTs, floor(x+0.5) tie-free
        "CAST(FLOOR(CAST(exposed_rows AS DOUBLE) / n_rows * 1000000 + 0.5)"
        " AS BIGINT) AS exposed_share_1e6",
    ).orderBy("k")


def _k_anonymity_oracle_sql() -> str:
    per_k = " UNION ALL ".join(
        f"""
        SELECT CAST({k} AS INTEGER) AS k,
               CAST(SUM(cls) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN cls < {k} THEN 1 ELSE 0 END) AS BIGINT)
                 AS unsafe_classes,
               CAST(SUM(CASE WHEN cls < {k} THEN cls ELSE 0 END) AS BIGINT)
                 AS exposed_rows
        FROM classes"""
        for k in K_LADDER
    )
    return f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment, {_BAND_SQL} AS acct_band,
             COUNT(*) AS cls
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT k, n_rows, n_classes, unsafe_classes, exposed_rows,
           CAST(FLOOR(CAST(exposed_rows AS DOUBLE) / n_rows * 1000000 + 0.5)
                AS BIGINT) AS exposed_share_1e6
    FROM ({per_k}) ORDER BY k
    """


@register(
    "k_anonymity_audit",
    oracle=_k_anonymity_oracle_sql(),
    doc="k-anonymity audit of the customer quasi-identifier tuple "
    "(nation, market segment, $2,500 acctbal band): for k in "
    f"{K_LADDER}, the equivalence classes below k and the rows they "
    "expose (Sweeney 2002) — the re-identification readout a release "
    "review runs AFTER direct-PII scrubbing. One uniform QI groupBy + an "
    "O(classes) rollup per threshold; exposed share in tie-free 1e-6 "
    "fixed point.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymity_report(load_table(spark, "customer", sf_dir))


# --------------------------------------------------------------------------
# Laplace-mechanism noisy aggregates — the differential-privacy release
# pipeline beside the k-anonymity audit: per-group COUNT and bounded SUM
# with calibrated Laplace noise, sensitivity accounting, and epsilon
# budget split, engineered the way a DP release job actually runs on a
# cluster (aggregate exactly, clamp contributions, add noise
# POST-AGGREGATION on the tiny group table, never per row).
#
# Noise here is drawn from a DETERMINISTIC hash-derived uniform (md5 of
# the group key + release tag -> u in (0,1) -> Laplace inverse CDF).
# A production release would use a cryptographic RNG; a seeded, replayable
# draw is what makes the MECHANISM testable cross-engine (the oracle
# replays bit-identical noise), and swapping the uniform source is one
# line. Everything else — clamping, sensitivity, budget split, the
# post-processing rounding — is the real thing.
# --------------------------------------------------------------------------

DP_EPSILON = 1.0          # total budget, split evenly across the 2 stats
DP_VALUE_CAP = 10_000.0   # per-order contribution clamp (sum sensitivity)
_DP_TAG = "r13"           # release tag: a new release re-draws noise


def _dp_uniform_sql(key_expr: str, engine: str) -> str:
    """Uniform in (0,1): 8 md5 hex chars -> 32-bit int, scaled; +0.5
    keeps it strictly inside the open interval. The hex->int step is the
    one expression the engines spell differently (Spark conv(), DuckDB
    '0x' cast); everything downstream is shared text."""
    if engine == "spark":
        word = (f"CAST(conv(substr(md5({key_expr} || '{_DP_TAG}'), 1, 8), "
                f"16, 10) AS BIGINT)")
    else:
        word = (f"CAST(('0x' || substr(md5({key_expr} || '{_DP_TAG}'), "
                f"1, 8)) AS BIGINT)")
    return f"(({word} + 0.5e0) / 4294967296.0e0)"


def _dp_laplace_sql(key_expr: str, b: float, engine: str) -> str:
    """Laplace(0, b) via inverse CDF of the hash uniform, rounded to 6
    decimals before use (cross-engine libm doctrine)."""
    u = _dp_uniform_sql(key_expr, engine)
    return (f"ROUND(CASE WHEN {u} < 0.5e0 "
            f"THEN {b}e0 * ln(2.0e0 * {u}) "
            f"ELSE -{b}e0 * ln(2.0e0 * (1.0e0 - {u})) END, 6)")


def dp_noisy_release(orders: DataFrame) -> DataFrame:
    """(o_orderpriority, noisy_count, noisy_sum, epsilon, count_b, sum_b)
    — the DP release table for per-priority order counts and clamped
    revenue sums.

    Sensitivity: one order changes one group's count by 1 and its
    clamped sum by at most DP_VALUE_CAP, so with the budget split
    epsilon/2 per statistic: b_count = 2/epsilon, b_sum =
    2*DP_VALUE_CAP/epsilon. Noise is added to the O(groups) aggregate
    (map-side-combined exact agg, then a scalar expression per group
    row) — the corpus is scanned once and nothing row-level ever leaves
    the aggregation. Post-processing: counts round to integers and
    clamp at 0 (post-processing never spends budget).
    """
    b_count = 2.0 / DP_EPSILON
    b_sum = 2.0 * DP_VALUE_CAP / DP_EPSILON
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.least(F.col("o_totalprice"), F.lit(DP_VALUE_CAP)))
        .alias("s"),
    )
    noise_c = _dp_laplace_sql("o_orderpriority || '|count'", b_count,
                              "spark")
    noise_s = _dp_laplace_sql("o_orderpriority || '|sum'", b_sum, "spark")
    return (
        agg.select(
            "o_orderpriority",
            F.expr(f"GREATEST(CAST(ROUND(n + {noise_c}, 0) AS BIGINT), 0)")
            .alias("noisy_count"),
            F.expr(f"ROUND(s + {noise_s}, 2)").alias("noisy_sum"),
            F.lit(DP_EPSILON).alias("epsilon"),
            F.lit(b_count).alias("count_b"),
            F.lit(b_sum).alias("sum_b"),
        )
        .orderBy("o_orderpriority")
    )


def _dp_oracle_sql() -> str:
    b_count = 2.0 / DP_EPSILON
    b_sum = 2.0 * DP_VALUE_CAP / DP_EPSILON
    noise_c = _dp_laplace_sql("o_orderpriority || '|count'", b_count,
                              "duckdb")
    noise_s = _dp_laplace_sql("o_orderpriority || '|sum'", b_sum, "duckdb")
    return f"""
    WITH agg AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             SUM(LEAST(o_totalprice, {DP_VALUE_CAP})) AS s
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           GREATEST(CAST(ROUND(n + {noise_c}, 0) AS BIGINT), 0)
             AS noisy_count,
           ROUND(s + {noise_s}, 2) AS noisy_sum,
           {DP_EPSILON}e0 AS epsilon,
           {b_count}e0 AS count_b,
           {b_sum}e0 AS sum_b
    FROM agg
    ORDER BY o_orderpriority
    """


@register(
    "dp_noisy_orders_release",
    oracle=_dp_oracle_sql(),
    doc="Laplace-mechanism DP release of per-priority order counts and "
    "clamped revenue sums: exact map-side-combined aggregate, per-order "
    "contribution clamp (sum sensitivity), epsilon split across the two "
    "statistics, noise added POST-aggregation on the O(groups) table "
    "via a deterministic hash-derived uniform (replayable mechanism; "
    "swap in a crypto RNG for a real release), post-processing "
    "round+clamp. The release pipeline beside k_anonymity_audit.",
)
def dp_noisy_orders_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_noisy_release(load_table(spark, "orders", sf_dir))

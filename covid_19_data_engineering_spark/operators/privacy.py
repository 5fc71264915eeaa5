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

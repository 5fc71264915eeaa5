"""Referential-integrity audit across the star schema — the dbt-style
data-contract check a warehouse team schedules after every load. The
reference validates loads by row COUNT only (SURVEY §2 C3 /
`lifecycle.py:count_report`); this closes the gap between "the rows
arrived" and "the rows join".

One row per foreign-key edge: child rows, distinct child keys, orphan
rows (child keys with no parent — LEFT ANTI join), and null keys
(reported separately: a NULL FK never joins but is a different defect
than a dangling one).

Scale shape: each edge is ONE anti-join. Parent key sets are dimension
tables (broadcast under the threshold; the plan degrades gracefully to a
shuffle join for fact-to-fact edges like lineitem->orders where the
parent is also huge). No edge ever scans a table twice: counts ride the
anti-join output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

FK_EDGES = (
    # (child, fk, parent, pk)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_edge_report(child: DataFrame, fk: str, parent: DataFrame, pk: str,
                   edge_name: str) -> DataFrame:
    """One-row orphan report for a single FK edge."""
    keys = child.select(F.col(fk).alias("k"))
    nn = keys.where(F.col("k").isNotNull())
    orphans = nn.join(parent.select(F.col(pk).alias("k")), "k", "left_anti")
    stats = keys.agg(
        F.lit(edge_name).alias("fk_edge"),
        F.count("*").alias("child_rows"),
        F.count("k").alias("non_null_keys"),
        F.countDistinct("k").alias("distinct_keys"),
    )
    return stats.crossJoin(
        F.broadcast(orphans.agg(F.count("*").alias("orphan_rows")))
    ).select(
        "fk_edge", "child_rows", "non_null_keys", "distinct_keys",
        "orphan_rows",
        (F.col("child_rows") - F.col("non_null_keys")).alias("null_keys"),
    )


def integrity_report(tables: dict[str, DataFrame]) -> DataFrame:
    out = None
    for child, fk, parent, pk in FK_EDGES:
        row = fk_edge_report(
            tables[child], fk, tables[parent], pk, f"{child}.{fk}->{parent}.{pk}"
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "referential_integrity_report",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk_edge,
             (SELECT COUNT(*) FROM lineitem) AS child_rows,
             (SELECT COUNT(l_orderkey) FROM lineitem) AS non_null_keys,
             (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS distinct_keys,
             (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows,
             (SELECT COUNT(*) - COUNT(l_orderkey) FROM lineitem) AS null_keys
      UNION ALL
      SELECT 'lineitem.l_partkey->part.p_partkey',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(l_partkey) FROM lineitem),
             (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             (SELECT COUNT(*) - COUNT(l_partkey) FROM lineitem)
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(l_suppkey) FROM lineitem),
             (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey)),
             (SELECT COUNT(*) - COUNT(l_suppkey) FROM lineitem)
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(o_custkey) FROM orders),
             (SELECT COUNT(DISTINCT o_custkey) FROM orders),
             (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT COUNT(*) - COUNT(o_custkey) FROM orders)
      UNION ALL
      SELECT 'customer.c_nationkey->nation.n_nationkey',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(c_nationkey) FROM customer),
             (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
             (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey)),
             (SELECT COUNT(*) - COUNT(c_nationkey) FROM customer)
      UNION ALL
      SELECT 'supplier.s_nationkey->nation.n_nationkey',
             (SELECT COUNT(*) FROM supplier),
             (SELECT COUNT(s_nationkey) FROM supplier),
             (SELECT COUNT(DISTINCT s_nationkey) FROM supplier),
             (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = s.s_nationkey)),
             (SELECT COUNT(*) - COUNT(s_nationkey) FROM supplier)
      UNION ALL
      SELECT 'nation.n_regionkey->region.r_regionkey',
             (SELECT COUNT(*) FROM nation),
             (SELECT COUNT(n_regionkey) FROM nation),
             (SELECT COUNT(DISTINCT n_regionkey) FROM nation),
             (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM region r
                                WHERE r.r_regionkey = n.n_regionkey)),
             (SELECT COUNT(*) - COUNT(n_regionkey) FROM nation)
    ) ORDER BY fk_edge
    """,
    doc="Referential-integrity audit over all 7 FK edges of the star "
    "schema: orphan rows via LEFT ANTI join, null keys reported "
    "separately — the data-contract check the reference's count-only "
    "validation (SURVEY C3) cannot express.",
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        name: load_table(spark, name, sf_dir)
        for name in ("lineitem", "orders", "part", "supplier", "customer",
                     "nation", "region")
    }
    return integrity_report(tables).orderBy("fk_edge")


# --------------------------------------------------------------------------
# Functional-dependency audit: does column A still determine column B?
# The data-contract companion to the FK edges above — schema docs say
# "status is derived from priority" until one bad load breaks it; this
# measures each claimed dependency instead of trusting it.
# --------------------------------------------------------------------------

FD_CANDIDATES = (
    # (determinant, dependent) over orders
    ("o_orderkey", "o_custkey"),       # key: must hold
    ("o_custkey", "o_orderstatus"),    # a customer's orders vary: violated
    ("o_orderdate", "o_orderpriority"),
    ("o_orderstatus", "o_orderpriority"),
)


def fd_profile(df: DataFrame,
               pairs: tuple[tuple[str, str], ...]) -> DataFrame:
    """Exact violation counts for each claimed functional dependency
    A -> B: a determinant value violates when it maps to more than one
    dependent value — (determinant, dependent, n_keys, violating_keys,
    holds, violation_rate).

    100 TB shape: each candidate is ONE map-side-combined groupBy on its
    determinant (count + exact distinct of the dependent per key), then an
    O(distinct keys) -> O(1) reduction; candidates union into one plan and
    run as independent stages. No candidate ever joins or sorts the table.
    """
    parts = []
    for det, dep in pairs:
        per_key = df.groupBy(det).agg(
            F.countDistinct(dep).alias("n_dep"))
        parts.append(
            per_key.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
                .alias("violating_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "determinant", "dependent", "n_keys", "violating_keys",
        F.expr("CASE WHEN violating_keys = 0 THEN 1 ELSE 0 END")
        .alias("holds"),
        F.round(F.expr("CAST(violating_keys AS DOUBLE) / n_keys"), 6)
        .alias("violation_rate"),
    ).orderBy("determinant", "dependent")


def _fd_oracle_sql() -> str:
    parts = []
    for det, dep in FD_CANDIDATES:
        parts.append(f"""
      SELECT '{det}' AS determinant, '{dep}' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_keys
      FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS n_dep
            FROM orders GROUP BY {det})""")
    union = "\n      UNION ALL\n".join(parts)
    return f"""
    WITH per AS ({union}
    )
    SELECT determinant, dependent, n_keys, violating_keys,
           CASE WHEN violating_keys = 0 THEN 1 ELSE 0 END AS holds,
           ROUND(CAST(violating_keys AS DOUBLE) / n_keys, 6)
             AS violation_rate
    FROM per
    ORDER BY determinant, dependent
    """


@register(
    "functional_dependency_profile",
    oracle=_fd_oracle_sql(),
    doc="Functional-dependency audit over orders: exact violation counts "
    "for each claimed A -> B dependency (a determinant value violates "
    "when it maps to >1 dependent value) — the data-contract check that "
    "catches 'status is derived from priority' silently breaking. Each "
    "candidate is one map-side-combined groupBy on its determinant; "
    "candidates union into one plan as independent stages; no joins, no "
    "sorts, no second scan per candidate.",
)
def functional_dependency_profile(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    return fd_profile(load_table(spark, "orders", sf_dir), FD_CANDIDATES)


# --------------------------------------------------------------------------
# Declarative data-contract report — the Great-Expectations-style gate a
# warehouse runs before promoting a load (and the natural grown-up form
# of the reference's COUNT(*) validation step): a fixed rule table, one
# row per rule with its measured metric, threshold, and verdict. All
# column rules evaluate in ONE conditional-aggregate pass over the fact
# (map-side combined); the referential rule adds one broadcast anti-join
# count. At 100 TB this is exactly the shape you want: the contract
# costs one scan regardless of how many rules it carries.
# --------------------------------------------------------------------------

CONTRACT_STATUSES = ("F", "O", "P")
CONTRACT_PRICE_MAX = 1_000_000.0
CONTRACT_MIN_ROWS = 100
CONTRACT_FRESH_YEAR = 2001


def data_contract_report(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(rule, metric, threshold, passed) — seven contract rules.

    metric semantics per rule: violation FRACTION for not-null /
    accepted-values / range / referential (threshold 0.0), duplicate
    COUNT for uniqueness (threshold 0.0), max order year for freshness
    (threshold = CONTRACT_FRESH_YEAR, passed when >=), row count for
    volume (threshold = CONTRACT_MIN_ROWS, passed when >=)."""
    status_list = ", ".join(f"'{s}'" for s in CONTRACT_STATUSES)
    agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.countDistinct("o_orderkey").alias("dist_keys"),
        F.sum((~F.col("o_orderstatus").isin(*CONTRACT_STATUSES))
              .cast("long")).alias("bad_status"),
        F.sum(((F.col("o_totalprice") <= 0)
               | (F.col("o_totalprice") > CONTRACT_PRICE_MAX))
              .cast("long")).alias("bad_price"),
        F.max(F.year("o_orderdate")).alias("max_year"),
    )
    orphans = (
        orders.join(customer,
                    orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphan"))
    )
    row = agg.crossJoin(F.broadcast(orphans))
    frac = lambda c: F.round(F.col(c).cast("double") / F.col("n"), 6)  # noqa: E731
    report = row.select(F.explode(F.array(
        F.struct(F.lit("not_null:o_custkey").alias("rule"),
                 frac("null_cust").alias("metric"),
                 F.lit(0.0).alias("threshold"),
                 (F.col("null_cust") == 0).alias("passed")),
        F.struct(F.lit("unique:o_orderkey").alias("rule"),
                 (F.col("n") - F.col("dist_keys")).cast("double")
                 .alias("metric"),
                 F.lit(0.0).alias("threshold"),
                 (F.col("n") == F.col("dist_keys")).alias("passed")),
        F.struct(F.lit(f"accepted_values:o_orderstatus[{status_list}]")
                 .alias("rule"),
                 frac("bad_status").alias("metric"),
                 F.lit(0.0).alias("threshold"),
                 (F.col("bad_status") == 0).alias("passed")),
        F.struct(F.lit("range:o_totalprice(0,1e6]").alias("rule"),
                 frac("bad_price").alias("metric"),
                 F.lit(0.0).alias("threshold"),
                 (F.col("bad_price") == 0).alias("passed")),
        F.struct(F.lit("referential:o_custkey->customer").alias("rule"),
                 frac("n_orphan").alias("metric"),
                 F.lit(0.0).alias("threshold"),
                 (F.col("n_orphan") == 0).alias("passed")),
        F.struct(F.lit("freshness:max_order_year").alias("rule"),
                 F.col("max_year").cast("double").alias("metric"),
                 F.lit(float(CONTRACT_FRESH_YEAR)).alias("threshold"),
                 (F.col("max_year") >= CONTRACT_FRESH_YEAR).alias("passed")),
        F.struct(F.lit("volume:min_rows").alias("rule"),
                 F.col("n").cast("double").alias("metric"),
                 F.lit(float(CONTRACT_MIN_ROWS)).alias("threshold"),
                 (F.col("n") >= CONTRACT_MIN_ROWS).alias("passed")),
    )).alias("r")).select("r.rule", "r.metric", "r.threshold", "r.passed")
    return report.orderBy("rule")


@register(
    "data_contract_report",
    oracle=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
             COUNT(DISTINCT o_orderkey) AS dist_keys,
             SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                      THEN 1 ELSE 0 END) AS bad_status,
             SUM(CASE WHEN o_totalprice <= 0
                       OR o_totalprice > {CONTRACT_PRICE_MAX}
                      THEN 1 ELSE 0 END) AS bad_price,
             MAX(year(o_orderdate)) AS max_year
      FROM orders
    ),
    orph AS (
      SELECT COUNT(*) AS n_orphan FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ),
    row_all AS (SELECT * FROM agg CROSS JOIN orph)
    SELECT rule, metric, threshold, passed FROM (
      SELECT 'not_null:o_custkey' AS rule,
             ROUND(CAST(null_cust AS DOUBLE) / n, 6) AS metric,
             0.0e0 AS threshold, null_cust = 0 AS passed FROM row_all
      UNION ALL
      SELECT 'unique:o_orderkey',
             CAST(n - dist_keys AS DOUBLE), 0.0e0, n = dist_keys
      FROM row_all
      UNION ALL
      SELECT 'accepted_values:o_orderstatus[''F'', ''O'', ''P'']',
             ROUND(CAST(bad_status AS DOUBLE) / n, 6), 0.0e0, bad_status = 0
      FROM row_all
      UNION ALL
      SELECT 'range:o_totalprice(0,1e6]',
             ROUND(CAST(bad_price AS DOUBLE) / n, 6), 0.0e0, bad_price = 0
      FROM row_all
      UNION ALL
      SELECT 'referential:o_custkey->customer',
             ROUND(CAST(n_orphan AS DOUBLE) / n, 6), 0.0e0, n_orphan = 0
      FROM row_all
      UNION ALL
      SELECT 'freshness:max_order_year',
             CAST(max_year AS DOUBLE), {float(CONTRACT_FRESH_YEAR)}e0,
             max_year >= {CONTRACT_FRESH_YEAR}
      FROM row_all
      UNION ALL
      SELECT 'volume:min_rows',
             CAST(n AS DOUBLE), {float(CONTRACT_MIN_ROWS)}e0,
             n >= {CONTRACT_MIN_ROWS}
      FROM row_all
    )
    ORDER BY rule
    """,
    doc="Declarative data-contract gate (Great-Expectations shape): seven "
    "rules — not-null, uniqueness, accepted values, numeric range, "
    "referential integrity, freshness, minimum volume — each a (rule, "
    "metric, threshold, passed) row. All column rules ride ONE "
    "conditional-aggregate scan; the referential rule adds one "
    "broadcast anti-join count. The grown-up form of the reference's "
    "COUNT(*) load validation.",
)
def data_contract_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return data_contract_report(load_table(spark, "orders", sf_dir),
                                load_table(spark, "customer", sf_dir))

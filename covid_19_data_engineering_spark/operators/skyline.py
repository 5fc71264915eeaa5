"""Pareto-frontier (skyline) operator: the set of rows not dominated on a
(minimize, maximize) criteria pair — e.g. "parts where no other part is both
cheaper and larger". The classic catalog/pruning query that is O(n^2) when
written as NOT EXISTS, made distributable here with the staircase
decomposition:

1. collapse to one row per minimize-value (groupBy price -> max size): the
   only corpus-wide shuffle, keyed on the minimize column;
2. a running-max window over the collapsed table (<= distinct prices rows —
   bounded by the value domain, NOT corpus size; 2-decimal prices bound it
   at ~price_range*100 rows no matter how many parts exist);
3. a price-group survives iff its max size strictly exceeds every cheaper
   group's — the frontier is exactly the strictly-increasing staircase;
4. broadcast the tiny frontier back onto the corpus to emit all tied
   frontier points, map-only.

Dominance semantics: row r is dominated iff some row q has q.min <= r.min
and q.max >= r.max with at least one strict; duplicate (min,max) points do
not dominate each other, so ties all survive. The staircase decomposition
implements exactly this (a same-price smaller-size row loses to its group
max; an equal-size cheaper group makes `psize > prev` false).

No reference analogue (the reference delegates all query logic to its
warehouses, tdiprima/covid-19-data-engineering has no skyline op);
SURVEY §2 C-extensions / analytics battery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def pareto_frontier(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """All rows of ``df`` on the Pareto frontier of (``minimize`` asc,
    ``maximize`` desc). Returns ``df``'s columns unchanged; ties on the
    frontier all survive."""
    grp = df.groupBy(F.col(minimize).alias("_mn")).agg(
        F.max(maximize).alias("_mx"))
    w = Window.orderBy("_mn").rowsBetween(Window.unboundedPreceding, -1)
    front = (
        grp.withColumn("_prev", F.max("_mx").over(w))
        .where(F.col("_prev").isNull() | (F.col("_mx") > F.col("_prev")))
        .select("_mn", "_mx")
    )
    return (
        df.join(F.broadcast(front),
                (F.col(minimize) == F.col("_mn"))
                & (F.col(maximize) == F.col("_mx")))
        .drop("_mn", "_mx")
    )


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH grp AS (
      SELECT p_retailprice AS mn, MAX(p_size) AS mx
      FROM part GROUP BY p_retailprice
    ),
    front AS (
      SELECT mn, mx,
             MAX(mx) OVER (ORDER BY mn
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev
      FROM grp
    )
    SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
    FROM part p
    JOIN front f ON p.p_retailprice = f.mn AND p.p_size = f.mx
    WHERE f.prev IS NULL OR f.mx > f.prev
    ORDER BY p.p_retailprice, p.p_partkey
    """,
    doc="Pareto frontier of parts on (retailprice minimized, size "
    "maximized): every part no other part beats on both axes. Skyline via "
    "the staircase decomposition — one groupBy on price, a running-max "
    "window over the <= distinct-prices collapsed table (bounded by the "
    "value domain, not corpus size), then a broadcast join back for tied "
    "points. The NOT-EXISTS formulation this replaces is an O(n^2) "
    "self-join; this shape is one shuffle + map-only emit at any scale.",
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return (
        pareto_frontier(part, "p_retailprice", "p_size")
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )

"""Round-11 operator pins: planted-semantics tests for the families added
this round (label-propagation communities, bucketed co-located join values,
and the audit/forecast operators that follow them in-round)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_label_propagation_splits_planted_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge: connected components would
    merge everything into one blob; LPA must recover the two density
    communities exactly, and the modularity readout must match hand
    arithmetic (m = 13 edges; per-community Q term = 6/13 - (13/26)^2 =
    0.211538 in 1e-6 fixed point)."""
    from covid_19_data_engineering_spark.operators.graphs import (
        community_modularity,
        label_communities,
    )

    clique_a = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    clique_b = [(a, b) for a in (11, 12, 13, 14) for b in (11, 12, 13, 14) if a < b]
    pairs = clique_a + clique_b + [(4, 11)]  # one bridge
    sym = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )

    labels = {r["node"]: r["lbl"] for r in label_communities(sym).collect()}
    assert {labels[n] for n in (1, 2, 3, 4)} == {1}
    assert {labels[n] for n in (11, 12, 13, 14)} == {11}

    out = {r["community"]: r for r in
           community_modularity(sym, label_communities(sym)).collect()}
    assert set(out) == {1, 11}
    for c in (1, 11):
        assert out[c]["size"] == 4
        assert out[c]["internal_edges"] == 6
        assert out[c]["degree_sum"] == 13
        assert out[c]["q_term_1e6"] == 211538
    # positive total modularity: the partition beats the random baseline
    assert sum(r["q_term_1e6"] for r in out.values()) > 0


def test_bucketed_join_values_equal_plain_join(spark):
    """Bucketing is layout, not semantics: the bucketed fact x fact rollup
    must return byte-identical values to the plain-parquet twin."""
    from covid_19_data_engineering_spark.operators.layout import (
        bucketed_priority_revenue,
    )
    from covid_19_data_engineering_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    bucketed = {tuple(r) for r in
                bucketed_priority_revenue(spark, SF_SMOKE).collect()}
    o = load_table(spark, "orders", SF_SMOKE)
    li = load_table(spark, "lineitem", SF_SMOKE)
    twin = {
        tuple(r)
        for r in (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(
                    F.expr(
                        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100"
                        " + 0.5) AS BIGINT)"
                    )
                ).alias("revenue_cents"),
            )
        ).collect()
    }
    assert bucketed == twin

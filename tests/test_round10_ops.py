"""Planted-case pins for the round-10 operator families: each operator
runs on a constructed input whose answer is known analytically, so the
semantics are pinned independently of the DuckDB oracle (which proves
cross-engine agreement, not correctness of intent)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _lineitem(spark, rows, cols="l_partkey long, l_extendedprice double, "
                              "l_discount double, l_returnflag string"):
    return spark.createDataFrame(rows, cols)


def test_welch_ttest_zero_variance_arm(spark):
    """One arm constant: vb = 0, so t = (ma-mb)/sqrt(va/na) and the
    Welch-Satterthwaite df collapses to na-1 — checked against the
    hand-computed values."""
    from covid_19_data_engineering_spark.operators.abtest import (
        welch_ttest_price,
    )

    rows = ([(1, 10.0, 0.0, "R"), (2, 20.0, 0.0, "R"), (3, 30.0, 0.0, "R")]
            + [(4, 10.0, 0.0, "N")] * 3
            + [(9, 99.0, 0.0, "A")])  # other flags must be excluded
    out = welch_ttest_price(_lineitem(spark, rows)).collect()[0]
    assert (out["n_a"], out["n_b"]) == (3, 3)
    assert out["mean_a"] == 20.0 and out["mean_b"] == 10.0
    # va = 100 (dollars^2 -> 1e6 cents^2), t = 10 / sqrt(100/3) dollars
    assert out["t_stat"] == round(10.0 / (100.0 / 3.0) ** 0.5, 4)
    assert out["df"] == 2.0
    assert out["significant"] is False  # t ~ 1.73 < 1.96


def test_xcorr_planted_lead_lag(spark):
    """Purchases exactly mirror clicks two days later: r = 1.0 at lag 2,
    and lag 0 overlaps on proportional counts too — the pin is that the
    lag-2 correlation is exactly 1 over the 4 aligned days."""
    from covid_19_data_engineering_spark.operators.drift import daily_xcorr

    rows = []
    eid = 0
    for day, n in enumerate([1, 2, 3, 4]):
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, "click", f"2024-01-0{day + 1} 12:00:00", 1.0))
    for day, n in zip([2, 3, 4, 5], [1, 2, 3, 4]):
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, "purchase",
                         f"2024-01-0{day + 1} 12:00:00", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["lag"]: (r["n_days"], r["r"])
           for r in daily_xcorr(ev, max_lag=3).collect()}
    assert out[2] == (4, 1.0)
    assert out[0][0] == 2  # days 3,4 overlap at lag 0


def test_theil_sen_ignores_the_outlier_day(spark):
    """Daily revenue follows y = 100x + b exactly except one wild outlier
    day; the median pairwise slope must still be exactly 100 cents/day
    (the 29% breakdown point), where OLS would be dragged far off."""
    from covid_19_data_engineering_spark.operators.regression import (
        theil_sen_daily,
    )

    rows = []
    for i in range(9):  # days 1..9 of 1995
        price = 10_000.0 if i == 4 else (100.0 * (i + 1) + 5.0)
        rows.append((i, price, f"1995-03-{i + 1:02d}"))
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out = theil_sen_daily(o).collect()[0]
    assert out["n_days"] == 9 and out["n_pairs"] == 36
    # slope in cents/day: 100 dollars... prices step 100 dollars/day ->
    # 10000 cents/day for all non-outlier pairs (28 of 36 >= majority)
    assert out["sen_slope"] == 10000.0


def test_abc_classification_planted_shares(spark):
    """Revenues 80/15/5: the top part closes exactly 80% (class A), the
    next exactly 95% (B), the tail is C — pinning the <= boundary
    semantics of both thresholds as integer comparisons."""
    from covid_19_data_engineering_spark.operators.distrank import (
        abc_classification,
    )

    rows = [(1, 80.0, 0.0, "N"), (2, 15.0, 0.0, "N"), (3, 5.0, 0.0, "N")]
    out = {r["abc_class"]: (r["n_parts"], r["revenue"], r["revenue_share"])
           for r in abc_classification(_lineitem(spark, rows)).collect()}
    assert out == {"A": (1, 80.0, 0.8), "B": (1, 15.0, 0.15),
                   "C": (1, 5.0, 0.05)}


def test_jaccard_neighbors_planted_twins_and_hub_cap(spark):
    """Parts 1 and 2 share their entire neighborhoods {3,4,5} -> Jaccard
    exactly 1.0 at the top; a planted hub exceeding the degree cap must
    vanish from the graph entirely (it would otherwise flood the pair
    space and depress every union term)."""
    from covid_19_data_engineering_spark.operators.graphs import (
        JAC_MAX_DEG,
        jaccard_neighbors,
        support_pairs,
    )

    rows = []
    ok = 0
    # each co-purchase edge needs support >= 2 -> two orders per edge
    for a, b in [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)]:
        for _ in range(2):
            ok += 1
            rows += [(ok, a), (ok, b)]
    hub = 1000
    for nb in range(1, JAC_MAX_DEG + 2):  # hub degree = cap + 1
        for _ in range(2):
            ok += 1
            rows += [(ok, hub), (ok, 2000 + nb)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = jaccard_neighbors(support_pairs(li)).collect()
    top = out[0]
    assert (top["part_a"], top["part_b"], top["jaccard"]) == (1, 2, 1.0)
    assert top["common"] == 3 and top["deg_a"] == 3 and top["deg_b"] == 3
    parts = {r["part_a"] for r in out} | {r["part_b"] for r in out}
    assert hub not in parts  # capped out of the graph


def test_textrank_planted_central_token(spark):
    """A token adjacent to every other token (the window-2 hub of every
    document) must take the top TextRank slot — the centrality the
    random-walk score exists to measure."""
    from covid_19_data_engineering_spark.operators.textrank import (
        textrank,
        token_adjacency,
    )

    docs = [(i, " ".join(
        f"hub w{j}" for j in range(6))) for i in range(4)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank(token_adjacency(d)).collect()
    assert out[0]["token"] == "hub"
    assert out[0]["rank_units"] > out[1]["rank_units"]

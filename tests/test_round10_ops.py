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


def test_twap_weights_by_holding_time(spark):
    """Two observations on one day: 10.0 held one hour, then 20.0 held
    the remaining 23 -> TWAP = (10*1 + 20*23)/24, while a plain AVG
    would say 15. The last observation must hold until midnight."""
    from covid_19_data_engineering_spark.operators.temporal import (
        twap_daily,
    )

    ev = spark.createDataFrame(
        [(1, 1, "view", "2024-01-01 00:00:00", 10.0),
         (2, 1, "view", "2024-01-01 01:00:00", 20.0),
         (3, 1, "click", "2024-01-01 02:00:00", 99.0)],
        "event_id long, user_id long, event_type string, ts string, "
        "value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = twap_daily(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_obs"] == 2 and r["held_seconds"] == 86400
    assert r["twap"] == round((10 * 1 + 20 * 23) / 24, 6)


def test_bfs_depths_planted_star_chain(spark):
    """Star 1-{2,3,4} plus tail 4-5: seed is the max-degree node (1),
    depths read 1/3/1/0/0 — and the never-reached depths report zero,
    not a missing row."""
    from covid_19_data_engineering_spark.operators.graphs import bfs_depths

    und = [(1, 2), (1, 3), (1, 4), (4, 5)]
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = {r["depth"]: r["n_nodes"] for r in bfs_depths(edges).collect()}
    assert out == {0: 1, 1: 3, 2: 1, 3: 0, 4: 0}


def test_nb_separable_corpus_classifies_diagonally(spark):
    """Two languages with disjoint vocabularies: the confusion census
    must be exactly diagonal (add-1 smoothing cannot flip a doc whose
    every token is unseen in the other class)."""
    from covid_19_data_engineering_spark.operators.nbayes import (
        nb_confusion,
    )

    docs = ([(i, "xx yy xx", "aa", "s", 8) for i in range(4)]
            + [(10 + i, "pp qq pp", "bb", "s", 8) for i in range(3)])
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {(r["label"], r["predicted"]): r["n_docs"]
           for r in nb_confusion(d).collect()}
    assert out == {("aa", "aa"): 4, ("bb", "bb"): 3}


def test_holt_constant_series_forecasts_the_constant(spark):
    """A flat daily series is a fixed point of the Holt recurrence
    (level stays, trend stays 0), so every horizon forecasts the
    constant exactly."""
    from covid_19_data_engineering_spark.operators.regression import (
        holt_forecast_daily,
    )

    rows = [(i, 123.45, f"1995-02-{i + 1:02d}") for i in range(10)]
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out = holt_forecast_daily(o).collect()
    assert [r["h"] for r in out] == list(range(1, 8))
    assert all(r["n_days"] == 10 and r["forecast"] == 123.45 for r in out)


def test_adamic_adar_weights_rare_neighbors(spark):
    """Twins sharing three degree-2 neighbors score exactly
    3 * fx(1/ln 2) — and a shared POPULAR neighbor is worth less than a
    rare one by construction of the weight."""
    import math

    from covid_19_data_engineering_spark.operators.graphs import (
        adamic_adar_neighbors,
        support_pairs,
    )

    rows = []
    ok = 0
    for a, b in [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)]:
        for _ in range(2):  # support >= 2
            ok += 1
            rows += [(ok, a), (ok, b)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = adamic_adar_neighbors(support_pairs(li)).collect()
    top = out[0]
    w_fx = math.floor(1.0 / math.log(2.0) * 1e9 + 0.5)
    assert (top["part_a"], top["part_b"], top["common"]) == (1, 2, 3)
    assert top["aa_score"] == round(3 * w_fx / 1e9, 6)


def test_trigram_lm_certain_corpus_scores_zero(spark):
    """A corpus whose every trigram is fully determined by its context
    (one repeated token) has p3 = p2 = p1 = 1 -> nll exactly 0."""
    from covid_19_data_engineering_spark.operators.llmprep import (
        lm_trigram_scores,
    )

    docs = [(i, "a a a a a", "en", "s", 9) for i in range(3)]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = lm_trigram_scores(d).collect()
    assert all(r["n_trigrams"] == 3 and r["avg_nll"] == 0.0 for r in out)
    assert len(out) == 3


def test_winsorized_mean_clips_at_exact_fences(spark):
    """n=5 with one wild tail value: p05 is the min (rank 1), p95 is
    rank 4, so the 100 clips to 10 -> winsorized 8.0 vs raw 26.0."""
    from covid_19_data_engineering_spark.operators.quantiles import (
        winsorized_mean,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in (0, 10, 10, 10, 100)], "v double")
    out = winsorized_mean(df, "v").collect()[0]
    assert out["n_rows"] == 5
    assert (out["p_lo"], out["p_hi"]) == (0.0, 10.0)
    assert out["raw_mean"] == 26.0
    assert out["winsorized_mean"] == 8.0


def test_diag_outliers_surface_the_planted_vector(spark):
    """One vector displaced far along one dimension must take the top
    Mahalanobis slot; the inliers' scores stay near the dimension
    count (the expectation of a sum of squared z-scores)."""
    from covid_19_data_engineering_spark.operators.similarity import (
        embedding_diag_outliers,
    )

    rows = [(1, [0.1, 0.2]), (2, [-0.1, 0.1]), (3, [0.0, -0.2]),
            (4, [0.05, 0.0]), (5, [10.0, 0.1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_diag_outliers(emb, top=5).collect()
    assert out[0]["vec_id"] == 5
    # the outlier inflates the variance it is standardized by, so its
    # z^2 is bounded near (n-1)^2/n at small n — assert the ordering
    # and a real gap, not an unbounded ratio
    assert out[0]["score"] > out[1]["score"]
    assert out[0]["score"] > 3.0


def test_entropy_rate_deterministic_chain_is_zero(spark):
    """A strictly alternating a->b->a->b chain has p=1 transitions:
    entropy rate exactly 0 nats/step, against a ln(2) uniform ceiling."""
    from covid_19_data_engineering_spark.operators.graphs import (
        entropy_rate,
    )

    rows = [(i, 1, "a" if i % 2 == 0 else "b",
             f"2024-01-01 00:{i:02d}:00", 1.0) for i in range(20)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = entropy_rate(ev).collect()[0]
    assert out["n_states"] == 2 and out["n_transitions"] == 19
    assert out["entropy_rate"] == 0.0
    import math
    assert out["uniform_bound"] == round(math.log(2.0), 6)


def test_densest_subgraph_peel_finds_the_clique(spark):
    """K4 plus a pendant path: the peel strips the low-degree tail and
    the clique round (density 6/4 = 1.5) is flagged best."""
    from covid_19_data_engineering_spark.operators.graphs import (
        densest_subgraph_trajectory,
    )

    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
           (1, 5), (5, 6)]                                  # pendant tail
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = {r["round"]: (r["n_nodes"], r["n_edges"], r["density"],
                        r["is_best"]) for r in
           densest_subgraph_trajectory(edges).collect()}
    assert out[0][:2] == (6, 8)
    assert out[1] == (4, 6, 1.5, True)          # the clique, flagged
    assert sum(1 for v in out.values() if v[3]) == 1  # exactly one best


def test_interpurchase_gaps_planted_buckets(spark):
    """One customer with orders at day 0, 5, 40: gaps 5 (0-7d bucket)
    and 35 (31-90d), shares 0.5 each, means exact."""
    from covid_19_data_engineering_spark.operators.cohort import (
        interpurchase_gaps,
    )

    o = spark.createDataFrame(
        [(1, 7, "2024-01-01"), (2, 7, "2024-01-06"), (3, 7, "2024-02-10")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out = {r["bucket"]: (r["n_gaps"], r["share"], r["mean_gap_days"])
           for r in interpurchase_gaps(o).collect()}
    assert out == {"0-7d": (1, 0.5, 5.0), "31-90d": (1, 0.5, 35.0)}


def test_burstiness_periodic_reads_minus_one(spark):
    """A perfectly periodic per-user stream has sigma = 0 ->
    B = (0 - mu)/(0 + mu) = -1 exactly; a two-gap bursty plant
    (1s and 59s) reads the hand-computed positive value."""
    from covid_19_data_engineering_spark.operators.drift import (
        burstiness_by_type,
    )

    rows = [(i, 1, "tick", f"2024-01-01 00:{i:02d}:00", 1.0)
            for i in range(10)]
    rows += [(100, 2, "spike", "2024-01-01 00:00:00", 1.0),
             (101, 2, "spike", "2024-01-01 00:00:01", 1.0),
             (102, 2, "spike", "2024-01-01 00:01:00", 1.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_type"]: (r["n_gaps"], r["mean_gap_s"], r["burstiness"])
           for r in burstiness_by_type(ev).collect()}
    assert out["tick"] == (9, 60.0, -1.0)
    mu, = [30.0]
    sigma = 29.0  # population sd of {1, 59} seconds
    assert out["spike"] == (2, 30.0, round((sigma - mu) / (sigma + mu), 6))


def test_anova_separated_and_identical_groups(spark):
    """Two groups with zero within-group variance: eta^2 = 1.0 and F is
    NULL (0/0 denominator pinned by NULLIF). Identical group means:
    eta^2 = 0 and F = 0."""
    from covid_19_data_engineering_spark.operators.abtest import (
        value_anova_by_type,
    )

    def ev(rows):
        return spark.createDataFrame(
            [(i, 1, t, "2024-01-01 00:00:00", v)
             for i, (t, v) in enumerate(rows)],
            "event_id long, user_id long, event_type string, ts string, "
            "value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    sep = value_anova_by_type(
        ev([("a", 10.0), ("a", 10.0), ("b", 20.0), ("b", 20.0)])
    ).collect()[0]
    assert sep["eta_sq"] == 1.0 and sep["f_stat"] is None

    same = value_anova_by_type(
        ev([("a", 10.0), ("a", 20.0), ("b", 10.0), ("b", 20.0)])
    ).collect()[0]
    assert same["eta_sq"] == 0.0 and same["f_stat"] == 0.0


def test_hill_tail_planted_exponential_spacings(spark):
    """k=2 over revenues (100*e^2, 100*e, 100) dollars: the ln-ratio
    terms are ~2 and ~1, so alpha ~ 2/3 — computed expected through the
    SAME fixed-point pipeline so the pin is exact."""
    import math

    from covid_19_data_engineering_spark.operators.distrank import (
        hill_tail_index,
    )

    vals = [100.0 * math.e ** 2, 100.0 * math.e, 100.0]
    o = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "o_custkey long, o_totalprice double")
    out = hill_tail_index(
        o, "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)",
        "o_custkey", k=2).collect()[0]
    cents = [math.floor(v * 100 + 0.5) for v in vals]
    t = sum(math.floor(math.log(c / cents[-1]) * 1e9 + 0.5)
            for c in cents[:2])
    want_alpha = round(2 / (t / 1e9), 4)
    assert out["k"] == 2 and out["x_min"] == 100.0
    assert out["alpha"] == want_alpha
    assert out["alpha_se"] == round(want_alpha / math.sqrt(2.0), 4)

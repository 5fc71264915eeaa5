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


def test_k_anonymity_planted_classes(spark):
    """Hand-sized QI table: class A x3, class B x1, class C x2 -> at k=2
    exactly class B is unsafe (1 exposed row); at k=5 every class is
    unsafe (6 exposed rows). Bands chosen away from the $2,500 edges."""
    from covid_19_data_engineering_spark.operators.privacy import (
        k_anonymity_report,
    )

    rows = (
        [(0, "BUILDING", 100.0)] * 3      # class A
        + [(1, "MACHINERY", 100.0)]       # class B
        + [(0, "BUILDING", 3000.0)] * 2   # class C (band 1, not 0)
    )
    df = spark.createDataFrame(
        rows, "c_nationkey int, c_mktsegment string, c_acctbal double"
    )
    out = {r["k"]: r for r in k_anonymity_report(df, ks=(2, 5)).collect()}
    assert out[2]["n_rows"] == 6 and out[2]["n_classes"] == 3
    assert out[2]["unsafe_classes"] == 1 and out[2]["exposed_rows"] == 1
    assert out[2]["exposed_share_1e6"] == 166667
    assert out[5]["unsafe_classes"] == 3 and out[5]["exposed_rows"] == 6
    assert out[5]["exposed_share_1e6"] == 1000000


def test_holt_winters_exact_on_planted_periodic_series(spark):
    """A strictly weekly-periodic series is a fixed point of the HW
    recurrence: after init, y_t - s[head] == level every step, so level
    stays put, trend stays 0, and the h-step forecast reproduces the next
    week's pattern EXACTLY (no tolerance)."""
    import datetime

    from covid_19_data_engineering_spark.operators.regression import (
        holt_winters_weekly,
    )

    pattern = [100.0, 220.0, 150.0, 90.0, 310.0, 260.0, 130.0]
    rows = []
    start = datetime.date(1995, 3, 6)
    for t in range(21):  # three full weeks
        rows.append(
            (start + datetime.timedelta(days=t), pattern[t % 7])
        )
    orders = spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    )
    out = holt_winters_weekly(orders)
    got = {r["h"]: r["forecast"] for r in out.collect()}
    assert all(r["n_days"] == 21 for r in out.collect())
    for h in range(1, 8):
        assert got[h] == pattern[(h - 1) % 7], (h, got[h])


def test_conformal_intervals_cover_on_exchangeable_data(spark):
    """On the real (exchangeable-split) events corpus the conformal
    guarantee must hold up to finite-sample noise: measured coverage
    >= ~87% for a 90% target, and never vacuous (q > 0, both halves
    populated)."""
    from covid_19_data_engineering_spark.operators.conformal import (
        conformal_value_intervals_query,
    )

    # sf0.01: ~1000 test rows per type, binomial std ~1% — the 87% floor
    # is a >3-sigma margin there (at the smoke SF n_test ~ 90 and the
    # same floor is within one sigma of noise, so it would flake)
    rows = conformal_value_intervals_query(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r["n_cal"] >= 20 and r["n_test"] >= 20
        assert r["q_cents"] > 0
        assert r["coverage_1e6"] >= 870000, tuple(r)


def test_streamed_sessionization_boundary_semantics(spark, tmp_path):
    """Native session_window chains sessions while intervals TOUCH: a
    pause of exactly the 300s gap still MERGES (measured against the real
    operator — the naive interval-overlap reading predicts a split), and
    a longer pause splits. The planted corpus pins the boundary the
    streamed oracle's lag+cumsum twin (strict > 300) depends on."""
    import datetime

    from covid_19_data_engineering_spark.streaming.events import (
        events_sessionization_streamed,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, seconds):
        return (eid, t0 + datetime.timedelta(seconds=seconds), uid,
                "view", 1.0, "{}")

    rows = [
        ev(1, 1, 0), ev(2, 1, 300),   # exactly the gap -> still MERGES
        ev(3, 2, 0), ev(4, 2, 301),   # one past the gap -> TWO sessions
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path / "planted")
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    out = events_sessionization_streamed(spark, sf_dir).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1, by_user
    assert len(by_user[2]) == 2, by_user
    # end = last event + gap
    assert by_user[1][0]["session_end"] == t0 + datetime.timedelta(seconds=300 + 300)
    assert by_user[2][0]["session_end"] == t0 + datetime.timedelta(seconds=300)
    assert by_user[2][1]["session_end"] == t0 + datetime.timedelta(seconds=301 + 300)


def test_cms_join_size_estimate_planted(spark):
    """Planted frequency vectors: keys {1: 3x, 2: 2x} on the left and
    {1: 4x, 3: 5x} on the right -> exact inner join cardinality 3*4 = 12.
    The CMS estimate must never undercount, and with 4096 buckets on a
    two-key domain collisions are (md5-verifiably) absent, so the
    estimate is EXACT; disjoint inputs read exact 0 with NULL relative
    overcount instead of a divide-by-zero."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.operators.sketches import (
        cms_join_size_estimate,
    )

    left = spark.createDataFrame([(1,)] * 3 + [(2,)] * 2, "k long")
    right = spark.createDataFrame([(1,)] * 4 + [(3,)] * 5, "k long")
    r = cms_join_size_estimate(left, F.col("k"), right, F.col("k")).collect()[0]
    assert r["exact_pairs"] == 12
    assert r["never_undercounts"]
    assert r["est_pairs"] == 12
    assert r["overcount_1e6"] == 0

    disjoint = cms_join_size_estimate(
        left, F.col("k"),
        spark.createDataFrame([(9,)], "k long"), F.col("k"),
    ).collect()[0]
    assert disjoint["exact_pairs"] == 0
    assert disjoint["overcount_1e6"] is None


def test_tokenizer_fertility_planted(spark):
    """Planted two-source corpus: srcA is all single-char words (one
    symbol each — fertility exactly 1.0, one char per token); srcB is one
    3-char word repeated, which the greedy merges collapse fully within
    the round budget (fertility 1.0, three chars per token). Pins the
    join-back arithmetic AND that tokenization reflects the LEARNED
    merges, not the char seed."""
    from covid_19_data_engineering_spark.operators.bpe import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [(0, "a b c a b c", "srcA"), (1, "abcdefghij abcdefghij", "srcB")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in tokenizer_fertility(docs).collect()}
    # srcA: single-char words are one symbol each, untouched by merges
    assert out["srcA"]["n_words"] == 6 and out["srcA"]["n_tokens"] == 6
    assert out["srcA"]["fertility_1e6"] == 1000000
    assert out["srcA"]["chars_per_token_1e6"] == 1000000
    # srcB: a 10-char word with 9 distinct adjacent pairs loses one symbol
    # per merge round -> 10 - 8 = 2 tokens after the 8-round budget
    assert out["srcB"]["n_words"] == 2
    assert out["srcB"]["n_tokens"] == 4
    assert out["srcB"]["fertility_1e6"] == 2000000
    assert out["srcB"]["chars_per_token_1e6"] == 5000000


def test_densification_curve_planted_two_months(spark):
    """Jan: one order {1,2} -> (2 nodes, 1 edge). Feb: one order {1,2,3}
    -> node 3 and edges (1,3),(2,3) are NEW, (1,2) keeps its January
    first-appearance -> (3 nodes, 3 edges). Alpha through the two log-log
    points is exactly ln(3)/ln(3/2); the test recomputes the engine's
    fixed-point formula bit-for-bit."""
    import datetime
    import math

    from covid_19_data_engineering_spark.operators.graphs import (
        densification_curve,
    )

    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)],
        "l_orderkey long, l_partkey long",
    )
    orders = spark.createDataFrame(
        [(1, datetime.date(1995, 1, 15)), (2, datetime.date(1995, 2, 20))],
        "o_orderkey long, o_orderdate date",
    )
    rows = densification_curve(li, orders).collect()
    assert [(r["cum_nodes"], r["cum_edges"]) for r in rows] == [(2, 1), (3, 3)]
    xs = [math.log(2.0), math.log(3.0)]
    ys = [math.log(1.0), math.log(3.0)]
    n, sx, sy = 2.0, sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    expect = math.floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                        * 1000000 + 0.5)
    assert all(r["alpha_1e6"] == expect for r in rows)


def test_mmr_prefers_diverse_over_redundant(spark):
    """Planted redundancy: two near-identical vectors A1/A2 both almost
    parallel to the query, one orthogonal-ish vector B at moderate
    relevance. Plain cosine top-2 returns {A1, A2}; MMR must pick A1
    first (pure relevance) and then B — A2's marginal score collapses to
    ~0 because its similarity to the already-selected A1 is ~1."""
    from covid_19_data_engineering_spark.operators.retrieval import (
        mmr_select,
    )

    def vec(x, y):
        return [x, y] + [0.0] * 6

    # A1/A2 sit ~26 degrees OFF the query (if the first pick were ~equal
    # to the query itself, every candidate's marginal would collapse to
    # rel - rel = 0 and the test would be vacuous); B mirrors them on the
    # other side: same relevance, but only ~0.62 similarity to A1
    q = vec(1.0, 0.0)
    rows = [
        (1, vec(0.9, 0.435)),    # A1: rel ~0.90 (tiny bit higher than A2)
        (2, vec(0.9, 0.436)),    # A2: rel ~0.90, near-duplicate of A1
        (3, vec(0.9, -0.436)),   # B: rel ~0.90, diverse (mirror side)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    out = mmr_select(emb, q, k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 3, 2]
    assert out[0]["rank"] == 1 and out[0]["relevance"] > 0.89
    # the diverse pick beats the redundant one on marginal score
    assert out[1]["mmr_score"] > out[2]["mmr_score"]

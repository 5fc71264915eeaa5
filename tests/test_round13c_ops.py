"""Round-13 post-close additions: weighted SSSP over the co-purchase
graph, the Mann-Kendall trend test, the Cochran-Mantel-Haenszel
stratified 2x2 analysis, the log-rank churn-timing test, the
Cochran-Armitage ordered trend test, and the Kruskal-Wallis k-group
rank ANOVA.
Planted-case semantics pins; the cross-engine
arithmetic is pinned by the DuckDB oracle gate (tools/driver_gate.py)
at all three SFs."""

from __future__ import annotations


def _dijkstra(edges: list[tuple[int, int, int]], seed: int,
              max_edges: int) -> dict[int, int]:
    """Reference shortest-path-with-<=max_edges-hops on a tiny graph:
    Bellman-Ford over (hops, node) states, exact ints."""
    adj: dict[int, list[tuple[int, int]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {seed: 0}
    frontier = {seed: 0}
    for _ in range(max_edges):
        nxt: dict[int, int] = {}
        for node, dcur in frontier.items():
            for nb, w in adj.get(node, []):
                cand = dcur + w
                if cand < dist.get(nb, 1 << 60):
                    dist[nb] = cand
                    nxt[nb] = cand
        frontier = nxt
    return dist


def test_weighted_sssp_planted_distances(spark):
    """A planted weighted graph where the shortest path is NOT the
    fewest-hops path: seed 1 (max degree), edge 1-4 costs 9 but the
    three-hop detour 1-2-3-4 costs 3. The operator must return the
    detour distance."""
    from covid_19_data_engineering_spark.operators.graphs import (
        weighted_sssp,
    )

    rows = []
    planted = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 9), (1, 5, 2)]
    for s, d, w in planted:
        rows.append((s, d, w))
        rows.append((d, s, w))
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in weighted_sssp(edges, 4).collect()}
    want = _dijkstra(planted, seed=1, max_edges=4)
    assert got == want
    assert got[4] == 3  # the detour, not the 9-cost direct edge


def test_weighted_sssp_round_bound_is_edge_count(spark):
    """With rounds=1 only direct neighbors appear; the 2-hop improvement
    of node 4 needs rounds>=3 — pins that round r covers exactly paths
    of <= r edges (the contract the oracle unrolls)."""
    from covid_19_data_engineering_spark.operators.graphs import (
        weighted_sssp,
    )

    planted = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 9), (1, 5, 2)]
    rows = [t for s, d, w in planted for t in ((s, d, w), (d, s, w))]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    one = {r["node"]: r["dist"] for r in weighted_sssp(edges, 1).collect()}
    assert one == {1: 0, 2: 1, 4: 9, 5: 2}  # node 3 unreached in 1 hop
    three = {r["node"]: r["dist"] for r in weighted_sssp(edges, 3).collect()}
    assert three[4] == 3


def test_weighted_sssp_seed_is_max_degree_smallest_id(spark):
    """Deterministic seed: max degree, ties broken to the smallest id.
    Nodes 1 and 2 both have degree 2 -> seed must be 1 (dist 0)."""
    from covid_19_data_engineering_spark.operators.graphs import (
        weighted_sssp,
    )

    planted = [(2, 9, 5), (2, 8, 5), (1, 9, 1), (1, 8, 1)]
    rows = [t for s, d, w in planted for t in ((s, d, w), (d, s, w))]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in weighted_sssp(edges, 2).collect()}
    assert got[1] == 0
    assert got == {1: 0, 9: 1, 8: 1, 2: 6}


def test_weighted_edges_support_to_distance(spark):
    """Edge distance = max(1, 11 - support): a pair sharing 1 order is
    distance 10, sharing 3 orders distance 8, sharing >= 10 distance 1."""
    from covid_19_data_engineering_spark.operators.graphs import (
        weighted_copurchase_edges,
    )

    rows = []
    # parts (100, 200) share orders 1..3; (100, 300) share only order 1;
    # (100, 400) share orders 1..12
    for ok in range(1, 4):
        rows += [(ok, 100), (ok, 200)]
    rows += [(1, 300)]
    for ok in range(1, 13):
        rows += [(ok, 100), (ok, 400)]
    li = spark.createDataFrame(
        [(ok, pk) for ok, pk in rows], "l_orderkey long, l_partkey long"
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in weighted_copurchase_edges(li).collect()
    }
    assert got[(100, 200)] == 8 and got[(200, 100)] == 8
    assert got[(100, 300)] == 10
    assert got[(100, 400)] == 1


def _mk_python(ys: list[int]) -> tuple[int, int]:
    """Reference S and tie term for a daily series, exact ints."""
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter
    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values() if t > 1)
    return s, tie


def _mk_orders(spark, cents: list[int]):
    """One order per consecutive 1995 day with the given total cents."""
    rows = [
        (i, f"1995-01-{i + 1:02d}", c / 100.0)
        for i, c in enumerate(cents)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double"
    )


def test_mann_kendall_monotone_series_is_significant(spark):
    """A strictly increasing 12-day series: S = C(12,2) = 66, no ties,
    z > 1.96 -> 'increasing'."""
    from covid_19_data_engineering_spark.operators.regression import (
        mann_kendall_daily,
    )

    cents = [1000 + 50 * i for i in range(12)]
    row = mann_kendall_daily(_mk_orders(spark, cents)).collect()[0]
    s, tie = _mk_python(cents)
    assert (row["n_days"], row["s_stat"], row["tie_term"]) == (12, s, tie)
    assert s == 66 and tie == 0
    assert row["z_stat"] > 1.96 and row["trend"] == "increasing"
    assert row["tau"] == 1.0


def test_mann_kendall_ties_and_no_trend(spark):
    """An alternating tied series: S ~ 0, the tie term matches the exact
    sum t(t-1)(2t+5), and the verdict is 'none'."""
    from covid_19_data_engineering_spark.operators.regression import (
        mann_kendall_daily,
    )

    cents = [1000, 2000, 1000, 2000, 1000, 2000, 1000, 2000]
    row = mann_kendall_daily(_mk_orders(spark, cents)).collect()[0]
    s, tie = _mk_python(cents)
    assert (row["s_stat"], row["tie_term"]) == (s, tie)
    assert tie == 2 * (4 * 3 * 13)  # two groups of 4 tied days
    assert row["trend"] == "none"


def test_mann_kendall_decreasing_continuity_correction(spark):
    """A strictly decreasing series flips the sign and applies the +1
    continuity correction: z = (S+1)/sqrt(var)."""
    import math

    from covid_19_data_engineering_spark.operators.regression import (
        mann_kendall_daily,
    )

    cents = [5000 - 100 * i for i in range(10)]
    row = mann_kendall_daily(_mk_orders(spark, cents)).collect()[0]
    s, tie = _mk_python(cents)
    assert s == -45 and row["s_stat"] == s
    var = (10 * 9 * 25 - tie) / 18.0
    assert row["z_stat"] == round((s + 1) / math.sqrt(var), 4)
    assert row["trend"] == "decreasing"


def _mh_df(spark, strata: dict[str, tuple[int, int, int, int]]):
    """Explicit 2x2 cell counts -> row-level (stratum, exposed, outcome)."""
    rows = []
    for st, (a, b, c, d) in strata.items():
        rows += [(st, True, True)] * a
        rows += [(st, True, False)] * b
        rows += [(st, False, True)] * c
        rows += [(st, False, False)] * d
    return spark.createDataFrame(
        rows, "stratum string, exposed boolean, outcome boolean"
    )


def test_mantel_haenszel_simpsons_paradox_guard(spark):
    """Two strata each with odds ratio EXACTLY 1 pool to a 2.25 odds
    ratio — the Simpson's reversal. The stratified MH estimate must
    report 1.0 and not significant."""
    from covid_19_data_engineering_spark.operators.contingency import (
        mantel_haenszel,
    )

    df = _mh_df(spark, {"s1": (80, 20, 40, 10), "s2": (10, 40, 20, 80)})
    row = mantel_haenszel(df, "stratum", "exposed", "outcome").collect()[0]
    assert row["n_strata"] == 2 and row["n_rows"] == 300
    assert row["exposed_outcome_total"] == 90
    assert row["or_mh"] == 1.0
    assert not row["significant"]
    # the POOLED table would mislead: (90*90)/(60*60) = 2.25
    pooled = (90 * 90) / (60 * 60)
    assert pooled == 2.25


def test_mantel_haenszel_exact_formula_replica(spark):
    """or_mh and cmh_stat match a pure-python replica of the exact
    fixed-point pipeline (round per stratum to 1e-6 units, sum ints,
    one final double solve)."""
    import math

    from covid_19_data_engineering_spark.operators.contingency import (
        mantel_haenszel,
    )

    strata = {"x": (30, 10, 15, 45), "y": (5, 25, 10, 60)}
    df = _mh_df(spark, strata)
    row = mantel_haenszel(df, "stratum", "exposed", "outcome").collect()[0]

    fx = 1_000_000
    sa = se = sv = snum = sden = 0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        sa += a
        snum += round(a * d / n * fx)
        sden += round(b * c / n * fx)
        se += round((a + b) * (a + c) / n * fx)
        sv += round((a + b) * (c + d) * (a + c) * (b + d)
                    / (n * n * (n - 1)) * fx)
    or_mh = round(snum / sden, 6)
    dev = abs(sa - se / fx) - 0.5
    cmh = round(dev * dev / (sv / fx), 4)
    assert row["or_mh"] == or_mh
    assert row["cmh_stat"] == cmh
    assert row["significant"] == (cmh > 3.8415)
    assert row["significant"]  # both strata carry a real OR ~ 9 effect
    assert math.isfinite(row["cmh_stat"])


def test_mantel_haenszel_degenerate_stratum_excluded(spark):
    """A single-row stratum (hypergeometric variance would divide by
    zero) is excluded identically rather than poisoning the sums."""
    from covid_19_data_engineering_spark.operators.contingency import (
        mantel_haenszel,
    )

    df = _mh_df(spark, {"ok": (20, 10, 10, 20), "tiny": (1, 0, 0, 0)})
    row = mantel_haenszel(df, "stratum", "exposed", "outcome").collect()[0]
    assert row["n_strata"] == 1 and row["n_rows"] == 60


def _lr_tables(spark, lifetimes: dict[str, list[tuple[int, int, bool]]]):
    """Build (orders, customer) from per-segment (first_month_idx,
    duration_months, churned) triples. Month idx 0 = 2015-01; the
    horizon anchor is a 2020-12 order from an 'OTHER'-segment customer
    (horizon uses ALL orders; the segment filter drops it from the
    test). churned=True places the last order >= 12 months before the
    horizon by construction (callers pick durations accordingly)."""
    orders, custs = [], []
    ck = 0
    for seg, rows in lifetimes.items():
        for fm, dur, _churn in rows:
            ck += 1
            custs.append((ck, seg))
            y0, m0 = divmod(fm, 12)
            y1, m1 = divmod(fm + dur, 12)
            orders.append((ck, f"{2015 + y0}-{m0 + 1:02d}-05"))
            orders.append((ck, f"{2015 + y1}-{m1 + 1:02d}-20"))
    ck += 1
    custs.append((ck, "OTHER"))
    orders.append((ck, "2020-12-15"))
    odf = spark.createDataFrame(
        orders, "o_custkey long, o_orderdate string"
    )
    cdf = spark.createDataFrame(custs, "c_custkey long, c_mktsegment string")
    return odf, cdf


def _lr_python(lifetimes, horizon_idx=71, censor=12):
    """Pure-python replica of the exact fixed-point log-rank pipeline."""
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])  # (t, grp) -> [events, total]
    for seg, rows in lifetimes.items():
        grp = seg == "BUILDING"
        for fm, dur, _ in rows:
            event = 1 if horizon_idx - (fm + dur) >= censor else 0
            cell = per[(dur, grp)]
            cell[0] += event
            cell[1] += 1
    ts = sorted({t for t, _ in per})
    fx = 1_000_000
    o1 = se = sv = 0
    n_a = sum(v[1] for (t, g), v in per.items() if g)
    n_b = sum(v[1] for (t, g), v in per.items() if not g)
    for t in ts:
        d1, _ = per.get((t, True), [0, 0])
        d2, _ = per.get((t, False), [0, 0])
        n1 = sum(v[1] for (s, g), v in per.items() if g and s >= t)
        n2 = sum(v[1] for (s, g), v in per.items() if not g and s >= t)
        d, n = d1 + d2, n1 + n2
        if d > 0 and n > 1:
            o1 += d1
            se += round(d * n1 / n * fx)
            sv += round(d * n1 * n2 * (n - d) / (n * n * (n - 1)) * fx)
    chi = round((o1 - se / fx) ** 2 / (sv / fx), 4)
    return n_a, n_b, o1, round(se / fx, 4), chi


def test_logrank_identical_groups_is_null(spark):
    """Two segments with IDENTICAL lifetime distributions: at every
    event time d1 == E[d1] exactly, so chi == 0 and not significant."""
    from covid_19_data_engineering_spark.operators.survival import (
        logrank_lifetimes,
    )

    rows = [(0, 1, True), (0, 2, True), (0, 3, True), (48, 10, False)]
    lifetimes = {"BUILDING": rows, "MACHINERY": list(rows)}
    odf, cdf = _lr_tables(spark, lifetimes)
    got = logrank_lifetimes(odf, cdf).collect()[0]
    assert got["n_a"] == 4 and got["n_b"] == 4
    assert got["logrank_chi"] == 0.0
    assert not got["significant"]


def test_logrank_divergent_churn_matches_replica(spark):
    """BUILDING churns at month 1, MACHINERY at month 10 — the exact
    fixed-point pipeline must match the pure-python replica and flag
    the separation as significant."""
    from covid_19_data_engineering_spark.operators.survival import (
        logrank_lifetimes,
    )

    lifetimes = {
        "BUILDING": [(i, 1, True) for i in range(5)],
        "MACHINERY": [(i, 10, True) for i in range(5)],
    }
    odf, cdf = _lr_tables(spark, lifetimes)
    got = logrank_lifetimes(odf, cdf).collect()[0]
    n_a, n_b, o1, e_a, chi = _lr_python(lifetimes)
    assert (got["n_a"], got["n_b"], got["observed_a"]) == (n_a, n_b, o1)
    assert got["expected_a"] == e_a
    assert got["logrank_chi"] == chi
    assert got["significant"] == (chi > 3.8415)
    assert got["significant"]  # full separation on 10 subjects


def test_logrank_censoring_respects_horizon(spark):
    """A customer whose last order is within 12 months of the horizon
    is censored: it contributes to at-risk counts but never to events
    (observed_a stays at the churned count only)."""
    from covid_19_data_engineering_spark.operators.survival import (
        logrank_lifetimes,
    )

    lifetimes = {
        "BUILDING": [(0, 2, True), (60, 8, False)],  # 60+8 = 2020-09
        "MACHINERY": [(0, 2, True), (0, 5, True)],
    }
    odf, cdf = _lr_tables(spark, lifetimes)
    got = logrank_lifetimes(odf, cdf).collect()[0]
    assert got["n_a"] == 2
    assert got["observed_a"] == 1  # the censored lifetime never counts


def _ca_df(spark, groups: dict[int, tuple[int, int]]):
    """score -> (failures, total) into row-level (score, failed)."""
    rows = []
    for s, (r, n) in groups.items():
        rows += [(s, True)] * r
        rows += [(s, False)] * (n - r)
    return spark.createDataFrame(rows, "score long, failed boolean")


def test_cochran_armitage_dose_response(spark):
    """Failure rate rising 10% -> 50% across scores 1..5 must match the
    pure-python Armitage formula exactly and read 'increasing'."""
    import math

    from covid_19_data_engineering_spark.operators.contingency import (
        cochran_armitage,
    )

    groups = {s: (10 * s, 100) for s in range(1, 6)}
    row = cochran_armitage(_ca_df(spark, groups), "score", "failed") \
        .collect()[0]
    n = sum(t for _, t in groups.values())
    r = sum(f for f, _ in groups.values())
    s1 = sum(s * t for s, (_, t) in groups.items())
    s2 = sum(s * s * t for s, (_, t) in groups.items())
    t_stat = sum(s * f for s, (f, _) in groups.items())
    p = r / n
    z = round((t_stat - p * s1) / math.sqrt(p * (1 - p) * (s2 - s1 * s1 / n)),
              4)
    assert (row["n_rows"], row["r_fail"], row["t_stat"]) == (n, r, t_stat)
    assert row["z_stat"] == z
    assert row["trend"] == "increasing" and z > 1.96


def test_cochran_armitage_flat_rate_is_none(spark):
    """Identical rates at every score: T == E[T] exactly, z == 0."""
    from covid_19_data_engineering_spark.operators.contingency import (
        cochran_armitage,
    )

    groups = {s: (20, 100) for s in range(1, 6)}
    row = cochran_armitage(_ca_df(spark, groups), "score", "failed") \
        .collect()[0]
    assert row["z_stat"] == 0.0
    assert row["trend"] == "none"


def test_weighted_sssp_through_reliable_checkpoint(spark, tmp_path):
    """The SSSP rounds truncate lineage via the shared seam, so the
    reliable-checkpoint posture (executor-loss-safe DataFrame.checkpoint
    instead of localCheckpoint) must hold for this loop too: same
    distances, and checkpoint data actually written."""
    import os

    from covid_19_data_engineering_spark.operators.graphs import (
        weighted_sssp,
    )
    from covid_19_data_engineering_spark.operators.lineage import (
        reliable_checkpoint_dir,
        set_reliable_checkpoint_dir,
    )

    planted = [(i, i + 1, 2) for i in range(1, 8)] + [(1, 9, 5)]
    rows = [t for s, d, w in planted for t in ((s, d, w), (d, s, w))]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    expected = sorted(
        (r["node"], r["dist"]) for r in weighted_sssp(edges, 4).collect())
    ckpt = str(tmp_path / "ckpt")
    set_reliable_checkpoint_dir(spark, ckpt)
    try:
        got = sorted(
            (r["node"], r["dist"])
            for r in weighted_sssp(edges, 4).collect())
        wrote = any(files for _, _, files in os.walk(ckpt))
        assert wrote, "reliable checkpoint dir stayed empty"
    finally:
        set_reliable_checkpoint_dir(spark, None)
    assert got == expected
    assert reliable_checkpoint_dir() is None


def _kw_python(groups: dict[str, list[float]]) -> tuple:
    """Pure-python replica of the exact normalized fixed-point KW
    pipeline (average-rank ties, per-group term fixed-pointed after
    normalization, one final solve)."""
    from collections import Counter

    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # tied-block (min_rank, cnt) per distinct value
    first = {}
    cnt = Counter(allv)
    seen = 0
    for v in sorted(cnt):
        first[v] = seen + 1
        seen += cnt[v]
    fx = 1_000_000
    sh = 0
    for vs in groups.values():
        r_x2 = sum(2 * first[v] + cnt[v] - 1 for v in vs)
        n_g = len(vs)
        sh += round(12.0 * r_x2 * r_x2 / (n * (n + 1) * 4.0 * n_g) * fx)
    tie = sum(t * t * t - t for t in cnt.values())
    h = round(sh / fx - 3.0 * (n + 1), 4)
    hc = round((sh / fx - 3.0 * (n + 1))
               / (1.0 - tie / (n ** 3 - n)), 4)
    return n, len(groups), tie, h, hc


def _kw_df(spark, groups: dict[str, list[float]]):
    rows = []
    i = 0
    for g, vs in groups.items():
        for v in vs:
            i += 1
            rows.append((i, v, g))
    return spark.createDataFrame(rows, "event_id long, value double, "
                                       "event_type string")


def test_kruskal_wallis_matches_exact_replica(spark):
    """Three groups with ties across group boundaries: every output
    field matches the pure-python replica of the fixed-point pipeline,
    and clear separation reads as a large H."""
    from covid_19_data_engineering_spark.operators.distrank import (
        kruskal_wallis,
    )

    groups = {
        "a": [1.0, 2.0, 2.0, 3.0, 4.0],
        "b": [5.0, 6.0, 6.0, 7.0, 8.0],
        "c": [9.0, 10.0, 10.0, 11.0, 12.0],
    }
    row = kruskal_wallis(_kw_df(spark, groups), "value", "event_type",
                         "event_id").collect()[0]
    n, k, tie, h, hc = _kw_python(groups)
    assert (row["n_rows"], row["n_groups"], row["dof"]) == (n, k, k - 1)
    assert row["tie_term"] == tie
    assert row["h_stat"] == h and row["h_corrected"] == hc
    assert row["h_corrected"] > 5.99  # chi2(df=2) 5% — fully separated


def test_kruskal_wallis_identical_groups_near_zero(spark):
    """Identical group distributions: rank sums are equal by symmetry,
    so H sits at (numerically) zero and the tie correction only scales
    it."""
    from covid_19_data_engineering_spark.operators.distrank import (
        kruskal_wallis,
    )

    vals = [1.0, 2.0, 3.0, 4.0]
    groups = {"a": list(vals), "b": list(vals), "c": list(vals)}
    row = kruskal_wallis(_kw_df(spark, groups), "value", "event_type",
                         "event_id").collect()[0]
    n, k, tie, h, hc = _kw_python(groups)
    assert row["tie_term"] == tie == sum(3 ** 3 - 3 for _ in vals)
    assert abs(row["h_stat"]) <= 0.01  # fixed-point epsilon around 0
    assert row["h_stat"] == h and row["h_corrected"] == hc


def test_seasonal_mann_kendall_isolates_trend_from_seasonality(spark):
    """A strong seasonal cycle with a within-month upward drift across
    years: the seasonal test compares January only with January etc.,
    so the cycle cannot mask the trend — S must equal
    n_seasons * C(n_years, 2) (every within-month pair increases) and
    the verdict 'increasing'. A pure cycle with NO drift reads S = 0."""
    from covid_19_data_engineering_spark.operators.regression import (
        seasonal_mann_kendall,
    )

    def orders_for(drift_per_year: int):
        rows = []
        k = 0
        for yr in range(1995, 1999):
            for mo in range(1, 13):
                k += 1
                # huge seasonal swing + small yearly drift
                cents = 100_000 * mo + drift_per_year * (yr - 1995)
                rows.append((k, f"{yr}-{mo:02d}-10", cents / 100.0))
        return spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate string, "
                  "o_totalprice double")

    drifted = seasonal_mann_kendall(orders_for(100)).collect()[0]
    assert drifted["n_seasons"] == 12 and drifted["n_points"] == 48
    assert drifted["s_stat"] == 12 * 6  # 12 months x C(4,2) pairs, all up
    assert drifted["trend"] == "increasing"

    flat = seasonal_mann_kendall(orders_for(0)).collect()[0]
    assert flat["s_stat"] == 0
    assert flat["trend"] == "none"
    # all 4 years tie within each month: tie term == var18 contribution
    assert flat["var18"] == 0  # 12 * (4*3*13 - 4*3*13)


def test_pettitt_locates_a_planted_level_shift(spark):
    """30 days at 10.00 then 30 days at 50.00: the Pettitt statistic
    must peak exactly at the last pre-shift day with K = 30*30 (every
    straddling pair increases), p << 0.05."""
    from covid_19_data_engineering_spark.operators.regression import (
        pettitt_changepoint,
    )

    cents = [1000] * 30 + [5000] * 30
    rows = []
    for i, c in enumerate(cents):
        mo, day = divmod(i, 28)
        rows.append((i, f"1995-{mo + 1:02d}-{day + 1:02d}", c / 100.0))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double")
    row = pettitt_changepoint(orders).collect()[0]
    assert row["n_days"] == 60
    assert row["k_stat"] == 30 * 30
    # change_day = the 30th day in epoch-day units
    import datetime

    d30 = rows[29][1]
    epoch = (datetime.date.fromisoformat(d30)
             - datetime.date(1970, 1, 1)).days
    assert row["change_day"] == epoch
    assert row["significant"] and row["p_approx"] < 0.001


def test_pettitt_flat_series_not_significant(spark):
    """A constant series has U_t = 0 everywhere: K = 0, p = 1 (capped),
    not significant, argmax ties to the earliest day."""
    from covid_19_data_engineering_spark.operators.regression import (
        pettitt_changepoint,
    )

    rows = [(i, f"1995-01-{i + 1:02d}", 10.0) for i in range(20)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double")
    row = pettitt_changepoint(orders).collect()[0]
    assert row["k_stat"] == 0
    assert row["p_approx"] == 1.0
    assert not row["significant"]


def test_containment_catches_what_jaccard_misses(spark):
    """A 12-token doc fully quoted inside a 120-token doc: containment
    = 1.0 but Jaccard ~ 0.09 — below the 0.35 Jaccard gate. The
    containment operator must surface the pair; the Jaccard twin must
    not."""
    from covid_19_data_engineering_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs_lsh,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    host = quote + " " + " ".join(f"h{i}" for i in range(108))
    other = " ".join(f"z{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, quote, "en", "web"), (2, host, "en", "web"),
         (3, other, "en", "web")],
        "doc_id long, text string, lang string, source string")
    got = {(r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
           for r in ngram_containment_pairs(df).collect()}
    assert (1, 2) in got
    c, j = got[(1, 2)]
    assert c == 1.0 and j < 0.35  # the asymmetric catch
    jac = {(r["doc_a"], r["doc_b"])
           for r in ngram_jaccard_pairs_lsh(df, threshold=0.35,
                                            collapse=False).collect()}
    assert (1, 2) not in jac
    assert (1, 3) not in got and (2, 3) not in got


def test_max_drawdown_planted_peak_trough(spark):
    """Rise to 50.00, collapse to 20.00, recover: drawdown = 30.00 from
    the planted peak day to the planted trough day, 60%."""
    from covid_19_data_engineering_spark.operators.temporal import (
        max_drawdown_daily,
    )

    cents = [1000, 3000, 5000, 4000, 2000, 4500, 4800]
    rows = [(i, f"1995-01-{i + 1:02d}", c / 100.0)
            for i, c in enumerate(cents)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double")
    row = max_drawdown_daily(orders).collect()[0]
    assert row["n_days"] == 7
    assert row["drawdown_cents"] == 3000
    assert row["peak_cents"] == 5000 and row["trough_cents"] == 2000
    assert row["trough_day"] - row["peak_day"] == 2  # day 3 -> day 5
    assert row["drawdown_pct"] == 60.0


def test_max_drawdown_monotone_rise_is_zero(spark):
    """A strictly rising series never draws down: drawdown 0, trough
    ties to the EARLIEST day (deterministic)."""
    from covid_19_data_engineering_spark.operators.temporal import (
        max_drawdown_daily,
    )

    rows = [(i, f"1995-01-{i + 1:02d}", 10.0 + i)
            for i in range(10)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double")
    row = max_drawdown_daily(orders).collect()[0]
    assert row["drawdown_cents"] == 0
    assert row["trough_day"] == row["peak_day"]  # earliest day, dd = 0
    assert row["drawdown_pct"] == 0.0


def test_readability_flesch_exact_formula(spark):
    """A known sentence replica: words, vowel-group syllables, and the
    Flesch formula must match a hand computation; unpunctuated docs
    guard sentences to 1."""
    from covid_19_data_engineering_spark.operators.textstats import (
        readability_profile,
    )

    text = "the cat sat on the mat. it was happy."
    docs = spark.createDataFrame(
        [(1, text, "en", "a"), (2, "tsk qrs brr", "en", "b")],
        "doc_id long, text string, lang string, source string")
    rows = {r["source"]: r for r in readability_profile(docs).collect()}

    import re
    w = len(text.split(" "))
    sents = max(1, len(re.findall(r"[.!?]+", text)))
    syl = len(re.findall(r"[aeiouy]+", text.lower()))
    flesch = 206.835 - 1.015 * w / sents - 84.6 * syl / w
    fx = round(flesch * 10000)
    assert rows["a"]["avg_flesch"] == round(fx / 1 / 10000, 4)
    # doc 2 has ZERO vowel groups (y is a vowel, so no y anywhere) ->
    # syllables 0, flesch = 206.835 - 1.015*3
    assert rows["b"]["avg_syllables_per_word"] == 0.0
    assert rows["b"]["avg_flesch"] == round(206.835 - 1.015 * 3, 4)


def test_streamed_left_join_null_emission_boundary(spark):
    """Planted watermark-expiry semantics: purchase A (old, no click)
    must emit a NULL-click row; purchase B (younger than the final
    watermark, no click) must stay buffered and NOT appear; purchase C
    (matched) emits its pair. Drives the REAL streaming engine off the
    rate-free memory-of-files path via a parquet temp dir."""
    import tempfile

    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.streaming.events import (
        stream_click_purchase_left_join,
    )

    rows = [
        # (event_id, user_id, event_type, ts, value)
        (1, 10, "purchase", "2024-01-01 00:00:00", 5.0),   # A: old, alone
        (2, 20, "click", "2024-01-01 02:00:00", 0.0),
        (3, 20, "purchase", "2024-01-01 02:10:00", 7.0),   # C: matched
        (4, 30, "purchase", "2024-01-01 02:55:00", 9.0),   # B: young, alone
        (5, 40, "click", "2024-01-01 03:00:00", 0.0),      # watermark anchor
    ]
    with tempfile.TemporaryDirectory() as td:
        src = f"{td}/events.parquet"
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
            .write.parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .format("parquet").load(src)
        )
        out = stream_click_purchase_left_join(stream)
        name = "left_join_planted_sink"
        ckpt = f"{td}/ckpt"
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)
        got = {r["purchase_id"]: r["click_id"]
               for r in spark.table(name).collect()}
    # final watermark = min(max click 03:00, max purchase 02:55) - 10min
    # = 02:45. A (00:00) < 02:45 -> NULL row; B (02:55) >= 02:45 -> held.
    assert got == {1: None, 3: 2}


def test_runs_test_streaky_and_oscillating(spark):
    """A half-up-then-half-down series has exactly 2 runs (maximally
    streaky, z << 0); a strict alternation has the maximal run count
    (z >> 0, 'oscillating'); counts match a hand replica."""
    import math

    from covid_19_data_engineering_spark.operators.regression import (
        runs_test_daily,
    )

    def run(cents):
        rows = [(i, f"1995-01-{i + 1:02d}", c / 100.0)
                for i, c in enumerate(cents)]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate string, "
                  "o_totalprice double")
        return runs_test_daily(df).collect()[0]

    streaky = run([1000 + 100 * i for i in range(11)]
                  + [2000 - 100 * i for i in range(1, 11)])
    assert (streaky["n_up"], streaky["n_down"]) == (10, 10)
    assert streaky["n_runs"] == 2
    n1 = n2 = 10.0
    n = n1 + n2
    er = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert streaky["z_stat"] == round((2 - er) / math.sqrt(var), 4)
    assert streaky["verdict"] == "streaky"

    osc = run([1000, 2000] * 10 + [1000])
    assert osc["n_runs"] == osc["n_up"] + osc["n_down"]  # every move flips
    assert osc["verdict"] == "oscillating"


def test_friedman_consistent_ordering_differs(spark):
    """Group 'c' always ranks highest, 'a' lowest, across 12 blocks:
    maximal Q = n*(k-1)... the exact formula replica must match and the
    verdict read 'differs'; a shuffled-rank layout reads 'none'. An
    incomplete block (missing group) must be excluded."""
    from covid_19_data_engineering_spark.operators.distrank import (
        friedman_test,
    )

    rows = []
    for b in range(12):
        rows += [(b, "a", 10.0 + b), (b, "b", 20.0 + b), (b, "c", 30.0 + b)]
    rows += [(99, "a", 1.0), (99, "b", 2.0)]  # incomplete block
    df = spark.createDataFrame(rows, "d long, event_type string, y double")
    row = friedman_test(df, "d", "event_type", "y").collect()[0]
    assert row["n_blocks"] == 12 and row["n_groups"] == 3
    # rank sums 12*1, 12*2, 12*3 -> Q = 12/(12*3*4)*(144+576+1296)-3*12*4
    n, k = 12, 3
    q = 12.0 / (n * k * (k + 1)) * sum((n * r) ** 2 for r in (1, 2, 3)) \
        - 3 * n * (k + 1)
    assert row["q_stat"] == round(q, 4)
    assert row["verdict"] == "differs"  # > chi2 bound even at df=2

    rot = []
    for b in range(12):
        vals = [10.0, 20.0, 30.0]
        order = [vals[(b + i) % 3] for i in range(3)]
        rot += [(b, g, v) for g, v in zip(("a", "b", "c"), order)]
    df2 = spark.createDataFrame(rot, "d long, event_type string, y double")
    row2 = friedman_test(df2, "d", "event_type", "y").collect()[0]
    assert row2["q_stat"] == 0.0 and row2["verdict"] == "none"

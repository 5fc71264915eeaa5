"""Round-13 continuation session: Kneser-Ney LM, Fellegi-Sunter record
linkage, Hilbert layout, sampled-aggregate estimation, frequent event
sequences. Planted-case semantics pins; the cross-engine math is pinned by
the DuckDB oracle gate (tools/driver_gate.py) at all three SFs."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_kneser_ney_continuation_counts_matter(spark):
    """The KN signature property (the 'san francisco' effect): two bigrams
    with IDENTICAL raw counts and identical contexts score differently when
    the continuation word differs in how many distinct contexts it follows.
    'glasses' follows five distinct words; 'francisco' only ever follows
    'san' (and the probe context) — so P_KN(glasses | x) > P_KN(francisco | x)
    even though C(x, glasses) == C(x, francisco) == 1."""
    from covid_19_data_engineering_spark.operators.llmprep import (
        lm_kneser_ney_scores,
    )

    rows = [
        # glasses after 4 distinct contexts
        (0, "red glasses", "en", "web"),
        (1, "blue glasses", "en", "web"),
        (2, "old glasses", "en", "web"),
        (3, "new glasses", "en", "web"),
        # francisco always after san, same total frequency as glasses
        (4, "san francisco", "en", "web"),
        (5, "san francisco", "en", "web"),
        (6, "san francisco", "en", "web"),
        (7, "san francisco", "en", "web"),
        # probe docs: one unseen-context bigram each, identical counts
        (100, "x glasses", "en", "web"),
        (101, "x francisco", "en", "web"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["doc_id"]: r for r in lm_kneser_ney_scores(df).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7, 100, 101}
    # the glasses probe must beat the francisco probe purely on
    # continuation counts
    assert out[100]["avg_nll"] < out[101]["avg_nll"]
    # identical docs -> identical scores; all NLLs positive
    assert out[4]["avg_nll"] == out[5]["avg_nll"] == out[6]["avg_nll"]
    for r in out.values():
        assert r["avg_nll"] > 0.0
        assert r["n_bigrams"] == 1
    # repeated corpus-common bigram scores better than a one-off
    assert out[4]["avg_nll"] < out[100]["avg_nll"]


def test_kneser_ney_discount_from_count_of_counts(spark):
    """D = n1/(n1 + 2*n2) over bigram TYPE counts; verify end-to-end by
    hand on a corpus small enough to enumerate. Corpus bigram types:
    (a,b) with count 2 and (c,d) with count 1 -> n1=1, n2=1, D=1/3.
    P_KN(b|a) = (2 - 1/3 + (1/3)*1*(1/2)) / 2 = (5/3 + 1/6)/2 = 11/12."""
    import math

    from covid_19_data_engineering_spark.operators.llmprep import (
        lm_kneser_ney_scores,
    )

    rows = [
        (0, "a b", "en", "web"),
        (1, "a b", "en", "web"),
        (2, "c d", "en", "web"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["doc_id"]: r for r in lm_kneser_ney_scores(df).collect()}
    expected = round(
        round(-math.log((2 - 1 / 3 + (1 / 3) * 1 * (1 / 2)) / 2), 6), 4
    )
    assert out[0]["avg_nll"] == expected
    assert out[1]["avg_nll"] == expected


def test_fs_linkage_planted_duplicate_outranks(spark):
    """A planted true re-listing (full agreement) must get the maximum FS
    weight in its block; a blocked pair disagreeing everywhere must score
    the pattern minimum, and weights must be monotone in agreements."""
    from covid_19_data_engineering_spark.operators.linkage import (
        fs_candidate_pairs,
    )

    rows = [
        # block (widget, Brand#1): a true duplicate pair + a far pair
        (1, "cold widget", "Brand#1", "ECONOMY", 10, 1.0),
        (2, "cold widget", "Brand#1", "ECONOMY", 11, 1.0),   # dup of 1
        (3, "hot widget", "Brand#1", "PROMO", 40, 1.0),      # disagrees all
        # block (bolt, Brand#2): partial agreement
        (4, "small bolt", "Brand#2", "STANDARD", 20, 1.0),
        (5, "small bolt", "Brand#2", "PROMO", 20, 1.0),      # name+size agree
        # filler for u-statistics diversity
        (6, "old gear", "Brand#3", "ECONOMY", 5, 1.0),
        (7, "new gear", "Brand#4", "PROMO", 30, 1.0),
    ]
    parts = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    out = {(r["a_key"], r["b_key"]): r for r in fs_candidate_pairs(parts).collect()}
    # blocks: widget/Brand#1 -> pairs (1,2),(1,3),(2,3); bolt/Brand#2 -> (4,5)
    assert set(out) == {(1, 2), (1, 3), (2, 3), (4, 5)}
    dup = out[(1, 2)]
    assert (dup["agree_name"], dup["agree_type"], dup["agree_size"]) == (1, 1, 1)
    assert dup["fs_weight"] == max(r["fs_weight"] for r in out.values())
    # full disagreement scores strictly below partial agreement
    assert out[(1, 3)]["fs_weight"] < out[(4, 5)]["fs_weight"] < dup["fs_weight"]


def test_fs_linkage_candidate_volume_bounded(spark):
    """The blocking contract: candidate pair volume equals the sum of
    C(block,2) over (noun, brand) blocks and no block exceeds the bound a
    domain-limited key implies. A blocking-key regression that re-opens
    the all-pairs blowup fails here before it ships."""
    from covid_19_data_engineering_spark.operators.linkage import (
        fs_candidate_pairs,
    )
    from covid_19_data_engineering_spark.sources.tables import load_table

    parts = load_table(spark, "part", "/root/testdata/sf0.01")
    blocks = (
        parts.select(
            F.split("p_name", " ").getItem(1).alias("t"),
            F.col("p_brand").alias("b"),
        )
        .groupBy("t", "b")
        .count()
        .collect()
    )
    expected_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in blocks)
    max_block = max(r["count"] for r in blocks)
    got = fs_candidate_pairs(parts).count()
    assert got == expected_pairs
    n = parts.count()
    assert max_block < n // 10  # blocks stay a small fraction of the table


def _xy2d(n_bits: int, x: int, y: int) -> int:
    """Pure-python replica of the unrolled Hilbert walk (the canonical
    xy2d), used to pin the generated Spark/DuckDB expression chain."""
    d = 0
    for i in range(n_bits):
        s = 1 << (n_bits - 1 - i)
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - (y % s), s - 1 - (x % s)
            else:
                x, y = y % s, x % s
        else:
            x, y = x % s, y % s
    return d


def test_hilbert_walk_canonical_and_spark_matches_replica(spark):
    """The order-2 walk must be the canonical Hilbert sequence; the Spark
    expression chain must agree with the replica on planted 8-bit cells."""
    from covid_19_data_engineering_spark.operators.layout import (
        H_BITS,
        hilbert_index,
    )

    seq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3), (1, 2),
           (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0)]
    assert [_xy2d(2, x, y) for x, y in seq] == list(range(16))

    cells = [(x, y) for x in range(0, 256, 13) for y in range(0, 256, 17)]
    df = spark.createDataFrame(
        [(x, y, x, y) for x, y in cells], "a long, b long, qx long, qy long"
    )
    got = {(r["a"], r["b"]): r["d"] for r in hilbert_index(df).collect()}
    for x, y in cells:
        assert got[(x, y)] == _xy2d(H_BITS, x, y)


def test_hilbert_consecutive_files_are_adjacent_morton_jumps():
    """The property that makes Hilbert the better clustering for range
    scans: consecutive FILE ids cover edge-adjacent cells (a scan of files
    [k, k+m] reads one connected region), while consecutive Morton files
    take diagonal jumps across the grid. Verified on the exact 8x8 file
    grid both curves induce at 6 file bits."""
    # file cell centroid per curve over the full 64x64 coarse grid
    import collections

    hil = collections.defaultdict(list)
    mor = collections.defaultdict(list)
    for x in range(64):
        for y in range(64):
            hd = _xy2d(6, x, y) >> 6         # top 6 of 12 bits
            md = 0
            for i in range(6):
                md += ((x >> i) & 1) << (2 * i + 1) | ((y >> i) & 1) << (2 * i)
            mor[md >> 6].append((x, y))
            hil[hd].append((x, y))
    def steps(cells):
        cen = {
            f: (sum(p[0] for p in pts) / len(pts),
                sum(p[1] for p in pts) / len(pts))
            for f, pts in cells.items()
        }
        return [
            max(abs(cen[f + 1][0] - cen[f][0]), abs(cen[f + 1][1] - cen[f][1]))
            for f in range(63)
        ]

    hsteps, msteps = steps(hil), steps(mor)
    assert len(hil) == len(mor) == 64
    # every consecutive Hilbert file is edge-adjacent (one 8-cell width)
    assert max(hsteps) <= 8.0
    # Morton takes multi-cell diagonal jumps (7 of them at this order,
    # the worst spanning 7 cell widths); Hilbert takes none
    assert sum(1 for s in msteps if s > 8.0) >= 7
    assert max(msteps) >= 56.0


def test_sampled_revenue_estimate_accuracy(spark):
    """The HT estimator from the 10% hash sample lands within a few
    percent of the exact per-priority totals at gate scale, the 3-sigma
    CI flag holds, and the sample fraction is near f."""
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.01"
    out = e.queries()["orders_sampled_revenue_estimate"](spark, sf_dir).collect()
    from covid_19_data_engineering_spark.sources.tables import load_table

    exact = {
        r["o_orderpriority"]: (r["t"], r["n"])
        for r in load_table(spark, "orders", sf_dir)
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("t"), F.count("*").alias("n"))
        .collect()
    }
    assert len(out) == 5
    for r in out:
        t, n = exact[r["o_orderpriority"]]
        assert r["est_within_ci"] is True
        assert abs(r["est_total"] - t) / t < 0.15
        # sample size within a loose binomial band around n/10
        assert abs(r["n_sampled"] - n / 10) < 4 * (n * 0.1 * 0.9) ** 0.5
        assert r["ci3_halfwidth"] > 0.0


def test_sequence_pattern_support_planted(spark):
    """Hand-enumerable histories: support counts must match exact
    subsequence containment, including the gap-insensitive case the
    transition matrix misses and the b-inside-window rule for length 3."""
    from covid_19_data_engineering_spark.operators.seqmine import (
        sequence_pattern_support,
    )

    rows = [
        # user 1: view -> click -> purchase (all patterns present)
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # user 2: view -> purchase (click never between: no v,c,p)
        (2, "2024-01-01 11:00:00", "view"),
        (2, "2024-01-01 11:10:00", "purchase"),
        # user 3: click BEFORE view, then purchase — (view, click) absent,
        # (click, purchase) present, (view, purchase) present,
        # (click, view, purchase)? needs a view between click and purchase: yes
        (3, "2024-01-01 12:00:00", "click"),
        (3, "2024-01-01 12:05:00", "view"),
        (3, "2024-01-01 12:10:00", "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_type string") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = {}
    for r in sequence_pattern_support(ev).collect():
        out[(r["pattern_len"], r["a"], r["b"], r["c"])] = r["support"]

    assert out[(2, "view", "click", None)] == 1          # only user 1
    assert out[(2, "click", "purchase", None)] == 2      # users 1, 3
    assert out[(2, "view", "purchase", None)] == 3       # all users
    assert out[(3, "view", "click", "purchase")] == 1   # user 1 only
    assert out[(3, "click", "view", "purchase")] == 1   # user 3 only
    assert (3, "view", "click", "click") not in out     # no double click
    # gap-insensitivity: user 2's view->purchase has no adjacency
    assert out[(2, "view", "purchase", None)] >= out[(2, "view", "click", None)]
    # single occurrence never supports (t, t)
    assert (2, "purchase", "purchase", None) not in out


def test_markov_removal_attribution_hand_computed(spark):
    """Three planted journeys solvable by hand:
      u1: view -> click -> [purchase]   u2: view -> (end)   u3: click -> [purchase]
    p(click)=1, p(view)=1/2, p(START)=2/3. Remove view: p(START)=1/3 ->
    effect 1/2. Remove click: p(START)=0 -> effect 1. Shares 1/3 : 2/3."""
    from covid_19_data_engineering_spark.operators.attribution import (
        markov_removal_attribution,
    )

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view", 1.0),
        (2, 1, "2024-01-01 10:01:00", "click", 1.0),
        (3, 1, "2024-01-01 10:02:00", "purchase", 5.0),
        (4, 2, "2024-01-01 11:00:00", "view", 1.0),
        (5, 3, "2024-01-01 12:00:00", "click", 1.0),
        (6, 3, "2024-01-01 12:01:00", "purchase", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).select("event_id", "user_id",
             F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    out = {r["channel"]: r for r in markov_removal_attribution(ev).collect()}
    assert set(out) == {"view", "click"}
    UNIT = 1_000_000_000_000
    assert out["view"]["p_full_units"] == out["click"]["p_full_units"] == 666_666_666_666
    assert out["view"]["p_removed_units"] == 333_333_333_333
    assert out["click"]["p_removed_units"] == 0
    assert out["view"]["removal_units"] == 500_000
    assert out["click"]["removal_units"] == 1_000_000
    assert out["view"]["attribution_share"] == 0.333333
    assert out["click"]["attribution_share"] == 0.666667
    assert UNIT  # document the fixed-point scale used above


def test_markov_removal_zero_touch_and_share_sum(spark):
    """A purchase with no preceding channel events contributes the
    START->CONV edge (raising baseline conversion) without crediting any
    channel; shares always normalize to ~1."""
    from covid_19_data_engineering_spark.operators.attribution import (
        markov_removal_attribution,
    )

    rows = [
        (1, 1, "2024-01-01 10:00:00", "purchase", 3.0),   # zero-touch
        (2, 2, "2024-01-01 11:00:00", "view", 1.0),
        (3, 2, "2024-01-01 11:05:00", "purchase", 4.0),
        (4, 3, "2024-01-01 12:00:00", "view", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).select("event_id", "user_id",
             F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    out = {r["channel"]: r for r in markov_removal_attribution(ev).collect()}
    assert set(out) == {"view"}
    # full: START edges: ->CONV (u1), ->view (u2, u3); view->CONV, view->NULL
    # p(view)=1/2, p(START)=(1 + 1/2 + 1/2)/3 = 2/3; removed view: 1/3
    assert out["view"]["p_full_units"] == 666_666_666_666
    assert out["view"]["p_removed_units"] == 333_333_333_333
    assert out["view"]["attribution_share"] == 1.0


def test_shapley_attribution_hand_computed(spark):
    """k=2 REVENUE game solved by hand (purchase value 5.0 = 500 cents,
    SHAP_UNIT=1e6): v({v}) = 250e6 (one of two members buys), v({c}) =
    500e6, v({v,c}) = 250e6, v(empty) = 0 (group absent).
    phi_view = 1/2*v({v}) + 1/2*(v({v,c}) - v({c})) = 0,
    phi_click = 1/2*v({c}) + 1/2*(v({v,c}) - v({v})) = 250e6."""
    from covid_19_data_engineering_spark.operators.attribution import (
        shapley_attribution,
    )

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view", 1.0),
        (2, 1, "2024-01-01 10:01:00", "purchase", 5.0),
        (3, 2, "2024-01-01 11:00:00", "view", 1.0),
        (4, 3, "2024-01-01 12:00:00", "click", 1.0),
        (5, 3, "2024-01-01 12:01:00", "purchase", 5.0),
        (6, 4, "2024-01-01 13:00:00", "view", 1.0),
        (7, 4, "2024-01-01 13:01:00", "click", 1.0),
        (8, 4, "2024-01-01 13:02:00", "purchase", 5.0),
        (9, 5, "2024-01-01 14:00:00", "click", 1.0),
        (10, 5, "2024-01-01 14:01:00", "view", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).select("event_id", "user_id",
             F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    out = {r["channel"]: r for r in shapley_attribution(ev).collect()}
    assert set(out) == {"view", "click"}
    assert out["view"]["phi_units"] == 0
    assert out["click"]["phi_units"] == 250_000_000
    assert out["view"]["attribution_share"] == 0.0
    assert out["click"]["attribution_share"] == 1.0


def _random_journeys(seed: int, n_users: int = 12):
    """Seeded random event histories over 3 channels + purchase."""
    import random

    rng = random.Random(seed)
    rows, eid = [], 0
    for u in range(1, n_users + 1):
        n = rng.randint(1, 6)
        for i in range(n):
            t = rng.choice(["view", "click", "signup"])
            rows.append((eid, u, f"2024-01-01 {10 + u:02d}:{i:02d}:00", t, 1.0))
            eid += 1
        if rng.random() < 0.5:
            rows.append((eid, u, f"2024-01-01 {10 + u:02d}:{n:02d}:00",
                         "purchase", round(rng.uniform(1, 50), 2)))
            eid += 1
    return rows


def _trunc_div(a: int, b: int) -> int:
    """Both engines (Spark div, DuckDB //) truncate toward zero; Python
    // floors — replicate the engines."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _brute_shapley(rows):
    """Exact Shapley by full-lattice enumeration of the observed-coalition
    REVENUE game, in the operator's integer fixed point (SHAP_UNIT
    micro-cents, truncating division)."""
    import itertools
    import math
    from collections import defaultdict

    UNIT = 1_000_000
    first_p, touched = {}, defaultdict(set)
    revenue = defaultdict(int)
    for _, u, ts, t, v_ in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        if t == "purchase":
            first_p.setdefault(u, ts)
            revenue[u] += round(v_ * 100)
    for _, u, ts, t, _v in rows:
        if t != "purchase" and (u not in first_p or ts < first_p[u]):
            touched[u].add(t)
    users = sorted({r[1] for r in rows})
    channels = sorted({c for s in touched.values() for c in s})
    k = len(channels)
    groups = defaultdict(lambda: [0, 0])
    for u in users:
        key = frozenset(touched.get(u, ()))
        groups[key][0] += 1
        groups[key][1] += revenue.get(u, 0)
    v = {s: _trunc_div(cv * UNIT, n) for s, (n, cv) in groups.items()}
    phi = {}
    for ch in channels:
        total = 0
        rest = [c for c in channels if c != ch]
        for r in range(len(rest) + 1):
            for S in itertools.combinations(rest, r):
                w = math.factorial(len(S)) * math.factorial(k - len(S) - 1)
                total += w * (v.get(frozenset(S) | {ch}, 0)
                              - v.get(frozenset(S), 0))
        phi[ch] = _trunc_div(total, math.factorial(k))
    return phi


def test_shapley_matches_bruteforce_on_seeded_random_games(spark):
    """The linearity shortcut must equal full-lattice Shapley enumeration
    exactly (same integer fixed point) on seeded random journey sets."""
    from covid_19_data_engineering_spark.operators.attribution import (
        shapley_attribution,
    )

    for seed in (7, 21, 99):
        rows = _random_journeys(seed)
        ev = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts string, event_type string, value double",
        ).select("event_id", "user_id",
                 F.col("ts").cast("timestamp").alias("ts"),
                 "event_type", "value")
        got = {r["channel"]: r["phi_units"]
               for r in shapley_attribution(ev).collect()}
        expected = _brute_shapley(rows)
        assert got == expected, f"seed {seed}: {got} != {expected}"


def test_markov_removal_converges_to_exact_absorption(spark):
    """The 16-round integer fixed point must sit within truncation
    distance of the EXACT absorption probability (numpy linear solve of
    (I - Q) p = b) for the full chain on seeded random journeys."""
    import numpy as np

    from covid_19_data_engineering_spark.operators.attribution import (
        markov_removal_attribution,
        _journey_edges,
    )

    for seed in (7, 99):
        rows = _random_journeys(seed)
        ev = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts string, event_type string, value double",
        ).select("event_id", "user_id",
                 F.col("ts").cast("timestamp").alias("ts"),
                 "event_type", "value")
        edges = {(r["s"], r["t"]): r["n"]
                 for r in _journey_edges(ev).collect()}
        states = sorted({s for s, _ in edges} - {"CONV", "NULL_END"})
        idx = {s: i for i, s in enumerate(states)}
        r_tot = {s: sum(n for (s2, _), n in edges.items() if s2 == s)
                 for s in states}
        Q = np.zeros((len(states), len(states)))
        b = np.zeros(len(states))
        for (s, t), n in edges.items():
            p = n / r_tot[s]
            if t == "CONV":
                b[idx[s]] += p
            elif t in idx:
                Q[idx[s], idx[t]] += p
        exact = np.linalg.solve(np.eye(len(states)) - Q, b)
        out = markov_removal_attribution(ev).collect()
        p_full = out[0]["p_full_units"] / 1e12
        # 16 rounds of a substochastic chain: remaining mass <= rho^16
        assert abs(p_full - exact[idx["START"]]) < 0.02, (
            f"seed {seed}: {p_full} vs {exact[idx['START']]}")


def test_golden_records_survivorship(spark):
    """Planted three-record entity: transitive closure via the shared
    block, survivorship rules (type mode with lexicographic tiebreak,
    min size, max price), singletons excluded."""
    from covid_19_data_engineering_spark.operators.linkage import (
        golden_records,
    )

    rows = [
        # entity A: 1-2 linked (full agreement), 2-3 linked (name+size),
        # 1-3 only via transitivity
        (1, "cold widget", "Brand#1", "ECONOMY", 10, 90.0),
        (2, "cold widget", "Brand#1", "ECONOMY", 11, 95.0),
        (3, "cold widget", "Brand#1", "PROMO", 12, 80.0),
        # singleton in another block
        (9, "old gear", "Brand#3", "ECONOMY", 5, 10.0),
        # a weak pair that must NOT link (all fields disagree)
        (20, "hot bolt", "Brand#2", "STANDARD", 1, 5.0),
        (21, "red bolt", "Brand#2", "PROMO", 40, 6.0),
        # diverse fillers: shrink the u-probabilities so field agreement
        # is informative (tiny corpora otherwise make every u huge and
        # every weight small)
        (30, "blue cog", "Brand#4", "DELUXE", 20, 1.0),
        (31, "green cam", "Brand#5", "BUDGET", 25, 1.0),
        (32, "grey pin", "Brand#6", "CUSTOM", 30, 1.0),
        (33, "pink rod", "Brand#7", "SMALL", 35, 1.0),
        (34, "black nut", "Brand#8", "LARGE", 45, 1.0),
        (35, "white cap", "Brand#9", "MEDIUM", 50, 1.0),
        (36, "brown fan", "Brand#10", "XL", 2, 1.0),
        (37, "violet rim", "Brand#11", "XS", 7, 1.0),
    ]
    parts = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    out = golden_records(parts).collect()
    assert len(out) == 1
    g = out[0]
    assert g["golden_id"] == 1
    assert g["cluster_size"] == 3
    assert g["noun"] == "widget" and g["brand"] == "Brand#1"
    # mode of {ECONOMY: 2, PROMO: 1}
    assert g["canonical_type"] == "ECONOMY"
    assert g["min_size"] == 10
    assert g["max_price"] == 95.0


def test_events_dedup_streamed_collapses_doubled_stream(spark):
    """The registered streamed-dedup twin reads the file source twice
    (every event arrives exactly twice) and must reduce back to one row
    per event: the per-type rollup equals the batch aggregate over the
    ORIGINAL events, counts not doubled."""
    import __spark_entry__ as e
    from covid_19_data_engineering_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    out = {r["event_type"]: r
           for r in e.queries()["events_dedup_streamed"](spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r
        for r in load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert set(out) == set(exact)
    for t, r in exact.items():
        assert out[t]["n_events"] == r["n_events"], t
        assert out[t]["total_value"] == r["total_value"], t


def test_dp_release_clamps_and_replays_noise_exactly(spark):
    """The Laplace draw replays bit-for-bit from the md5 formula (the
    mechanism's determinism contract), contributions clamp at the cap
    BEFORE aggregation, and post-processing floors counts at zero."""
    import hashlib
    import math

    from covid_19_data_engineering_spark.operators.privacy import (
        DP_EPSILON,
        DP_VALUE_CAP,
        _DP_TAG,
        dp_noisy_release,
    )

    def lap(key: str, b: float) -> float:
        h = hashlib.md5((key + _DP_TAG).encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 4294967296.0
        raw = b * math.log(2.0 * u) if u < 0.5 else -b * math.log(2.0 * (1.0 - u))
        return round(raw, 6)

    rows = [
        (1, 1, "P1", 20000.0, "2024-01-01 00:00:00", "HIGH"),  # above cap
        (2, 2, "P1", 100.0, "2024-01-02 00:00:00", "HIGH"),
        (3, 3, "P2", 50.0, "2024-01-03 00:00:00", "LOW"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    out = {r["o_orderpriority"]: r for r in dp_noisy_release(orders).collect()}
    b_count, b_sum = 2.0 / DP_EPSILON, 2.0 * DP_VALUE_CAP / DP_EPSILON
    # HIGH: clamped sum = 10000 + 100; count = 2
    exp_sum = round(10100.0 + lap("HIGH|sum", b_sum), 2)
    exp_cnt = max(int(round(2 + lap("HIGH|count", b_count))), 0)
    assert out["HIGH"]["noisy_sum"] == exp_sum
    assert out["HIGH"]["noisy_count"] == exp_cnt
    exp_sum_low = round(50.0 + lap("LOW|sum", b_sum), 2)
    assert out["LOW"]["noisy_sum"] == exp_sum_low
    assert out["LOW"]["noisy_count"] >= 0
    for r in out.values():
        assert r["epsilon"] == DP_EPSILON
        assert r["count_b"] == b_count and r["sum_b"] == b_sum


def test_phrase_search_consecutive_only(spark):
    """Phrase match requires CONSECUTIVE tokens in order: 'hash join'
    must not match 'hash x join', 'join hash', or either word alone;
    multiple occurrences count and first_pos is the earliest."""
    from covid_19_data_engineering_spark.operators.retrieval import (
        phrase_search,
    )

    rows = [
        (1, "a hash join b hash join", "en", "web"),   # two hits, pos 1 and 4
        (2, "hash x join", "en", "web"),               # gap: no hit
        (3, "join hash", "en", "web"),                 # wrong order: no hit
        (4, "hash", "en", "web"),                      # alone: no hit
        (5, "hash join", "en", "web"),                 # hit at 0
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in phrase_search(df).collect()}
    assert set(out) == {1, 5}
    assert out[1]["n_hits"] == 2 and out[1]["first_pos"] == 1
    assert out[5]["n_hits"] == 1 and out[5]["first_pos"] == 0


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    """The dynamicpruning subquery must appear in the fact scan's
    PartitionFilters (the DPP contract: non-selected years' partitions
    never open) and the result must equal the unpartitioned batch
    aggregate."""
    from covid_19_data_engineering_spark.operators.layout import (
        RECENT_YEAR_FROM,
        dpp_recent_year_revenue,
    )
    from covid_19_data_engineering_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    df = dpp_recent_year_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    got = {r["order_year"]: (r["n_orders"], r["revenue"]) for r in df.collect()}
    exact = {
        r["y"]: (r["n"], r["rev"])
        for r in load_table(spark, "orders", sf_dir)
        .where(F.year("o_orderdate") >= RECENT_YEAR_FROM)
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .collect()
    }
    assert got == exact
    assert set(got) == {1999, 2000, 2001}


def test_data_contract_report_flags_planted_violations(spark):
    """Planted violations flip exactly the right rules: a null custkey, a
    duplicate orderkey, a bad status, an out-of-range price, an orphan
    custkey, stale dates, and a tiny row count."""
    from covid_19_data_engineering_spark.operators.integrity import (
        data_contract_report,
    )

    orders = spark.createDataFrame(
        [
            (1, 10, "F", 100.0, "1998-01-01"),
            (1, 10, "O", 200.0, "1998-02-01"),      # duplicate key
            (2, None, "O", 300.0, "1998-03-01"),    # null custkey
            (3, 99, "X", 400.0, "1998-04-01"),      # bad status + orphan 99
            (4, 10, "P", -5.0, "1998-05-01"),       # price out of range
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             F.col("o_orderdate").cast("timestamp").alias("o_orderdate"))
    customer = spark.createDataFrame(
        [(10, "Customer#10", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    out = {r["rule"]: r for r in data_contract_report(orders, customer).collect()}
    assert len(out) == 7
    assert not out["not_null:o_custkey"]["passed"]
    assert out["not_null:o_custkey"]["metric"] == 0.2
    assert not out["unique:o_orderkey"]["passed"]
    assert out["unique:o_orderkey"]["metric"] == 1.0
    assert not out["accepted_values:o_orderstatus['F', 'O', 'P']"]["passed"]
    assert not out["range:o_totalprice(0,1e6]"]["passed"]
    assert not out["referential:o_custkey->customer"]["passed"]
    # orphans: custkey 99 AND the NULL custkey — both engines agree a
    # null key is an orphan (Spark left_anti keeps never-matching null
    # keys; DuckDB NOT EXISTS is true when no row matches) -> 2/5
    assert out["referential:o_custkey->customer"]["metric"] == 0.4
    assert not out["freshness:max_order_year"]["passed"]   # max year 1998
    assert not out["volume:min_rows"]["passed"]            # 5 < 100
    # and on the real gate data every rule passes
    from covid_19_data_engineering_spark.sources.tables import load_table
    real = data_contract_report(
        load_table(spark, "orders", "/root/testdata/sf0.001"),
        load_table(spark, "customer", "/root/testdata/sf0.001"))
    assert all(r["passed"] for r in real.collect())


def test_median_ci_brackets_and_matches_sorted_ranks(spark):
    """values_at_ranks returns EXACT order statistics (verified against a
    plain python sort) and the CI ranks bracket the median with the
    documented coverage shape."""
    import math
    import random

    from covid_19_data_engineering_spark.operators.quantiles import (
        median_ci_ranks,
        values_at_ranks,
    )

    rng = random.Random(5)
    vals = [round(rng.uniform(1, 1000), 2) for _ in range(501)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    n = len(vals)
    r_lo, r_med, r_hi = median_ci_ranks(n)
    assert 1 <= r_lo < r_med < r_hi <= n
    out = {r["stat"]: r for r in values_at_ranks(
        df, "x", [("ci95_lo", r_lo), ("median", r_med), ("ci95_hi", r_hi)]
    ).collect()}
    s = sorted(vals)
    assert out["ci95_lo"]["value"] == s[r_lo - 1]
    assert out["median"]["value"] == s[r_med - 1]
    assert out["ci95_hi"]["value"] == s[r_hi - 1]
    assert out["ci95_lo"]["value"] <= out["median"]["value"] <= out["ci95_hi"]["value"]
    # half-width follows the sqrt(n) law
    assert (r_hi - r_lo) <= 2 * (1.96 * math.sqrt(n) / 2) + 3

"""Planted-case semantics for the round-4 operators: duplicated-span
profiling, fixed-point PageRank, deterministic k-means, cosine range
search. Oracle hash-parity is covered by tools/driver_gate.py; these pin
the SEMANTICS on corpora constructed so the right answer is known by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from covid_19_data_engineering_spark.operators.graphs import (
    UNIT,
    copurchase_edges,
    pagerank,
)
from covid_19_data_engineering_spark.operators.kmeans import kmeans_stats
from covid_19_data_engineering_spark.operators.similarity import range_search
from covid_19_data_engineering_spark.operators.spans import (
    SPAN_K,
    dup_span_profile,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestDupSpans:
    def test_planted_shared_substring(self, spark):
        shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
        docs = _docs(spark, [
            f"a1 a2 a3 {shared} a4 a5 a6",
            f"b1 b2 {shared} b3 b4 b5 b6 b7",
            "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14",
        ])
        out = {r["doc_id"]: r for r in dup_span_profile(docs).collect()}
        # a 12-token shared substring = 12 - K + 1 = 5 consecutive dup grams
        # -> span reported as 5 + K - 1 = 12 tokens, in BOTH docs
        assert out[0]["longest_dup_span"] == 12
        assert out[1]["longest_dup_span"] == 12
        assert out[0]["dup_grams"] == 12 - SPAN_K + 1
        # the unique doc shares nothing
        assert out[2]["dup_grams"] == 0
        assert out[2]["longest_dup_span"] == 0
        assert not out[2]["flag_dup_heavy"]

    def test_within_doc_repeat_not_dup(self, spark):
        phrase = " ".join(f"p{i}" for i in range(SPAN_K))
        docs = _docs(spark, [
            f"{phrase} x1 x2 {phrase}",  # repeats only within itself
            "z1 z2 z3 z4 z5 z6 z7 z8 z9",
        ])
        out = {r["doc_id"]: r for r in dup_span_profile(docs).collect()}
        # cross-DOC frequency counts distinct docs: a phrase repeated inside
        # one document is not a duplicate span
        assert out[0]["dup_grams"] == 0

    def test_short_doc_zero_grams(self, spark):
        docs = _docs(spark, ["one two three", "a b c d e f g h i j"])
        out = {r["doc_id"]: r for r in dup_span_profile(docs).collect()}
        assert out[0]["n_grams"] == 0
        assert out[0]["longest_dup_span"] == 0
        assert out[1]["n_grams"] == 10 - SPAN_K + 1


class TestPageRank:
    def _edges(self, spark, pairs):
        sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(sym, "src long, dst long")

    def test_hub_outranks_leaves(self, spark):
        # star: 1 — {2,3,4}
        pr = {r["part"]: r["units"]
              for r in pagerank(self._edges(spark, [(1, 2), (1, 3), (1, 4)])).collect()}
        assert pr[1] > pr[2]
        assert pr[2] == pr[3] == pr[4]  # symmetric leaves tie exactly

    def test_mass_conserved_within_truncation(self, spark):
        pr = pagerank(self._edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)]))
        total = pr.agg(F.sum("units")).collect()[0][0]
        # integer floor-div truncation only ever LOSES units, a few per node
        # per iteration — total stays within a hair under 1.0
        assert 0.999 * UNIT < total <= UNIT

    def test_edges_blocked_on_order(self, spark):
        li = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 10), (2, 11), (2, 12)],
            "l_orderkey long, l_partkey long",
        )
        edges = copurchase_edges(li).collect()
        got = {(r["src"], r["dst"]) for r in edges}
        # order 1 links 10-11 (the duplicate line collapses), order 2 links
        # 11-12; no 10-12 edge (never share an order)
        assert got == {(10, 11), (11, 10), (11, 12), (12, 11)}


class TestKMeans:
    def test_planted_clusters_separate(self, spark):
        import random
        rng = random.Random(7)
        rows = []
        # two tight blobs around +1 and -1 in all 64 dims
        for vid in range(40):
            center = 1.0 if vid % 2 == 0 else -1.0
            rows.append(
                (vid, [center + rng.uniform(-0.05, 0.05) for _ in range(64)])
            )
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        stats = kmeans_stats(emb, k=2).collect()
        sizes = sorted(r["n_members"] for r in stats)
        # seeds are vec_ids 0 (+blob) and 1 (-blob): each captures its blob
        assert sizes == [20, 20]
        for r in stats:
            # within-blob sq-distance: 64 dims x (<=0.1)^2 -> far below the
            # between-blob distance of 64 x 4
            assert r["avg_sqdist"] < 1.0

    def test_sizes_cover_corpus(self, spark):
        sf = "/root/testdata/sf0.001"
        from covid_19_data_engineering_spark.sources.tables import load_table
        emb = load_table(spark, "embeddings", sf)
        stats = kmeans_stats(emb).collect()
        assert sum(r["n_members"] for r in stats) == emb.count()


class TestRangeSearch:
    def test_radius_contract(self, spark):
        base = [1.0] * 64
        near = [1.0] * 63 + [0.9]           # cosine ~ 0.9998
        ortho = [1.0, -1.0] * 32            # cosine 0
        corpus = spark.createDataFrame(
            [(1, base), (2, near), (3, ortho)],
            "vec_id long, embedding array<double>",
        )
        queries = spark.createDataFrame(
            [(1, base)], "query_id long, q_embedding array<double>"
        )
        got = {r["vec_id"]: r["cosine"]
               for r in range_search(corpus, queries, threshold=0.5).collect()}
        assert set(got) == {2}              # self excluded, ortho below radius
        assert got[2] > 0.99

    def test_result_size_data_driven(self, spark):
        # radius 1.01 excludes everything; radius -1 admits everything
        vecs = [(i, [float(i + d) for d in range(64)]) for i in range(1, 6)]
        corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(
            [(99, vecs[0][1])], "query_id long, q_embedding array<double>"
        )
        assert range_search(corpus, queries, threshold=1.01).count() == 0
        assert range_search(corpus, queries, threshold=-1.0).count() == 5


class TestBM25:
    def test_term_frequency_ranks(self, spark):
        docs = spark.createDataFrame([
            (1, "spark spark spark filler filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
        ], "doc_id long, text string")
        from covid_19_data_engineering_spark.operators.retrieval import bm25_topk
        got = bm25_topk(docs, terms=("spark",), k=10).collect()
        ids = [r["doc_id"] for r in got]
        # zero-match doc filtered out; heavier tf ranks first (equal dl)
        assert ids == [1, 2]
        assert got[0]["bm25"] > got[1]["bm25"] > 0

    def test_length_normalization(self, spark):
        # same tf, longer doc scores lower (b=0.75 length penalty)
        docs = spark.createDataFrame([
            (1, "spark " + "x " * 5 + "end"),
            (2, "spark " + "x " * 50 + "end"),
        ], "doc_id long, text string")
        from covid_19_data_engineering_spark.operators.retrieval import bm25_topk
        got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, terms=("spark",)).collect()}
        assert got[1] > got[2]


class TestTriangles:
    def _li(self, spark, baskets):
        rows = [(ok, pk) for ok, parts in enumerate(baskets) for pk in parts]
        return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    def test_planted_triangle(self, spark):
        from covid_19_data_engineering_spark.operators.graphs import (
            support_pairs, triangle_stats)
        # each pair of {1,2,3} co-occurs in 2 orders (meets support=2);
        # {4,5} co-occurs twice but closes no triangle
        baskets = [[1, 2, 3], [1, 2, 3], [4, 5], [4, 5]]
        out = triangle_stats(support_pairs(self._li(spark, baskets))).collect()[0]
        assert out["n_triangles"] == 1
        assert out["n_edges"] == 4          # (1,2) (1,3) (2,3) (4,5)
        assert out["n_nodes"] == 5
        # wedges: node1 C(2,2)=1, node2 1, node3 1, nodes 4,5 deg1 -> 0
        assert out["n_wedges"] == 3
        assert out["global_clustering"] == 1.0

    def test_support_filter_drops_one_off(self, spark):
        from covid_19_data_engineering_spark.operators.graphs import (
            support_pairs, triangle_stats)
        # triangle exists but every edge appears in only ONE order
        out = triangle_stats(support_pairs(self._li(spark, [[1, 2, 3]]))).collect()[0]
        assert out["n_edges"] == 0
        assert out["n_triangles"] == 0

    def test_degree_orientation_kills_hub_wedges(self, spark):
        from covid_19_data_engineering_spark.operators.graphs import (
            degree_oriented_edges, oriented_wedge_candidates, support_pairs,
            triangle_stats)
        # hub part 0 (lowest id) co-occurs with 40 leaves, each edge in 2
        # orders; leaves never co-occur with each other -> 0 triangles.
        # id-orientation would put all 40 edges OUT of the hub and emit
        # C(40,2)=780 wedge candidates; degree-orientation points every
        # edge INTO the hub (leaves have degree 1), emitting ZERO.
        baskets = []
        for leaf in range(1, 41):
            baskets += [[0, leaf], [0, leaf]]
        li = self._li(spark, baskets)
        pairs = support_pairs(li)
        oriented = degree_oriented_edges(pairs)
        assert oriented_wedge_candidates(oriented).count() == 0
        out = triangle_stats(pairs).collect()[0]
        assert out["n_triangles"] == 0
        assert out["n_edges"] == 40
        assert out["n_wedges"] == 780  # C(40,2) at the hub — a degree fact


class TestRRF:
    def test_agreement_wins(self, spark):
        from covid_19_data_engineering_spark.operators.retrieval import (
            RRF_K, RRF_UNIT, rrf_fuse)
        a = spark.createDataFrame(
            [(1, 1, 100), (1, 2, 200), (1, 3, 300)],
            "query_id long, rank long, vec_id long")
        b = spark.createDataFrame(
            [(1, 1, 200), (1, 2, 400)],
            "query_id long, rank long, vec_id long")
        got = rrf_fuse(a, b).collect()
        by_rank = {r["fused_rank"]: r for r in got}
        # vec 200: rank 2 in a + rank 1 in b beats vec 100 (rank 1, one list)
        assert by_rank[1]["vec_id"] == 200
        assert by_rank[1]["rrf_units"] == RRF_UNIT // (RRF_K + 2) + RRF_UNIT // (RRF_K + 1)
        assert by_rank[2]["vec_id"] == 100
        # single-list docs still present (full outer, not inner)
        assert {r["vec_id"] for r in got} == {100, 200, 300, 400}

    def test_tie_breaks_on_vec_id(self, spark):
        from covid_19_data_engineering_spark.operators.retrieval import rrf_fuse
        a = spark.createDataFrame(
            [(1, 1, 500), (1, 1, 0)][:1], "query_id long, rank long, vec_id long")
        b = spark.createDataFrame(
            [(1, 1, 7)], "query_id long, rank long, vec_id long")
        got = rrf_fuse(a, b).collect()
        # equal units (rank 1 each, different lists) -> lower vec_id first
        assert [r["vec_id"] for r in got] == [7, 500]


class TestInterpolation:
    def test_linear_midpoint(self, spark):
        import datetime as dt
        from covid_19_data_engineering_spark.operators.interpolate import (
            interpolate_values)
        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        events = spark.createDataFrame(
            [(1, t(0), 7, "x", 10.0, None),
             (10, t(10), 7, "x", 999.0, None),   # masked (id % 10 == 0)
             (3, t(40), 7, "x", 40.0, None)],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")
        got = interpolate_values(events).collect()
        assert len(got) == 1
        # 10s into a 40s gap from 10.0 to 40.0 -> 10 + 30 * 0.25 = 17.5
        assert got[0]["event_id"] == 10
        assert got[0]["interp_value"] == 17.5

    def test_boundary_gap_is_null(self, spark):
        import datetime as dt
        from covid_19_data_engineering_spark.operators.interpolate import (
            interpolate_values)
        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        events = spark.createDataFrame(
            [(20, t(0), 7, "x", 5.0, None),      # masked, nothing before
             (1, t(10), 7, "x", 10.0, None)],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")
        got = interpolate_values(events).collect()
        assert len(got) == 1 and got[0]["interp_value"] is None


class TestSkewReport:
    def test_planted_hot_key(self, spark):
        from covid_19_data_engineering_spark.operators.interpolate import (
            skew_report)
        rows = [(0,)] * 90 + [(k,) for k in range(1, 11)]  # hot key 0
        df = spark.createDataFrame(rows, "k long")
        out = skew_report([(df, "k", "t.k")]).collect()[0]
        assert out["n_keys"] == 11
        assert out["n_rows"] == 100
        assert out["max_per_key"] == 90
        assert out["p50_per_key"] == 1.0
        assert out["skew_ratio"] == 90.0


class TestFuzzyJoin:
    def test_blocked_levenshtein(self, spark):
        from covid_19_data_engineering_spark.operators.fuzzy import (
            fuzzy_name_pairs)
        df = spark.createDataFrame(
            [(1, "red widget"), (2, "rad widget"), (3, "red widget"),
             (4, "red gizmo"), (5, "completely different widget")],
            "id long, name string")
        got = fuzzy_name_pairs(df, "name", "id", max_dist=2).collect()
        assert len(got) == 1
        r = got[0]
        # only the same-block (widget) 1-edit pair survives; "red gizmo"
        # is in another block, the long name is > 2 edits away
        assert (r["name_a"], r["name_b"]) == ("rad widget", "red widget")
        assert r["lev_dist"] == 1
        # rows_* count source rows per distinct name (red widget x2)
        assert (r["rows_a"], r["rows_b"]) == (1, 2)

    def test_block_is_recall_lossy_by_design(self, spark):
        from covid_19_data_engineering_spark.operators.fuzzy import (
            fuzzy_name_pairs)
        # 1-edit pair whose NOUN differs -> different blocks -> no candidate
        df = spark.createDataFrame(
            [(1, "red widget"), (2, "red widgex")], "id long, name string")
        assert fuzzy_name_pairs(df, "name", "id").count() == 0

    def test_second_blocking_key_recovers_recall(self, spark):
        from covid_19_data_engineering_spark.operators.fuzzy import (
            fuzzy_name_pairs)
        # the noun-typo pair collides under the FIRST-token key instead;
        # the same-noun pair is found by both passes but kept once
        df = spark.createDataFrame(
            [(1, "red widget"), (2, "red widgex"), (3, "rad widget")],
            "id long, name string")
        got = fuzzy_name_pairs(df, "name", "id",
                               blocks=("last", "first")).collect()
        pairs = {(r["name_a"], r["name_b"]) for r in got}
        assert ("red widget", "red widgex") in pairs
        assert ("rad widget", "red widget") in pairs
        assert len(got) == len(pairs)  # no duplicate pair rows


class TestABTest:
    def _events(self, spark, rows):
        import datetime as dt
        data = [(i, dt.datetime(2024, 1, 1, 0, 0, i % 60, i), u, t, 1.0, None)
                for i, (u, t) in enumerate(rows)]
        return spark.createDataFrame(
            data, "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")

    def test_known_counts_and_z_sign(self, spark):
        from covid_19_data_engineering_spark.operators.abtest import (
            ab_conversion_ztest)
        rows = []
        # cohort 0 (even users): 3 of 4 first-purchase; cohort 1: 1 of 4
        for u in range(8):
            first = "purchase" if (u % 2 == 0 and u < 6) or u == 1 else "view"
            rows.append((u, first))
            rows.append((u, "click"))  # later event, must not count
        out = ab_conversion_ztest(self._events(spark, rows)).collect()[0]
        assert (out["na"], out["xa"], out["nb"], out["xb"]) == (4, 3, 4, 1)
        assert out["rate_a"] == 0.75 and out["rate_b"] == 0.25
        assert out["z_stat"] > 0          # cohort A converts more
        assert not out["significant_5pct"]  # n=8 is far too small

    def test_saturated_experiment_yields_null_z(self, spark):
        from covid_19_data_engineering_spark.operators.abtest import (
            ab_conversion_ztest)
        rows = [(u, "purchase") for u in range(6)]
        out = ab_conversion_ztest(self._events(spark, rows)).collect()[0]
        # p0 = 1 -> zero pooled variance -> z undefined (NULL, not a crash)
        assert out["z_stat"] is None
        assert out["significant_5pct"] is None

    def test_saturated_case_oracle_parity(self, spark):
        """Round-4 ADVICE: the sf0.01 parity data never saturates (~20%
        conversion), so the engine/oracle agreement on the se=0 branch was
        unexercised — and the oracle's bare division relied on DuckDB's
        configuration-dependent div-by-zero behavior. Plant an all-convert
        experiment and run BOTH sides: the oracle (NULLIF-pinned) and the
        engine (try_divide) must each yield NULL z / NULL significance."""
        import duckdb

        from covid_19_data_engineering_spark.operators.abtest import (
            ab_conversion_ztest)
        from covid_19_data_engineering_spark.plans.registry import (
            REGISTRY, _ensure_loaded)

        _ensure_loaded()
        rows = [(u, "purchase") for u in range(6)]
        engine = ab_conversion_ztest(self._events(spark, rows)).collect()[0]

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT "
            "CAST(i AS BIGINT) AS event_id, "
            "TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts, "
            "CAST(i AS BIGINT) AS user_id, 'purchase' AS event_type, "
            "1.0 AS value, CAST(NULL AS VARCHAR) AS props "
            "FROM range(6) t(i)"
        )
        oracle = con.execute(REGISTRY["ab_conversion_ztest"].oracle).fetchone()
        ocols = [d[0] for d in con.description]
        orow = dict(zip(ocols, oracle))
        assert orow["z_stat"] is None and engine["z_stat"] is None
        assert orow["significant_5pct"] is None
        assert engine["significant_5pct"] is None
        assert (orow["na"], orow["xa"], orow["nb"], orow["xb"]) == (
            engine["na"], engine["xa"], engine["nb"], engine["xb"])


class TestStarComponents:
    def _labels(self, df):
        return {r["node"]: r["component"] for r in df.collect()}

    def test_equivalent_to_label_propagation(self, spark):
        """Both algorithms must produce identical (node, component) maps on
        a graph mixing chains, a clique, a singleton pair, and bridges."""
        import random

        from covid_19_data_engineering_spark.operators.clustering import (
            connected_components)

        rng = random.Random(11)
        edges = [(i, i + 1) for i in range(0, 8)]            # chain 0..8
        edges += [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]
        edges += [(30, 31)]
        edges += [(8, 20)]                                    # bridge
        edges += [(rng.randint(40, 60), rng.randint(40, 60)) for _ in range(30)]
        # planted self-loops (round-5 advisory): one on a connected node,
        # one on an otherwise-isolated node — all three algorithms must
        # cover BOTH (the star path's orientation filter used to drop the
        # isolated one entirely)
        edges += [(3, 3), (70, 70)]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        star = self._labels(connected_components(df, algorithm="star"))
        label = self._labels(connected_components(df, algorithm="label"))
        auto = self._labels(connected_components(df, algorithm="auto"))
        assert star == label == auto
        assert star[8] == 0 and star[24] == 0   # bridged chain+clique
        assert star[31] == 30
        assert star[70] == 70                   # self-loop-only singleton

    def test_auto_mode_correct_past_label_budget(self, spark):
        """A 200-node chain outlasts the auto mode's 6 label rounds; the
        star handoff on the contracted graph must still produce the exact
        closure (pure label propagation capped at 6 rounds would not)."""
        from covid_19_data_engineering_spark.operators.clustering import (
            connected_components)

        n = 200
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
        got = self._labels(connected_components(chain, algorithm="auto"))
        assert len(got) == n and set(got.values()) == {0}

    def test_long_chain_converges_in_log_rounds(self, spark):
        """Round-4 verdict #5 gate: a 1000-node chain has diameter 999 —
        min-label propagation would need 999 rounds (its 20-round budget
        silently under-merges); the star algorithm must finish inside
        ~log^2(n) rounds with every node labeled 0."""
        from covid_19_data_engineering_spark.operators.clustering import (
            star_components_with_rounds)

        n = 1000
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
        labels, rounds = star_components_with_rounds(chain)
        got = self._labels(labels)
        assert rounds <= 12, f"star CC took {rounds} rounds on a chain"
        assert len(got) == n
        assert set(got.values()) == {0}


class TestStoredSnapshotState:
    def test_stored_state_matches_derived(self, spark, tmp_path):
        """The persisted-state path must produce decisions identical to
        deriving the snapshot working set in-query, for the same split —
        and reading the state back must not touch snapshot text (the
        frames come from parquet, not the documents table)."""
        import pyspark.sql.functions as F

        from covid_19_data_engineering_spark.operators.clustering import (
            incremental_retention_manifest,
            read_snapshot_dedup_state,
            write_snapshot_dedup_state,
        )
        from covid_19_data_engineering_spark.sources.tables import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        snapshot = docs.where(F.col("doc_id") % 5 != 2)
        new = docs.where(F.col("doc_id") % 5 == 2)
        derived = sorted(
            map(tuple, incremental_retention_manifest(new, snapshot).collect())
        )
        state_dir = str(tmp_path / "state")
        write_snapshot_dedup_state(snapshot, state_dir)
        state = read_snapshot_dedup_state(spark, state_dir)
        stored = sorted(
            map(tuple,
                incremental_retention_manifest(new, snapshot_state=state).collect())
        )
        assert stored == derived and len(stored) == new.count()


class TestDupSpanScrub:
    def test_long_span_cut_short_match_kept(self, spark):
        from covid_19_data_engineering_spark.operators.spans import (
            dup_span_scrub)
        long_shared = " ".join(f"L{i}" for i in range(40))   # >= 30 tokens
        short_shared = " ".join(f"S{i}" for i in range(10))  # dup but short
        docs = _docs(spark, [
            f"a1 a2 {long_shared} a3 a4",
            f"b1 {long_shared} b2 b3 b4 b5",
            f"c1 c2 c3 {short_shared} c4 c5",
            f"d1 d2 {short_shared} d3 d4 d5",
        ])
        out = {r["doc_id"]: r for r in dup_span_scrub(docs).collect()}
        # the 40-token shared block is cut from both carriers
        assert out[0]["n_removed"] == 40
        assert out[1]["n_removed"] == 40
        # the short (10 < 30) shared phrase survives in full
        assert out[2]["n_removed"] == 0
        assert out[3]["n_removed"] == 0
        import hashlib
        # reconstruction check: doc 0 keeps exactly its unique tokens
        expect = hashlib.md5(b"a1 a2 a3 a4").hexdigest()
        assert out[0]["cleaned_fp"] == expect

    def test_fully_duplicated_doc_scrubs_to_empty(self, spark):
        from covid_19_data_engineering_spark.operators.spans import (
            dup_span_scrub)
        body = " ".join(f"w{i}" for i in range(35))
        docs = _docs(spark, [body, body])
        out = dup_span_scrub(docs).collect()
        import hashlib
        for r in out:
            assert r["n_removed"] == 35
            assert r["cleaned_fp"] == hashlib.md5(b"").hexdigest()


class TestShardManifest:
    def test_partition_of_corpus(self, spark):
        from covid_19_data_engineering_spark.operators.shards import (
            N_SHARDS, shard_manifest)
        from covid_19_data_engineering_spark.sources.tables import load_table
        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        m = shard_manifest(docs).collect()
        assert sum(r["n_docs"] for r in m) == docs.count()   # exact partition
        assert len(m) <= N_SHARDS
        assert all(r["n_docs"] > 0 for r in m)

    def test_assignment_stable_across_runs(self, spark):
        from covid_19_data_engineering_spark.operators.shards import (
            shard_manifest)
        docs = _docs(spark, [f"text number {i}" for i in range(50)])
        a = {r["shard_id"]: (r["n_docs"], r["min_doc_id"]) for r in shard_manifest(docs).collect()}
        b = {r["shard_id"]: (r["n_docs"], r["min_doc_id"]) for r in shard_manifest(docs).collect()}
        assert a == b


class TestIVFIncremental:
    def test_batch_routes_without_touching_snapshot(self, spark):
        from covid_19_data_engineering_spark.operators.similarity import (
            ivf_incremental_assign)
        from covid_19_data_engineering_spark.sources.tables import load_table
        import pyspark.sql.functions as F
        emb = load_table(spark, "embeddings", "/root/testdata/sf0.001") \
            .select("vec_id", "embedding")
        snap = emb.where(F.col("vec_id") < 250)
        batch = emb.where(F.col("vec_id") >= 250)
        rep = ivf_incremental_assign(snap, batch).collect()
        assert sum(r["n_snapshot"] for r in rep) == snap.count()
        assert sum(r["n_batch"] for r in rep) == batch.count()
        # growth report covers every cell of the frozen quantizer
        assert len(rep) == 16


class TestCrossOperatorInvariants:
    def test_scrub_fires_exactly_on_flagged_docs(self, spark):
        """profile and scrub share the run threshold: a doc loses tokens
        IFF the profiler flags it (longest_dup_span >= 30)."""
        from covid_19_data_engineering_spark.operators.spans import (
            dup_span_profile, dup_span_scrub)
        from covid_19_data_engineering_spark.sources.tables import load_table
        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        prof = {r["doc_id"]: r["flag_dup_heavy"]
                for r in dup_span_profile(docs).collect()}
        scrub = {r["doc_id"]: r["n_removed"]
                 for r in dup_span_scrub(docs).collect()}
        assert set(prof) == set(scrub)
        for d, flagged in prof.items():
            assert (scrub[d] > 0) == flagged, f"doc {d}"

    def test_pagerank_mass_and_floor_on_real_graph(self, spark):
        """Truncation only loses units: total <= UNIT, and every node
        keeps at least its damping base."""
        import pyspark.sql.functions as F
        from covid_19_data_engineering_spark.operators.graphs import (
            UNIT, copurchase_edges, pagerank)
        from covid_19_data_engineering_spark.sources.tables import load_table
        li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
        pr = pagerank(copurchase_edges(li))
        row = pr.agg(F.sum("units").alias("s"), F.min("units").alias("m"),
                     F.count("*").alias("n")).collect()[0]
        assert row["s"] <= UNIT
        assert row["s"] > 0.99 * UNIT
        base = (15 * (UNIT // row["n"])) // 100
        assert row["m"] >= base

    def test_rrf_of_identical_lists_preserves_order(self, spark):
        """Fusing a ranking with itself is a no-op on the order."""
        from covid_19_data_engineering_spark.operators.retrieval import rrf_fuse
        a = spark.createDataFrame(
            [(1, r, 100 + r) for r in range(1, 8)],
            "query_id long, rank long, vec_id long")
        got = rrf_fuse(a, a).collect()
        assert [r["vec_id"] for r in got] == [101, 102, 103, 104, 105, 106, 107]

    def test_triangle_census_agrees_with_id_orientation(self, spark):
        """The degree-ordered count must equal the naive id-oriented count
        (any acyclic orientation counts each triangle once)."""
        import random
        import pyspark.sql.functions as F
        from covid_19_data_engineering_spark.operators.graphs import (
            support_pairs, triangle_stats)
        rng = random.Random(11)
        baskets = []
        for _ in range(60):
            basket = rng.sample(range(12), rng.randint(2, 5))
            baskets.append(basket)
            baskets.append(basket)  # meet support >= 2
        rows = [(ok, pk) for ok, parts in enumerate(baskets) for pk in parts]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        pairs = support_pairs(li)
        got = triangle_stats(pairs).collect()[0]["n_triangles"]
        # naive reference: id-oriented wedge join
        e1 = pairs.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
        e2 = pairs.select(F.col("pa").alias("b2"), F.col("pb").alias("c"))
        naive = (e1.join(e2, F.col("b") == F.col("b2"))
                 .join(pairs, (F.col("a") == F.col("pa")) & (F.col("c") == F.col("pb")))
                 .count())
        assert got == naive and got > 0


class TestIntegrityReport:
    def test_planted_orphans_and_nulls(self, spark):
        from covid_19_data_engineering_spark.operators.integrity import (
            fk_edge_report)
        child = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, None), (5, 20)],
            "id long, fk long")
        parent = spark.createDataFrame([(10,), (20,)], "pk long")
        r = fk_edge_report(child, "fk", parent, "pk", "t.fk->p.pk").collect()[0]
        assert r["child_rows"] == 5
        assert r["non_null_keys"] == 4
        assert r["distinct_keys"] == 3      # 10, 99, 20
        assert r["orphan_rows"] == 1        # fk=99
        assert r["null_keys"] == 1

    def test_star_schema_is_clean(self, spark):
        from covid_19_data_engineering_spark.plans.registry import all_queries
        rows = all_queries()["referential_integrity_report"](
            spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 7
        for r in rows:
            assert r["orphan_rows"] == 0, r["fk_edge"]
            assert r["null_keys"] == 0, r["fk_edge"]


class TestLSHRangeSearch:
    def test_recall_vs_brute(self, spark):
        from covid_19_data_engineering_spark.operators.similarity import (
            default_queries, lsh_range_search, range_search)
        from covid_19_data_engineering_spark.sources.tables import load_table
        corpus = load_table(spark, "embeddings", "/root/testdata/sf0.01") \
            .select("vec_id", "embedding")
        qs = default_queries(corpus)
        brute = {(r["query_id"], r["vec_id"]): r["cosine"]
                 for r in range_search(corpus, qs).collect()}
        lsh = {(r["query_id"], r["vec_id"])
               for r in lsh_range_search(corpus, qs).collect()}
        assert lsh <= set(brute)               # no false positives
        assert len(lsh) / len(brute) >= 0.6    # overall recall floor

    def test_planted_near_dup_always_found(self, spark):
        # collision prob per table is (1-theta/pi)^4: ~0.09 at cos 0.32 but
        # ~1 as cos -> 1, so near-duplicates are found with certainty while
        # radius-edge matches may drop — the documented LSH contract
        from covid_19_data_engineering_spark.operators.similarity import (
            lsh_range_search)
        import random
        rng = random.Random(3)
        base = [rng.uniform(-1, 1) for _ in range(64)]
        near = [x + rng.uniform(-0.01, 0.01) for x in base]
        rows = [(1, base), (2, near)] + [
            (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(3, 60)
        ]
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(
            [(1, base)], "query_id long, q_embedding array<double>")
        got = {r["vec_id"] for r in
               lsh_range_search(corpus, queries, threshold=0.9).collect()}
        assert got == {2}


class TestRuleGate:
    def test_reasons_and_keep(self, spark):
        from covid_19_data_engineering_spark.operators.rules import rule_gate
        docs = spark.createDataFrame([
            (1, " ".join(f"s{i}" for i in range(10)), "a"),          # too few tokens
            (2, " ".join(["word"] * 30), "a"),                       # one token repeated
            (3, " ".join(f"w{i}" for i in range(30)), "a"),          # clean
            (4, " ".join(["x"] * 25), "b"),  # short tokens AND repetition
        ], "doc_id long, text string, source string")
        out = {r["doc_id"]: r for r in rule_gate(docs).collect()}
        assert out[1]["failed"] == ["min_tokens"]
        assert out[2]["failed"] == ["top_tok_frac"]
        assert out[3]["failed"] == [] and out[3]["keep"]
        assert out[4]["failed"] == ["mean_tok_len", "top_tok_frac"]
        assert not out[4]["keep"]

    def test_fixed_point_ratios_exact(self, spark):
        from covid_19_data_engineering_spark.operators.rules import rule_gate
        docs = spark.createDataFrame(
            [(1, " ".join(["abc"] * 10 + ["defghi"] * 10 + ["xy"] * 20), "s")],
            "doc_id long, text string, source string")
        r = rule_gate(docs).collect()[0]
        # 40 tokens, 10*3 + 10*6 + 20*2 = 130 chars -> 1000*130 div 40 = 3250
        assert r["n_tokens"] == 40
        assert r["mean_len_milli"] == 3250
        assert r["top_frac_milli"] == 500   # 'xy' x20 of 40

"""Round-12 additions: file-pruned MERGE/DELETE ("replace" commits that
carry untouched files by reference), NULL-predicate DELETE semantics,
Bloom-index survival across rewrites, scoped change-feed replay, and the
MMR small-corpus guards.

The headline contract (round-11 verdict #2): a 10-row merge on a
1000-file table must rewrite only the files whose key range/Bloom filter
can contain the touched keys — every other file is carried into the new
version BYTE-IDENTICAL (same path, same bytes, never rewritten).
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
import pytest

from covid_19_data_engineering_spark.sources.versioned import (
    _read_commit,
    _snapshot_files,
    current_version,
    delete_versioned,
    merge_versioned,
    read_change_feed,
    read_versioned,
    snapshot_pruned_files,
    table_bloom_cols,
    write_versioned,
)


def _md5(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def test_pruned_merge_carries_untouched_files_byte_identical(
        spark, tmp_path):
    """The verdict's exact shape: a 10-row merge on a 1000-file
    range-clustered table rewrites only the files whose [min, max] can
    hold the keys; >= 99% of files are carried by reference and stay
    byte-identical."""
    path = str(tmp_path / "big")
    base = (
        spark.range(100_000)
        .select(F.col("id").alias("k"),
                (F.col("id") * 17 % 1009).alias("v"))
        .repartitionByRange(1000, "k")  # ~100-row files, tight k ranges
    )
    v1 = write_versioned(base, path)
    files_v1 = _snapshot_files(path, v1)
    assert len(files_v1) == 1000
    before = {f: _md5(os.path.join(path, f)) for f in files_v1}

    keys = [5, 777, 12_345, 33_333, 54_321, 66_666, 77_007, 88_888,
            99_999, 100_500]  # 9 existing + 1 fresh insert
    updates = spark.createDataFrame(
        [(k, -1) for k in keys], "k long, v long")
    v2 = merge_versioned(spark, path, updates, key="k")

    commit = _read_commit(path, v2)
    assert commit["action"] == "replace"
    removed = set(commit["removed"])
    # 10 keys land in at most 10 distinct ~100-row range files
    assert 1 <= len(removed) <= 10
    carried = [f for f in files_v1 if f not in removed]
    assert len(carried) >= 990
    files_v2 = set(_snapshot_files(path, v2))
    assert set(carried) <= files_v2
    # carried files are the SAME paths with the SAME bytes
    for f in list(carried)[::97]:  # hash a spread sample, not 990 files
        assert _md5(os.path.join(path, f)) == before[f], f

    # semantics: dict-model equivalence on the touched keys
    got = {r["k"]: r["v"] for r in
           read_versioned(spark, path).where(
               F.col("k").isin(keys)).collect()}
    assert got == {k: -1 for k in keys}
    assert read_versioned(spark, path).count() == 100_001
    # time travel still reaches the pre-merge snapshot
    assert read_versioned(spark, path, version=v1).count() == 100_000


def test_pruned_merge_uses_bloom_when_ranges_interleave(spark, tmp_path):
    """Hash-interleaved layout defeats min/max pruning (every file spans
    the whole key range); the Bloom index still prunes the rewrite down
    to the files that actually contain the probed keys."""
    path = str(tmp_path / "bloomed")
    base = (
        spark.range(20_000)
        .select((F.col("id") * 7919 % 20_000).alias("k"),
                F.lit(0).cast("long").alias("v"))
        .repartition(64)
    )
    v1 = write_versioned(base, path, bloom_cols=["k"])
    files_v1 = _snapshot_files(path, v1)
    assert len(files_v1) == 64

    keys = [3, 7777, 19_999]
    updates = spark.createDataFrame([(k, 1) for k in keys],
                                    "k long, v long")
    v2 = merge_versioned(spark, path, updates, key="k")
    commit = _read_commit(path, v2)
    assert commit["action"] == "replace"
    # min/max alone would rewrite all 64; bloom narrows to the (<= 3)
    # containing files plus rare false positives
    assert len(commit["removed"]) <= 10
    got = {r["k"]: r["v"] for r in
           read_versioned(spark, path).where(
               F.col("k").isin(keys)).collect()}
    assert got == {k: 1 for k in keys}


def test_delete_keeps_null_evaluating_rows(spark, tmp_path):
    """Round-11 ADVICE medium: SQL DELETE removes rows where the
    predicate is TRUE; rows where it evaluates NULL (a NULL column under
    v = 'x') must SURVIVE."""
    path = str(tmp_path / "nullsafe")
    write_versioned(
        spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, None), (4, "x"), (5, None)],
            "k long, v string"),
        path)
    delete_versioned(spark, path, "v = 'x'")
    got = {(r["k"], r["v"]) for r in read_versioned(spark, path).collect()}
    assert got == {(2, "y"), (3, None), (5, None)}


def test_pruned_delete_rewrites_only_matching_files(spark, tmp_path):
    """DELETE's discovery scan (predicate pushed into the parquet scan)
    finds the files holding matching rows; only those become "removed" —
    the rest of a range-clustered table is carried by reference."""
    path = str(tmp_path / "deltable")
    base = (
        spark.range(10_000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
        .repartitionByRange(50, "k")
    )
    v1 = write_versioned(base, path)
    files_v1 = _snapshot_files(path, v1)
    v2 = delete_versioned(spark, path, "k BETWEEN 100 AND 299")
    commit = _read_commit(path, v2)
    assert commit["action"] == "replace"
    # 200 consecutive keys span ~2 of the 50 range files (+ boundaries)
    assert 1 <= len(commit["removed"]) <= 4
    assert commit["files_carried"] >= 46
    now = read_versioned(spark, path)
    assert now.where("k BETWEEN 100 AND 299").count() == 0
    assert now.count() == 9800
    assert read_versioned(spark, path, version=v1).count() == 10_000


def test_bloom_cols_survive_merge_delete_compact(spark, tmp_path):
    """Round-11 ADVICE low: a table built with bloom_cols must keep its
    point-lookup pruning after MERGE, DELETE, and OPTIMIZE — the rewrite
    paths re-read the recorded table property and re-index their new
    files."""
    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
    )

    path = str(tmp_path / "keepbloom")
    base = (
        spark.range(5000)
        .select((F.col("id") * 104729 % 5000).alias("k"),
                F.lit("a").alias("v"))
        .repartition(16)
    )
    write_versioned(base, path, bloom_cols=["k"])
    assert table_bloom_cols(path) == ["k"]

    merge_versioned(
        spark, path,
        spark.createDataFrame([(42, "upd")], "k long, v string"), key="k")
    assert table_bloom_cols(path) == ["k"]

    delete_versioned(spark, path, "k = 4999")
    assert table_bloom_cols(path) == ["k"]

    compact_versioned(spark, path, target_files=16)
    assert table_bloom_cols(path) == ["k"]
    # the compacted (fully rewritten) snapshot still prunes point reads:
    # every current file is new, so pruning only works if OPTIMIZE
    # re-armed the index
    v = current_version(path)
    total = len(_snapshot_files(path, v))
    kept = len(snapshot_pruned_files(path, v, point={"k": 42}))
    assert kept < total, (kept, total)
    row = (read_versioned(spark, path, point={"k": 42})
           .where("k = 42").collect())
    assert [r["v"] for r in row] == ["upd"]


def test_change_feed_replace_is_scoped_to_touched_files(spark, tmp_path):
    """A replace commit replays as delete(removed files' rows) +
    insert(new files' rows) — cost proportional to the rewrite, and the
    fold of the feed over the old snapshot equals the new snapshot."""
    path = str(tmp_path / "feedscope")
    base = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") % 10).alias("v"))
        .repartitionByRange(10, "k")
    )
    v1 = write_versioned(base, path)
    updates = spark.createDataFrame([(5, -1), (950, -1)], "k long, v long")
    v2 = merge_versioned(spark, path, updates, key="k")
    commit = _read_commit(path, v2)
    n_removed_rows = (
        spark.read.parquet(
            *[os.path.join(path, f) for f in commit["removed"]])
        .count())
    feed = read_change_feed(spark, path, from_version=v1, to_version=v2)
    dels = feed.where("_change_type = 'delete'")
    ins = feed.where("_change_type = 'insert'")
    # the delete half is exactly the removed files' rows — NOT the
    # whole 1000-row snapshot
    assert dels.count() == n_removed_rows
    assert n_removed_rows < 1000
    # fold check: old snapshot minus deletes plus inserts == new snapshot
    old = read_versioned(spark, path, version=v1)
    folded = (
        old.exceptAll(dels.select("k", "v"))
        .unionByName(ins.select("k", "v"))
    )
    new = read_versioned(spark, path, version=v2)
    assert folded.exceptAll(new).count() == 0
    assert new.exceptAll(folded).count() == 0


def test_replace_mode_validation(spark, tmp_path):
    """replace is CAS-only, requires remove_files, and every removed
    file must belong to the base snapshot; remove_files is rejected
    outside replace mode."""
    path = str(tmp_path / "guard")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    v1 = write_versioned(df, path)
    with pytest.raises(ValueError, match="expect_base"):
        write_versioned(df, path, mode="replace", remove_files=[])
    with pytest.raises(ValueError, match="remove_files"):
        write_versioned(df, path, mode="replace", expect_base=v1)
    with pytest.raises(ValueError, match="not in snapshot"):
        write_versioned(df, path, mode="replace", expect_base=v1,
                        remove_files=["data/nope/part-0.parquet"])
    with pytest.raises(ValueError, match="only valid with"):
        write_versioned(df, path, mode="append", remove_files=[])


def test_merge_on_no_matching_files_is_pure_insert(spark, tmp_path):
    """Keys entirely outside every file's range prune ALL files: the
    merge commits the update rows alone with an empty removal set."""
    path = str(tmp_path / "pureinsert")
    write_versioned(
        spark.range(100).select(F.col("id").alias("k"),
                                F.lit(0).cast("long").alias("v")), path)
    v2 = merge_versioned(
        spark, path,
        spark.createDataFrame([(10_000, 1)], "k long, v long"), key="k")
    commit = _read_commit(path, v2)
    assert commit["action"] == "replace"
    assert commit["removed"] == []
    assert read_versioned(spark, path).count() == 101


def test_mmr_select_returns_short_selection_on_small_corpus(spark):
    """Round-11 ADVICE low: a corpus with fewer than k candidates yields
    the shorter selection instead of IndexError."""
    from covid_19_data_engineering_spark.operators.retrieval import (
        mmr_select,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.6, 0.8])],
        "vec_id long, e array<double>")
    out = mmr_select(emb, [1.0, 0.0], k=10).collect()
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_mmr_diverse_retrieval_missing_query_id_raises(spark, tmp_path):
    """Round-11 ADVICE low: an absent query vec_id raises a clear
    ValueError, not IndexError."""
    from covid_19_data_engineering_spark.operators.retrieval import (
        mmr_diverse_retrieval,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sf_dir = str(tmp_path / "noquery")
    os.makedirs(sf_dir, exist_ok=True)
    (src.where("vec_id != 0")
        .write.mode("overwrite")
        .parquet(os.path.join(sf_dir, "embeddings.parquet")))
    with pytest.raises(ValueError, match="vec_id 0 is absent"):
        mmr_diverse_retrieval(spark, sf_dir)


def test_versioned_sink_crash_replay_no_duplicate_batch(spark, tmp_path):
    """Round-11 verdict #4's crash half: a stream drains into the
    versioned sink; then the WORST restart (checkpoint lost, epochs
    restart at 0) replays every batch with the same writer_id — the
    (writer, epoch) txn guard must swallow all of them, leaving row
    count and version history unchanged."""
    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
        table_versions,
    )
    from covid_19_data_engineering_spark.streaming.stateful import (
        start_versioned_append_stream,
    )

    src = str(tmp_path / "src")
    # two source files + maxFilesPerTrigger=1 -> two distinct epochs
    for i in (0, 1):
        (spark.range(i * 100, i * 100 + 100)
         .select(F.col("id").alias("k"))
         .coalesce(1).write.mode("append").parquet(src))
    tbl = str(tmp_path / "tbl")

    def drain(ckpt_name: str) -> None:
        stream = (spark.readStream.schema("k long")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_versioned_append_stream(
            stream, tbl, str(tmp_path / ckpt_name), writer_id="ingest-w")
        assert q.awaitTermination(120), "drain timed out"

    drain("ckpt1")
    n1 = read_versioned(spark, tbl).count()
    v1 = table_versions(tbl)
    assert n1 == 200
    assert len(v1) == 2  # one commit per micro-batch

    # crash-replay: fresh checkpoint, same writer — every epoch replays
    drain("ckpt2")
    assert read_versioned(spark, tbl).count() == n1
    assert table_versions(tbl) == v1


def test_point_lookup_plan_gate_files_read(spark, tmp_path):
    """The registered point-lookup's pruning contract against the
    snapshot manifest: on a z-ordered Bloom-indexed table, a single-key
    point read opens a strict subset of files (most are provably
    key-free), and the kept set still contains the key's row."""
    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
        current_version,
        _snapshot_files,
        read_versioned,
        snapshot_pruned_files,
        write_versioned,
    )

    path = str(tmp_path / "ptable")
    df = (
        spark.range(16_000)
        .select((F.col("id") * 7919 % 16_000).alias("k"),
                (F.col("id") * 104729 % 16_000).alias("c"))
        .repartition(16)
    )
    write_versioned(df, path, bloom_cols=["k"])
    compact_versioned(spark, path, target_files=16, zorder=("c", "k"))
    v = current_version(path)
    total = len(_snapshot_files(path, v))
    assert total == 16
    kept = snapshot_pruned_files(path, v, point={"k": 4242})
    assert len(kept) < total
    got = (read_versioned(spark, path, point={"k": 4242})
           .where("k = 4242").count())
    assert got == 1
    # multi-key probe form: union of the per-key kept sets
    kept3 = snapshot_pruned_files(
        path, v, point={"k": [1, 4242, 15_999]})
    assert set(kept) <= set(kept3)
    assert len(kept3) < total


def test_change_feed_replace_truncated_after_vacuum(
        spark, tmp_path, monkeypatch):
    """A replace commit's delete half needs its removed files (reachable
    only from the PRIOR snapshot); once vacuum drops that version —
    possible only past a log checkpoint, since replace/append commits
    never anchor the kept range — the feed must raise
    ChangeFeedTruncated instead of emitting a silent partial feed."""
    from covid_19_data_engineering_spark.sources import versioned as V

    monkeypatch.setattr(V, "CHECKPOINT_INTERVAL", 4)
    path = str(tmp_path / "truncfeed")
    V.write_versioned(
        spark.createDataFrame([(i, i % 5) for i in range(100)],
                              "k long, v long")
        .repartitionByRange(5, "k"),
        path)
    for i in (2, 3):
        V.write_versioned(
            spark.createDataFrame([(1000 + i, 0)], "k long, v long"),
            path, mode="append")
    v4 = V.merge_versioned(  # lands at version 4 = the checkpoint slot
        spark, path,
        spark.createDataFrame([(7, -1)], "k long, v long"), key="k")
    assert v4 == 4 and V._read_commit(path, 4)["action"] == "replace"
    v5 = V.write_versioned(
        spark.createDataFrame([(2000, 0)], "k long, v long"),
        path, mode="append")
    # anchor resolves to the v4 checkpoint: v1-v3 (and the files only
    # they reference — including v4's removed set) are vacuumed
    V.vacuum_versioned(path, keep_versions=1, retention_s=0.0)
    assert V.table_versions(path) == [4, 5]
    with pytest.raises(V.ChangeFeedTruncated):
        V.read_change_feed(spark, path, from_version=3,
                           to_version=v5).collect()


def test_pq_adc_recovers_planted_cluster_structure(spark):
    """PQ's contract is preserving COARSE structure: on a corpus drawn
    from well-separated cluster centers, ADC top-k must come from the
    query's own cluster, and an exact copy of the query must rank 1
    with true distance 0. (On the unstructured synthetic embeddings
    recall@10 is near zero — quantization error dominates when true
    neighbor distances are undifferentiated; that audit lives in the
    true_dist_units column the query emits.)"""
    import random

    from covid_19_data_engineering_spark.operators.pq import pq_adc_topk

    rng = random.Random(42)
    dim, n_clusters, n = 64, 8, 200
    centers = [[rng.choice((-4.0, 4.0)) for _ in range(dim)]
               for _ in range(n_clusters)]
    # clusters INTERLEAVE by id so the lowest-id codebook init covers
    # every cluster (ids 1..16 hit all 8 centers twice)
    rows = []
    for vid in range(1, n + 1):
        ci = (vid - 1) % n_clusters
        rows.append(
            (vid, ci, [x + rng.uniform(-0.3, 0.3) for x in centers[ci]]))
    query = [x + rng.uniform(-0.3, 0.3) for x in centers[3]]
    copy_id = n + 1
    rows.append((copy_id, 3, [float(x) for x in query]))  # exact copy
    emb = spark.createDataFrame(
        [(v, e) for v, _, e in rows],
        "vec_id long, embedding array<double>")
    got = pq_adc_topk(emb, query, k=30).collect()
    assert len(got) == 30
    # coarse-structure recall: the top-10 all come from the query's
    # cluster (25 same-cluster members exist)
    cluster_of = {v: c for v, c, _ in rows}
    assert all(cluster_of[r["vec_id"]] == 3 for r in got[:10]), \
        [(r["vec_id"], cluster_of[r["vec_id"]]) for r in got[:10]]
    # the exact copy shares the query's own quantization cell, so its
    # ADC distance IS the global minimum (ADC cannot rank within a
    # cell — ties go to lower vec_ids — but the cell itself must win)
    by_id = {r["vec_id"]: r for r in got}
    assert copy_id in by_id
    assert by_id[copy_id]["true_dist_units"] == 0
    assert by_id[copy_id]["approx_dist_units"] == \
        got[0]["approx_dist_units"]
    # approx distances are monotone with rank (the ADC ordering)
    dists = [r["approx_dist_units"] for r in got]
    assert dists == sorted(dists)


def test_hourly_active_users_flag_holds_at_every_sf(spark):
    """Round-12 audit: the HLL-vs-exact flag was a purely RELATIVE 2%
    band, which silently broke at sf0.1 (an off-by-3 on a ~120-user hour
    is 2.5%) while the sf0.01-only driver gate stayed green. The band is
    now |err| <= max(5, 2% of exact); pin it TRUE at ALL THREE gate SFs
    so a future sketch change cannot re-introduce an off-SF red flag."""
    from covid_19_data_engineering_spark.plans.registry import all_queries

    q = all_queries()["hourly_active_users"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        rows = q(spark, sf).collect()
        assert rows and all(r["hll_within_tolerance"] for r in rows), sf


def test_versioned_mutation_sequence_matches_dict_model(spark, tmp_path):
    """Stateful model check over the REPLACE machinery's composition:
    random interleavings of MERGE / DELETE / append / OPTIMIZE applied
    to both the table and the obvious python dict model, verified after
    every step — pruned rewrites must compose exactly like full
    rewrites did (seeded, deterministic)."""
    import random

    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
    )

    def snapshot(path) -> dict:
        return {r["k"]: r["v"]
                for r in read_versioned(spark, path).collect()}

    for seed in (11, 37):
        rng = random.Random(seed)
        model = {k: rng.randint(0, 99) for k in range(40)}
        path = str(tmp_path / f"seq_{seed}")
        write_versioned(
            spark.createDataFrame(list(model.items()), "k long, v long")
            .repartitionByRange(8, "k"),
            path, bloom_cols=["k"])
        fresh_key = 1000
        for step in range(6):
            op = rng.choice(("merge", "delete", "append", "compact"))
            if op == "merge":
                upd = {k: rng.randint(0, 99)
                       for k in rng.sample(sorted(model), 3)}
                upd[fresh_key] = rng.randint(0, 99)  # one insert
                fresh_key += 1
                merge_versioned(
                    spark, path,
                    spark.createDataFrame(list(upd.items()),
                                          "k long, v long"), key="k")
                model.update(upd)
            elif op == "delete":
                r = rng.randrange(5)
                delete_versioned(spark, path, f"v % 5 = {r}")
                model = {k: v for k, v in model.items() if v % 5 != r}
            elif op == "append":
                rows = {fresh_key + i: rng.randint(0, 99) for i in range(4)}
                fresh_key += 10
                write_versioned(
                    spark.createDataFrame(list(rows.items()),
                                          "k long, v long"),
                    path, mode="append")
                model.update(rows)
            else:
                compact_versioned(spark, path, target_files=4)
            assert snapshot(path) == model, (seed, step, op)

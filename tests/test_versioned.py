"""Versioned parquet tables (sources/versioned.py): snapshot isolation,
time travel, optimistic concurrent commits, vacuum safety.

The format's contract is filesystem-observable, so the tests drive it the
way two racing writers and a time-traveling reader would — including a
manufactured commit-slot collision and a true multi-threaded append race.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from covid_19_data_engineering_spark.sources.versioned import (
    CommitConflict,
    current_version,
    read_versioned,
    table_history,
    table_versions,
    vacuum_versioned,
    write_versioned,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def test_write_read_latest_and_history(spark, tbl):
    assert write_versioned(_df(spark, [(1, "a")]), tbl) == 1
    assert write_versioned(_df(spark, [(2, "b")]), tbl, mode="append") == 2
    assert write_versioned(_df(spark, [(9, "z")]), tbl, mode="overwrite") == 3
    assert table_versions(tbl) == [1, 2, 3]
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} == {9}
    hist = table_history(tbl)
    assert [h["version"] for h in hist] == [3, 2, 1]
    assert [h["action"] for h in hist] == ["overwrite", "append", "overwrite"]


def test_time_travel_by_version_and_timestamp(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    t_between = time.time()
    time.sleep(0.01)
    write_versioned(_df(spark, [(2, "b")]), tbl, mode="append")
    # version pin: v1 sees only the first row; v2 the append union
    assert {r["id"] for r in read_versioned(spark, tbl, version=1).collect()} == {1}
    assert {r["id"] for r in read_versioned(spark, tbl, version=2).collect()} == {1, 2}
    # timestamp pin resolves to the newest version at-or-before
    assert {r["id"] for r in
            read_versioned(spark, tbl, as_of_ts=t_between).collect()} == {1}
    with pytest.raises(ValueError):
        read_versioned(spark, tbl, as_of_ts=0.0)
    with pytest.raises(ValueError):
        read_versioned(spark, tbl, version=99)


def test_append_schema_must_match(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    other = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_versioned(other, tbl, mode="append")
    # overwrite may change schema (a new snapshot)
    assert write_versioned(other, tbl, mode="overwrite") == 2


def test_commit_slot_collision_rebases(spark, tbl):
    """A stolen version slot (another writer's commit record appearing
    first) must make the writer re-base and land on the next slot — the
    optimistic-concurrency loop, deterministically provoked."""
    write_versioned(_df(spark, [(1, "a")]), tbl)
    # forge a competing v2 commit the way a racing writer would leave it
    forged = {
        "version": 2, "action": "append", "files": [],
        "schema": _df(spark, [(1, "a")]).schema.json(),
        "ts": time.time(), "commit_id": "forged",
    }
    with open(os.path.join(tbl, "_log", "00000002.json"), "w") as f:
        json.dump(forged, f)
    v = write_versioned(_df(spark, [(3, "c")]), tbl, mode="append")
    assert v == 3
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} == {1, 3}


def test_threaded_append_race_all_commit(spark, tbl):
    """N threads appending concurrently must all land, on distinct
    consecutive versions, with the final snapshot containing every row."""
    write_versioned(_df(spark, [(0, "seed")]), tbl)
    errs = []

    def worker(i):
        try:
            write_versioned(_df(spark, [(100 + i, f"w{i}")]), tbl, mode="append")
        except Exception as e:  # noqa: BLE001 — surfacing to the assert
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert table_versions(tbl) == [1, 2, 3, 4, 5]
    got = {r["id"] for r in read_versioned(spark, tbl).collect()}
    assert got == {0, 100, 101, 102, 103}


def test_vacuum_keeps_reachable_chain(spark, tbl):
    """Vacuum with keep_versions=1 on an append-chain tip must keep every
    file AND log record the tip's snapshot walks through, while deleting
    files only reachable from dropped snapshots and crash orphans."""
    write_versioned(_df(spark, [(1, "a")]), tbl)               # v1 overwrite
    write_versioned(_df(spark, [(2, "b")]), tbl, "overwrite")  # v2 overwrite
    write_versioned(_df(spark, [(3, "c")]), tbl, "append")     # v3 append->v2
    # crash orphan: data files with no commit record
    orphan = os.path.join(tbl, "data", "orphan")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"junk")
    # retention_s=0: no concurrent writers in this test, reclaim everything
    deleted = vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    # v1's file and the orphan go; v2+v3 files stay (v3's snapshot needs v2)
    assert any("orphan" in d for d in deleted)
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} == {2, 3}
    assert {r["id"] for r in read_versioned(spark, tbl, version=2).collect()} == {2}
    with pytest.raises((ValueError, FileNotFoundError)):
        read_versioned(spark, tbl, version=1)


def test_vacuum_retention_spares_young_unreferenced_files(spark, tbl):
    """Default vacuum must NOT delete a fresh unreferenced data file — it
    may belong to an in-flight writer that has staged data but not yet
    linked its commit record; deleting it would hand that writer a torn
    table when it wins the commit race (round-5 advisory)."""
    write_versioned(_df(spark, [(1, "a")]), tbl)
    staged = os.path.join(tbl, "data", "inflight")
    os.makedirs(staged)
    with open(os.path.join(staged, "part-0.parquet"), "wb") as f:
        f.write(b"staged-by-a-racing-writer")
    deleted = vacuum_versioned(tbl, keep_versions=1)  # default retention
    assert deleted == []
    assert os.path.exists(os.path.join(staged, "part-0.parquet"))
    # once aged past the retention window it is a true orphan
    old = time.time() - 7200
    os.utime(os.path.join(staged, "part-0.parquet"), (old, old))
    deleted = vacuum_versioned(tbl, keep_versions=1)
    assert any("inflight" in d for d in deleted)


def test_append_chain_reads_through_checkpoint(spark, tbl, monkeypatch):
    """Round-5 verdict #4: a long append chain must resolve reads from the
    nearest log checkpoint, touching O(CHECKPOINT_INTERVAL) commit records
    — not walk every commit back to the table's overwrite."""
    import covid_19_data_engineering_spark.sources.versioned as V

    n_appends = 36  # versions 1..37; checkpoints land at 16 and 32
    write_versioned(_df(spark, [(0, "seed")]), tbl)
    for i in range(1, n_appends + 1):
        write_versioned(_df(spark, [(i, f"r{i}")]), tbl, mode="append")
    assert os.path.exists(os.path.join(tbl, "_log", "00000016.checkpoint.json"))
    assert os.path.exists(os.path.join(tbl, "_log", "00000032.checkpoint.json"))

    reads = []
    real = V._read_commit
    monkeypatch.setattr(V, "_read_commit",
                        lambda p, v: (reads.append(v), real(p, v))[1])
    got = {r["id"] for r in read_versioned(spark, tbl).collect()}
    assert got == set(range(n_appends + 1))
    walked = [v for v in reads if v <= n_appends + 1]
    assert len(walked) <= V.CHECKPOINT_INTERVAL, (
        f"latest-version read walked {len(walked)} commit records")
    # time travel between checkpoints walks only its own tail
    reads.clear()
    got20 = {r["id"] for r in read_versioned(spark, tbl, version=20).collect()}
    assert got20 == set(range(20))
    assert len(reads) <= V.CHECKPOINT_INTERVAL


def test_vacuum_anchors_at_checkpoint_on_append_chain(spark, tbl):
    """Vacuum on an append-heavy table must anchor its kept range at the
    newest checkpoint at/below the oldest kept version — dropping log
    records below it — while kept versions stay fully readable THROUGH the
    checkpoint (their pre-checkpoint commit records are gone)."""
    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(0, "seed")]), tbl)
    for i in range(1, 37):
        write_versioned(_df(spark, [(i, f"r{i}")]), tbl, mode="append")
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    # kept extends down to the newest checkpoint (32), not overwrite (1)
    assert table_versions(tbl) == list(range(32, 38))
    # all data is append-reachable from v37 — nothing deletable, and the
    # full row set must survive a read that can no longer see commits 1..31
    got = {r["id"] for r in read_versioned(spark, tbl).collect()}
    assert got == set(range(37))
    got33 = {r["id"] for r in read_versioned(spark, tbl, version=33).collect()}
    assert got33 == set(range(33))
    assert not os.path.exists(V._commit_path(tbl, 31))
    assert os.path.exists(V._checkpoint_path(tbl, 32))


def test_empty_frame_commits_schema_only_snapshot(spark, tbl):
    empty = spark.createDataFrame([], "id long, v string")
    write_versioned(empty, tbl)
    out = read_versioned(spark, tbl)
    assert out.count() == 0
    assert out.schema.simpleString() == "struct<id:bigint,v:string>"


def test_current_version_empty_table(tbl):
    assert current_version(tbl) == 0
    assert table_versions(tbl) == []
    with pytest.raises(FileNotFoundError):
        read_versioned(None, tbl)


def test_exhausted_retries_raise(spark, tbl, monkeypatch):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    import covid_19_data_engineering_spark.sources.versioned as V

    real_link = os.link

    def always_lose(src, dst):
        if "_log" in dst:
            raise FileExistsError(dst)
        return real_link(src, dst)

    monkeypatch.setattr(V.os, "link", always_lose)
    with pytest.raises(CommitConflict):
        write_versioned(_df(spark, [(2, "b")]), tbl, mode="append",
                        max_retries=3)


def test_compact_rewrites_snapshot_and_preserves_history(spark, tbl):
    """Compaction: an append chain's many small files rewrite into one
    overwrite version with identical rows; prior versions still
    time-travel; the commit records its provenance."""
    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(0, "seed")]), tbl)
    for i in range(1, 6):
        write_versioned(_df(spark, [(i, f"r{i}")]), tbl, mode="append")
    n_files_before = len(V._snapshot_files(tbl, 6))
    assert n_files_before >= 6  # one+ per commit
    v = V.compact_versioned(spark, tbl)
    assert v == 7
    assert len(V._snapshot_files(tbl, 7)) == 1
    got = {r["id"] for r in read_versioned(spark, tbl).collect()}
    assert got == set(range(6))
    # history preserved: the pre-compaction tip still reads
    got6 = {r["id"] for r in read_versioned(spark, tbl, version=6).collect()}
    assert got6 == set(range(6))
    assert V._read_commit(tbl, 7)["compacted_from"] == 6


def test_compact_cas_loses_to_concurrent_append(spark, tbl):
    """A commit landing between compaction's read and its write must make
    the compare-and-swap overwrite fail with CommitConflict — a blind
    overwrite would silently erase the concurrent append's rows."""
    import json as _json

    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(1, "a")]), tbl)
    base = V.current_version(tbl)
    # forge a racing append commit the way another writer would land it
    forged = {
        "version": base + 1, "action": "append", "files": [],
        "schema": _df(spark, [(1, "a")]).schema.json(),
        "ts": time.time(), "commit_id": "racer",
    }
    with open(V._commit_path(tbl, base + 1), "w") as f:
        _json.dump(forged, f)
    df = read_versioned(spark, tbl, version=base)
    with pytest.raises(CommitConflict, match="expected base"):
        write_versioned(df.coalesce(1), tbl, mode="overwrite",
                        expect_base=base)


def test_versioned_streaming_sink_commits_per_batch(spark, tbl, tmp_path):
    """The streaming sink lands the events stream in a versioned table:
    row set equals the batch read, the founding commit is an overwrite,
    and every commit carries its stream_epoch; re-running the same stream
    over the same checkpoint adds NO new versions (no new data, and a
    replayed epoch would be skipped by the epoch guard)."""
    import covid_19_data_engineering_spark.sources.versioned as V
    from covid_19_data_engineering_spark.sources.tables import load_table
    from covid_19_data_engineering_spark.streaming.events import events_stream
    from covid_19_data_engineering_spark.streaming.stateful import (
        start_versioned_append_stream,
    )

    sf = "/root/testdata/sf0.001"
    stream = events_stream(spark, sf).select("event_id", "user_id", "value")
    q = start_versioned_append_stream(stream, tbl, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    n_batch = load_table(spark, "events", sf).count()
    assert read_versioned(spark, tbl).count() == n_batch
    hist = table_history(tbl)
    assert hist[-1]["action"] == "overwrite"  # founding commit
    assert all("txn" in V._read_commit(tbl, h["version"]) for h in hist)
    v_before = V.current_version(tbl)

    q2 = start_versioned_append_stream(
        events_stream(spark, sf).select("event_id", "user_id", "value"),
        tbl, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert V.current_version(tbl) == v_before
    assert read_versioned(spark, tbl).count() == n_batch


def test_txn_marker_survives_interleaved_commits(spark, tbl):
    """The idempotence marker must survive commits by OTHER writers:
    a compaction (no txn) and a second stream's commits between a
    writer's last epoch and its replay must not reset the guard — and
    the lookup must answer from a checkpoint when the marker is deeper
    than the commit walk."""
    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(0, "seed")]), tbl)
    write_versioned(_df(spark, [(1, "a")]), tbl, mode="append",
                    meta={"txn": {"app": "stream-A", "epoch": 7}})
    # a compaction erases nothing
    V.compact_versioned(spark, tbl)
    assert V.last_txn_epoch(tbl, "stream-A") == 7
    # a second writer's txns do not shadow A's
    write_versioned(_df(spark, [(2, "b")]), tbl, mode="append",
                    meta={"txn": {"app": "stream-B", "epoch": 0}})
    assert V.last_txn_epoch(tbl, "stream-A") == 7
    assert V.last_txn_epoch(tbl, "stream-B") == 0
    assert V.last_txn_epoch(tbl, "never-committed") is None
    # push A's marker past a checkpoint boundary: 16+ appends by B
    for i in range(16):
        write_versioned(_df(spark, [(10 + i, f"b{i}")]), tbl, mode="append",
                        meta={"txn": {"app": "stream-B", "epoch": 1 + i}})
    cp_versions = [v for v in V.table_versions(tbl)
                   if V._read_checkpoint(tbl, v) is not None]
    assert cp_versions, "no checkpoint written past 16 commits"
    assert V._read_checkpoint(tbl, cp_versions[-1])["txns"]["stream-A"] == 7
    assert V.last_txn_epoch(tbl, "stream-A") == 7
    assert V.last_txn_epoch(tbl, "stream-B") == 16


def test_new_stream_writer_lands_despite_restarted_epochs(spark, tbl, tmp_path):
    """A NEW streaming query (fresh checkpoint dir -> epochs restart at 0)
    writing to an existing sink table must have its batches LAND — the
    guard keys on (writer, epoch), so another writer's higher epochs
    cannot silently swallow them."""
    import covid_19_data_engineering_spark.sources.versioned as V
    from covid_19_data_engineering_spark.sources.tables import load_table
    from covid_19_data_engineering_spark.streaming.events import events_stream
    from covid_19_data_engineering_spark.streaming.stateful import (
        start_versioned_append_stream,
    )

    sf = "/root/testdata/sf0.001"
    n_batch = load_table(spark, "events", sf).count()
    cols = ["event_id", "user_id", "value"]
    q1 = start_versioned_append_stream(
        events_stream(spark, sf).select(*cols), tbl, str(tmp_path / "ck1"))
    q1.awaitTermination(120)
    assert read_versioned(spark, tbl).count() == n_batch
    # second, independent query: same epochs (0...), different writer
    q2 = start_versioned_append_stream(
        events_stream(spark, sf).select(*cols), tbl, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert read_versioned(spark, tbl).count() == 2 * n_batch
    assert V.last_txn_epoch(tbl, str(tmp_path / "ck1")) is not None
    assert V.last_txn_epoch(tbl, str(tmp_path / "ck2")) is not None


def test_last_txn_epoch_survives_vacuumed_history(spark, tbl):
    """Round-7 verdict HIGH: after vacuum anchors the kept range at an
    overwrite with NO checkpoint, commits below the anchor are gone —
    the newest-first walks in last_txn_epoch must treat the missing
    record as end-of-history, not crash with FileNotFoundError (which
    permanently killed the streaming sink on such tables). Round 13
    STRENGTHENS the contract: vacuum now materializes a checkpoint at
    the anchor BEFORE dropping history, so idempotence markers survive
    the vacuum — a restarted stream can no longer double-commit epochs
    whose records were vacuumed away."""
    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(0, "seed")]), tbl)
    for i in range(4):
        write_versioned(_df(spark, [(i, "a")]), tbl, mode="append",
                        meta={"txn": {"app": "old-stream", "epoch": i}})
    # overwrite anchors a new snapshot at v6 (not a checkpoint multiple)
    write_versioned(_df(spark, [(9, "z")]), tbl, mode="overwrite")
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    assert min(table_versions(tbl)) == 6  # history below the anchor gone
    # the vacuum-written anchor checkpoint preserves the marker
    assert V.last_txn_epoch(tbl, "old-stream") == 3
    assert V.last_txn_epoch(tbl, "never-committed") is None
    # legacy posture (tables vacuumed before the anchor checkpoint
    # existed): remove it and the walk must still not crash — the app
    # then reads as never-committed, the pre-round-13 documented cost
    os.unlink(V._checkpoint_path(tbl, 6))
    assert V.last_txn_epoch(tbl, "old-stream") is None
    # markers committed AFTER the vacuum still resolve
    write_versioned(_df(spark, [(10, "n")]), tbl, mode="append",
                    meta={"txn": {"app": "new-stream", "epoch": 3}})
    assert V.last_txn_epoch(tbl, "new-stream") == 3


def test_checkpoint_boundary_write_on_vacuumed_table(spark, tbl):
    """Writing THROUGH a checkpoint boundary (every 16th commit triggers
    _write_checkpoint -> _checkpoint_txns full walk) on a vacuumed table
    must succeed and produce a checkpoint aggregating only the retained
    history — previously the walk crashed every 16th commit forever."""
    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(0, "seed")]), tbl)
    for i in range(4):
        write_versioned(_df(spark, [(i, "a")]), tbl, mode="append")
    write_versioned(_df(spark, [(9, "z")]), tbl, mode="overwrite")  # v6
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    # append across v16: the boundary commit aggregates the txn map
    for i in range(7, 17):
        write_versioned(_df(spark, [(i, "b")]), tbl, mode="append",
                        meta={"txn": {"app": "s", "epoch": i}})
    assert current_version(tbl) == 16
    cp = V._read_checkpoint(tbl, 16)
    assert cp is not None, "boundary checkpoint missing on vacuumed table"
    assert cp["txns"] == {"s": 16}
    assert V.last_txn_epoch(tbl, "s") == 16
    assert read_versioned(spark, tbl).count() == 11  # v6 row + 10 appends


def test_checkpoint_failure_never_masks_a_committed_write(spark, tbl,
                                                          monkeypatch):
    """The commit is durable the instant its log link lands; a checkpoint
    materialization failure afterwards must not surface as a failed
    write (ADVICE r7 #2) — readers just walk a longer tail."""
    import covid_19_data_engineering_spark.sources.versioned as V

    write_versioned(_df(spark, [(0, "seed")]), tbl)
    for i in range(14):
        write_versioned(_df(spark, [(i, "a")]), tbl, mode="append")

    def boom(path, version):
        raise OSError("disk full while checkpointing")

    monkeypatch.setattr(V, "_write_checkpoint", boom)
    v = write_versioned(_df(spark, [(99, "x")]), tbl, mode="append")
    assert v == 16  # the boundary commit itself succeeded
    assert V._read_checkpoint(tbl, 16) is None  # checkpoint skipped
    assert read_versioned(spark, tbl).count() == 16


def test_pruned_read_skips_nonoverlapping_files(spark):
    """Round-7 verdict missing #1: commits record per-file [min, max]
    from the parquet footers, and a range-predicate read must plan
    STRICTLY FEWER files while returning at least every matching row.
    Files are laid out range-disjoint on id (what zorder_file_layout's
    plan produces), so the prune has real teeth."""
    import tempfile

    import covid_19_data_engineering_spark.sources.versioned as V

    tbl = tempfile.mkdtemp() + "/t"
    df = spark.range(0, 1000).repartitionByRange(4, "id")
    V.write_versioned(df, tbl)

    full = V.read_versioned(spark, tbl)
    assert len(full.inputFiles()) == 4

    pruned = V.read_versioned(spark, tbl, prune={"id": (0, 99)})
    assert len(pruned.inputFiles()) < 4, "range predicate pruned nothing"
    # the data-skipping contract: at least every matching row survives
    got = {r["id"] for r in pruned.where("id BETWEEN 0 AND 99").collect()}
    assert got == set(range(100))

    # open-ended bounds and a miss-everything range
    hi_only = V.read_versioned(spark, tbl, prune={"id": (900, None)})
    assert 0 < len(hi_only.inputFiles()) < 4
    assert hi_only.where("id >= 900").count() == 100
    none = V.read_versioned(spark, tbl, prune={"id": (5000, 6000)})
    assert none.count() == 0
    # same columns/types as the full read (nullability differs: parquet
    # scans are always nullable, the commit schema keeps the writer's)
    assert [(f.name, f.dataType) for f in none.schema.fields] == \
        [(f.name, f.dataType) for f in full.schema.fields]


def test_stats_survive_appends_checkpoints_and_compaction(spark):
    """The stats map must resolve through the same walk as the file list:
    append commits contribute their own stats, the 16th-commit
    checkpoint aggregates them (reads past it stay O(interval)), and a
    compaction rewrite re-derives stats for its new files."""
    import tempfile

    import covid_19_data_engineering_spark.sources.versioned as V

    tbl = tempfile.mkdtemp() + "/t"
    for i in range(17):  # crosses the interval-16 checkpoint boundary
        lo = i * 100
        V.write_versioned(
            spark.range(lo, lo + 100).coalesce(1), tbl,
            mode="append" if i else "overwrite")
    assert V._read_checkpoint(tbl, 16) is not None
    pruned = V.read_versioned(spark, tbl, prune={"id": (1650, 1651)})
    assert len(pruned.inputFiles()) == 1  # only commit 17's file overlaps
    assert pruned.where("id = 1650").count() == 1

    V.compact_versioned(spark, tbl)
    # the rewritten snapshot has one file; stats re-derived at write
    c = V._read_commit(tbl, V.current_version(tbl))
    assert len(c["files"]) == 1 and c["stats"][c["files"][0]]["id"] == [0, 1699]


def test_prune_keeps_files_without_stats_or_columns(spark):
    """Pruning is conservative: a commit record with no stats (pre-stats
    history), an unknown column, or type-incomparable bounds must KEEP
    the file — skipping may only ever drop files that cannot match."""
    import json
    import os
    import tempfile

    import covid_19_data_engineering_spark.sources.versioned as V

    tbl = tempfile.mkdtemp() + "/t"
    V.write_versioned(spark.range(0, 10).coalesce(1), tbl)
    # simulate a pre-stats commit record (round-7 format)
    cpath = V._commit_path(tbl, 1)
    rec = json.load(open(cpath))
    del rec["stats"]
    os.unlink(cpath)
    json.dump(rec, open(cpath, "w"))
    assert V.read_versioned(spark, tbl, prune={"id": (5000, 6000)}).count() == 10

    V.write_versioned(spark.range(0, 10).coalesce(1), tbl)  # stats back
    assert V.read_versioned(
        spark, tbl, prune={"missing_col": (0, 1)}).count() == 10
    # string bounds against int stats: incomparable -> keep
    assert V.read_versioned(spark, tbl, prune={"id": ("a", "b")}).count() == 10


def test_txn_replay_refused_and_raced_replay_serialized(spark):
    """Round-7 ADVICE low: the (writer, epoch) guard must not be
    check-then-act. A replayed epoch is refused BEFORE staging
    (TxnAlreadyApplied), and two live writers racing the SAME (writer,
    epoch) commit exactly once — the claim loop re-verifies after every
    re-base, so the loser surfaces the replay instead of
    double-committing."""
    import tempfile

    import covid_19_data_engineering_spark.sources.versioned as V

    tbl = tempfile.mkdtemp() + "/t"
    V.write_versioned(_df(spark, [(0, "seed")]), tbl)
    V.write_versioned(_df(spark, [(1, "a")]), tbl, mode="append",
                      meta={"txn": {"app": "w", "epoch": 5}})
    for epoch in (5, 4):  # same and older epochs are replays
        with pytest.raises(V.TxnAlreadyApplied):
            V.write_versioned(_df(spark, [(9, "x")]), tbl, mode="append",
                              meta={"txn": {"app": "w", "epoch": epoch}})
    assert V.current_version(tbl) == 2
    # a NEWER epoch and a DIFFERENT writer both land
    V.write_versioned(_df(spark, [(2, "b")]), tbl, mode="append",
                      meta={"txn": {"app": "w", "epoch": 6}})
    V.write_versioned(_df(spark, [(3, "c")]), tbl, mode="append",
                      meta={"txn": {"app": "w2", "epoch": 4}})
    assert V.current_version(tbl) == 4

    # true race: two threads, same (writer, epoch) — exactly one commit
    results: list = []

    def attempt(tag):
        try:
            v = V.write_versioned(
                _df(spark, [(10, tag)]), tbl, mode="append",
                meta={"txn": {"app": "racer", "epoch": 1}})
            results.append(("ok", v))
        except V.TxnAlreadyApplied:
            results.append(("replay", None))

    before = V.current_version(tbl)
    ts = [threading.Thread(target=attempt, args=(t,)) for t in ("t1", "t2")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(r[0] for r in results) == ["ok", "replay"]
    assert V.current_version(tbl) == before + 1
    assert V.last_txn_epoch(tbl, "racer") == 1


def test_merge_versioned_upserts_and_survives_concurrent_append(spark):
    """Row-level MERGE INTO the versioned format: matched keys update,
    new keys insert, untouched rows survive — and a concurrent append
    landing mid-merge is NOT erased: the CAS rejects the stale rewrite
    and the retry re-derives from the appender's tip."""
    import tempfile

    import covid_19_data_engineering_spark.sources.versioned as V
    from covid_19_data_engineering_spark.operators.merge import merge_versioned

    tbl = tempfile.mkdtemp() + "/t"
    V.write_versioned(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), tbl)
    v = merge_versioned(
        spark, tbl, _df(spark, [(2, "B2"), (9, "new")]), "id")
    assert v == 2
    got = {r["id"]: r["v"] for r in V.read_versioned(spark, tbl).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}

    # concurrent append: inject a competing commit between derivation and
    # claim by making the FIRST write_versioned call observe a moved tip
    real_write = V.write_versioned
    calls = {"n": 0}

    def racing_write(df, path, **kw):
        if calls["n"] == 0:
            calls["n"] += 1
            real_write(_df(spark, [(50, "raced")]), path, mode="append")
        return real_write(df, path, **kw)

    import covid_19_data_engineering_spark.operators.merge as M
    orig = V.write_versioned
    try:
        # patch the name merge_versioned resolves at call time
        V.write_versioned = racing_write  # noqa: simulated interleaving
        merge_versioned(spark, tbl, _df(spark, [(3, "C3")]), "id")
    finally:
        V.write_versioned = orig
    got = {r["id"]: r["v"] for r in V.read_versioned(spark, tbl).collect()}
    # the raced append's row SURVIVES the merge rewrite
    assert got == {1: "a", 2: "B2", 3: "C3", 9: "new", 50: "raced"}


def test_merge_versioned_rejects_duplicate_update_keys_and_empty_table(spark):
    """Delta's MERGE rule: multiple source rows for one key is an error,
    not a silent double-insert (the anti-join would drop the old row
    once and append BOTH updates). And an uncommitted table surfaces
    the same FileNotFoundError read_versioned gives, not a bare
    IndexError."""
    import tempfile

    import covid_19_data_engineering_spark.sources.versioned as V
    from covid_19_data_engineering_spark.operators.merge import merge_versioned

    tbl = tempfile.mkdtemp() + "/t"
    with pytest.raises(FileNotFoundError, match="no committed versions"):
        merge_versioned(spark, tbl, _df(spark, [(1, "a")]), "id")

    V.write_versioned(_df(spark, [(1, "a"), (2, "b")]), tbl)
    with pytest.raises(ValueError, match="exactly one source row"):
        merge_versioned(
            spark, tbl, _df(spark, [(2, "x"), (2, "y")]), "id")
    # the failed merge committed nothing
    assert V.current_version(tbl) == 1


# --------------------------------------------------------------------------
# change feed
# --------------------------------------------------------------------------


def _feed_rows(spark, tbl, frm, to=None):
    from covid_19_data_engineering_spark.sources.versioned import (
        read_change_feed,
    )

    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in read_change_feed(spark, tbl, frm, to).collect()
    )


def test_change_feed_appends_overwrites_and_compaction(spark, tbl):
    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
    )

    write_versioned(_df(spark, [(1, "a"), (2, "b")]), tbl)          # v1
    write_versioned(_df(spark, [(3, "c")]), tbl, mode="append")     # v2
    write_versioned(_df(spark, [(4, "d")]), tbl)                    # v3 overwrite

    # full feed: v1 inserts, v2 append insert, v3 delete-all + insert
    assert _feed_rows(spark, tbl, 0) == sorted([
        (1, "insert", 1, "a"), (1, "insert", 2, "b"),
        (2, "insert", 3, "c"),
        (3, "delete", 1, "a"), (3, "delete", 2, "b"),
        (3, "delete", 3, "c"),
        (3, "insert", 4, "d"),
    ])
    # incremental consumer: only what changed since v2
    assert _feed_rows(spark, tbl, 2) == sorted([
        (3, "delete", 1, "a"), (3, "delete", 2, "b"),
        (3, "delete", 3, "c"),
        (3, "insert", 4, "d"),
    ])
    # a compaction rewrite changes no data -> contributes nothing
    v4 = compact_versioned(spark, tbl)
    assert _feed_rows(spark, tbl, 3) == []
    assert _feed_rows(spark, tbl, 3, v4) == []
    # appends after the compaction show up file-local as usual
    write_versioned(_df(spark, [(5, "e")]), tbl, mode="append")     # v5
    assert _feed_rows(spark, tbl, v4) == [(5, "insert", 5, "e")]


def test_change_feed_bounds_and_empty_range(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)                    # v1
    write_versioned(_df(spark, [(2, "b")]), tbl, mode="append")     # v2
    # bounded read stops at to_version
    assert _feed_rows(spark, tbl, 0, 1) == [(1, "insert", 1, "a")]
    # an empty range returns an empty frame with the feed schema
    from covid_19_data_engineering_spark.sources.versioned import (
        read_change_feed,
    )
    empty = read_change_feed(spark, tbl, 2, 2)
    assert empty.count() == 0
    assert {"_change_type", "_commit_version"} <= set(empty.columns)


# --------------------------------------------------------------------------
# incremental view maintenance over the change feed
# --------------------------------------------------------------------------


def test_incremental_count_aggregate_tracks_the_source(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_count_aggregate,
    )
    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
    )

    tbl, agg = str(tmp_path / "src"), str(tmp_path / "agg")

    import pyspark.sql.functions as F

    def check():
        got = sorted(
            (r["v"], r["n_rows"])
            for r in read_versioned(spark, agg).collect())
        want = sorted(
            (r["v"], r["n"])
            for r in read_versioned(spark, tbl)
            .groupBy("v").agg(F.count("*").alias("n")).collect())
        assert got == want

    write_versioned(_df(spark, [(1, "a"), (2, "a"), (3, "b")]), tbl)
    assert refresh_count_aggregate(spark, tbl, agg, "v") == 1
    check()

    # appends fold in as +1 deltas
    write_versioned(_df(spark, [(4, "b"), (5, "c")]), tbl, mode="append")
    refresh_count_aggregate(spark, tbl, agg, "v")
    check()

    # an overwrite folds as delete-all + insert; a vanished key drops out
    write_versioned(_df(spark, [(6, "c")]), tbl)
    refresh_count_aggregate(spark, tbl, agg, "v")
    check()
    keys = {r["v"] for r in read_versioned(spark, agg).collect()}
    assert keys == {"c"}

    # idempotent: no new source commits -> no new aggregate version
    from covid_19_data_engineering_spark.sources.versioned import (
        current_version,
    )
    before = current_version(agg)
    assert refresh_count_aggregate(spark, tbl, agg, "v") == 3
    assert current_version(agg) == before

    # multiple source commits between refreshes replay from the cursor
    write_versioned(_df(spark, [(7, "d")]), tbl, mode="append")
    write_versioned(_df(spark, [(8, "d")]), tbl, mode="append")
    refresh_count_aggregate(spark, tbl, agg, "v")
    check()


def _ndf(spark, rows):
    return spark.createDataFrame(rows, "id long, k string, x long")


def test_incremental_sum_aggregate_tracks_the_source(spark, tmp_path):
    """SUM/AVG IVM matrix mirroring the COUNT twin: bootstrap, append
    folding, overwrite (delete+insert) folding with key drop-out,
    idempotent no-op, multi-commit catch-up, and NULL-value handling."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_sum_aggregate,
    )
    import pyspark.sql.functions as F

    tbl, agg = str(tmp_path / "src"), str(tmp_path / "agg")

    def check():
        got = sorted(
            (r["k"], r["n_rows"], r["n_vals"], r["sum_value"])
            for r in read_versioned(spark, agg).collect())
        want = sorted(
            (r["k"], r["n"], r["nv"], r["s"])
            for r in read_versioned(spark, tbl)
            .groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                              F.count("x").alias("nv"),
                              F.sum("x").alias("s")).collect())
        assert got == want

    write_versioned(
        _ndf(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]), tbl)
    assert refresh_sum_aggregate(spark, tbl, agg, "k", "x") == 1
    check()

    # appends fold as (+1, +value); NULL adds to count, not sum
    write_versioned(_ndf(spark, [(4, "b", 7), (5, "c", None)]),
                    tbl, mode="append")
    refresh_sum_aggregate(spark, tbl, agg, "k", "x")
    check()

    # overwrite folds as delete-all + insert; vanished keys drop out
    write_versioned(_ndf(spark, [(6, "c", 42), (7, "c", 8)]), tbl)
    refresh_sum_aggregate(spark, tbl, agg, "k", "x")
    check()
    keys = {r["k"] for r in read_versioned(spark, agg).collect()}
    assert keys == {"c"}

    # idempotent: no new source commits -> no new aggregate version
    before = current_version(agg)
    assert refresh_sum_aggregate(spark, tbl, agg, "k", "x") == 3
    assert current_version(agg) == before

    # multiple source commits between refreshes replay from the cursor
    write_versioned(_ndf(spark, [(8, "d", 1)]), tbl, mode="append")
    write_versioned(_ndf(spark, [(9, "d", 2)]), tbl, mode="append")
    refresh_sum_aggregate(spark, tbl, agg, "k", "x")
    check()


def test_incremental_minmax_aggregate_tracks_the_source(spark, tmp_path):
    """MIN/MAX IVM: monoid folding for insert-only keys, delete-triggered
    per-key recompute (an overwrite deleting the current minimum must
    surface the NEXT minimum, which no delta fold can know)."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_minmax_aggregate,
    )
    import pyspark.sql.functions as F

    tbl, agg = str(tmp_path / "src"), str(tmp_path / "agg")

    def check():
        got = sorted(
            (r["k"], r["min_value"], r["max_value"])
            for r in read_versioned(spark, agg).collect())
        want = sorted(
            (r["k"], r["mn"], r["mx"])
            for r in read_versioned(spark, tbl)
            .groupBy("k").agg(F.min("x").alias("mn"),
                              F.max("x").alias("mx")).collect())
        assert got == want

    write_versioned(
        _ndf(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]), tbl)
    assert refresh_minmax_aggregate(spark, tbl, agg, "k", "x") == 1
    check()

    # append-only: pure least/greatest fold, no snapshot read needed
    write_versioned(_ndf(spark, [(4, "a", 1), (5, "b", 99)]),
                    tbl, mode="append")
    refresh_minmax_aggregate(spark, tbl, agg, "k", "x")
    check()

    # overwrite removes a's minimum: the delete-triggered recompute must
    # surface the surviving next-smallest, and drop vanished keys
    write_versioned(
        _ndf(spark, [(6, "a", 20), (7, "a", 15), (8, "d", 3)]), tbl)
    refresh_minmax_aggregate(spark, tbl, agg, "k", "x")
    check()
    rows = {r["k"]: (r["min_value"], r["max_value"])
            for r in read_versioned(spark, agg).collect()}
    assert rows == {"a": (15, 20), "d": (3, 3)}

    # idempotent + multi-commit catch-up
    before = current_version(agg)
    assert refresh_minmax_aggregate(spark, tbl, agg, "k", "x") == 3
    assert current_version(agg) == before
    write_versioned(_ndf(spark, [(9, "d", -1)]), tbl, mode="append")
    write_versioned(_ndf(spark, [(10, "a", 100)]), tbl, mode="append")
    refresh_minmax_aggregate(spark, tbl, agg, "k", "x")
    check()


def test_incremental_topk_view_tracks_the_source(spark, tmp_path):
    """TOP-K IVM matrix (round-9 verdict task #8): bootstrap, monoid
    insert folding (a new row entering AND missing the top-k), the
    delete-triggered per-key recompute (an overwrite deleting a top row
    must surface the (k+1)-th, which no state fold can know), key
    drop-out, idempotence, multi-commit catch-up, and the truncated-feed
    full-recompute fallback — the invariant is maintained == fresh
    ROW_NUMBER()<=k at every step."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_topk_view,
    )

    tbl, agg = str(tmp_path / "src"), str(tmp_path / "agg")
    K = 2

    def check():
        got = sorted((r["k"], r["x"], r["id"])
                     for r in read_versioned(spark, agg).collect())
        w = Window.partitionBy("k").orderBy(
            F.col("x").desc_nulls_last(), F.col("id").asc())
        want = sorted(
            (r["k"], r["x"], r["id"])
            for r in read_versioned(spark, tbl)
            .where(F.col("x").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= K).collect())
        assert got == want

    write_versioned(
        _ndf(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 7)]),
        tbl)
    assert refresh_topk_view(spark, tbl, agg, "k", "x", "id", k=K) == 1
    check()  # bootstrap: a -> {20, 10}, b -> {7}

    # append: 30 enters a's top-2 (evicting 10); 1 misses it entirely
    write_versioned(_ndf(spark, [(5, "a", 30), (6, "a", 1), (7, "b", 2)]),
                    tbl, mode="append")
    refresh_topk_view(spark, tbl, agg, "k", "x", "id", k=K)
    check()
    rows = {(r["k"], r["x"]) for r in read_versioned(spark, agg).collect()}
    assert rows == {("a", 30), ("a", 20), ("b", 7), ("b", 2)}

    # overwrite deletes a's best two: the recompute must surface the
    # survivors, and fully-vanished keys must drop out
    write_versioned(
        _ndf(spark, [(8, "a", 10), (9, "a", 5), (10, "c", 99)]), tbl)
    refresh_topk_view(spark, tbl, agg, "k", "x", "id", k=K)
    check()
    rows = {(r["k"], r["x"]) for r in read_versioned(spark, agg).collect()}
    assert rows == {("a", 10), ("a", 5), ("c", 99)}

    # idempotent + multi-commit catch-up
    before = current_version(agg)
    assert refresh_topk_view(spark, tbl, agg, "k", "x", "id", k=K) == 3
    assert current_version(agg) == before
    write_versioned(_ndf(spark, [(11, "c", 50)]), tbl, mode="append")
    write_versioned(_ndf(spark, [(12, "a", 100)]), tbl, mode="append")
    refresh_topk_view(spark, tbl, agg, "k", "x", "id", k=K)
    check()

    # vacuumed feed: cursor predates the horizon -> full recompute
    write_versioned(_ndf(spark, [(13, "d", 4)]), tbl)
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    refresh_topk_view(spark, tbl, agg, "k", "x", "id", k=K)
    rows = {(r["k"], r["x"]) for r in read_versioned(spark, agg).collect()}
    assert rows == {("d", 4)}


def test_change_feed_raises_on_vacuumed_history(spark, tbl):
    """Round-8 ADVICE medium: a feed range whose commit records were
    vacuumed must raise ChangeFeedTruncated, not silently emit a partial
    feed — both the missing-middle case and the overwrite whose prior
    snapshot (delete half) is gone."""
    from covid_19_data_engineering_spark.sources.versioned import (
        ChangeFeedTruncated,
        read_change_feed,
    )

    write_versioned(_df(spark, [(1, "a")]), tbl)                  # v1
    write_versioned(_df(spark, [(2, "b")]), tbl, mode="append")   # v2
    write_versioned(_df(spark, [(3, "c")]), tbl)                  # v3 overwrite
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    assert table_versions(tbl) == [3]

    # missing middle: v2's record is gone
    with pytest.raises(ChangeFeedTruncated, match="vacuumed"):
        read_change_feed(spark, tbl, 1).collect()
    # overwrite's delete half: from_version = 2 needs snapshot v2
    with pytest.raises(ChangeFeedTruncated, match="delete half"):
        read_change_feed(spark, tbl, 2).collect()
    # a range entirely after the vacuum horizon still works
    write_versioned(_df(spark, [(4, "d")]), tbl, mode="append")   # v4
    rows = read_change_feed(spark, tbl, 3).collect()
    assert [(r["_commit_version"], r["_change_type"], r["id"])
            for r in rows] == [(4, "insert", 4)]


def test_incremental_refresh_falls_back_on_truncated_feed(spark, tmp_path):
    """A refresh whose cursor predates the vacuum horizon recomputes from
    the current snapshot instead of persisting a silently partial fold —
    the invariant (aggregate == fresh groupBy) survives the vacuum."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_count_aggregate,
        refresh_sum_aggregate,
    )

    tbl = str(tmp_path / "src")
    aggc, aggs = str(tmp_path / "aggc"), str(tmp_path / "aggs")
    write_versioned(_ndf(spark, [(1, "a", 10), (2, "b", 20)]), tbl)  # v1
    refresh_count_aggregate(spark, tbl, aggc, "k")
    refresh_sum_aggregate(spark, tbl, aggs, "k", "x")

    write_versioned(_ndf(spark, [(3, "b", 30)]), tbl, mode="append")  # v2
    write_versioned(_ndf(spark, [(4, "c", 40)]), tbl)                 # v3
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    assert table_versions(tbl) == [3]

    # cursor = 1, horizon = 3: the feed is unreplayable -> full recompute
    assert refresh_count_aggregate(spark, tbl, aggc, "k") == 3
    assert refresh_sum_aggregate(spark, tbl, aggs, "k", "x") == 3
    got_c = {(r["k"], r["n_rows"])
             for r in read_versioned(spark, aggc).collect()}
    got_s = {(r["k"], r["n_rows"], r["n_vals"], r["sum_value"])
             for r in read_versioned(spark, aggs).collect()}
    assert got_c == {("c", 1)}
    assert got_s == {("c", 1, 1, 40)}


def test_incremental_cursor_survives_foreign_agg_commits(spark, tmp_path):
    """Round-8 ADVICE low: a compaction commit on the AGGREGATE table
    carries no source_version; the cursor walk must step over it instead
    of raising KeyError and permanently breaking refreshes."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_sum_aggregate,
    )
    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
    )

    tbl, agg = str(tmp_path / "src"), str(tmp_path / "agg")
    write_versioned(_ndf(spark, [(1, "a", 10), (2, "b", 20)]), tbl)
    refresh_sum_aggregate(spark, tbl, agg, "k", "x")
    compact_versioned(spark, agg)  # latest agg commit: no source_version

    # idempotent no-op still resolves the cursor through the compaction
    assert refresh_sum_aggregate(spark, tbl, agg, "k", "x") == 1
    # and a real refresh folds on top of the compacted state
    write_versioned(_ndf(spark, [(3, "a", 5)]), tbl, mode="append")
    refresh_sum_aggregate(spark, tbl, agg, "k", "x")
    got = {(r["k"], r["n_rows"], r["n_vals"], r["sum_value"])
           for r in read_versioned(spark, agg).collect()}
    assert got == {("a", 2, 2, 15), ("b", 1, 1, 20)}


def test_incremental_distinct_aggregate_tracks_the_source(spark, tmp_path):
    """COUNT(DISTINCT) IVM via the support-table decomposition: the
    maintained (key, value, multiplicity) table folds like COUNT, and
    the readout equals a fresh countDistinct at every step — including
    the case where one copy of a value is deleted but another survives
    (the case a bare distinct count cannot fold)."""
    from covid_19_data_engineering_spark.sources.incremental import (
        read_distinct_counts,
        refresh_distinct_aggregate,
    )
    import pyspark.sql.functions as F

    tbl, agg = str(tmp_path / "src"), str(tmp_path / "agg")

    def check():
        got = sorted(
            (r["k"], r["n_distinct"])
            for r in read_distinct_counts(spark, agg, "k").collect())
        want = sorted(
            (r["k"], r["nd"])
            for r in read_versioned(spark, tbl)
            .groupBy("k").agg(F.countDistinct("x").alias("nd"))
            .collect())
        assert got == want

    # a has value 10 twice (multiplicity 2), plus 20; NULL never counts
    write_versioned(
        _ndf(spark, [(1, "a", 10), (2, "a", 10), (3, "a", 20),
                     (4, "b", None), (5, "b", 7)]), tbl)
    assert refresh_distinct_aggregate(spark, tbl, agg, "k", "x") == 1
    check()

    # append a third copy of (a, 10) and a new value
    write_versioned(_ndf(spark, [(6, "a", 10), (7, "b", 8)]),
                    tbl, mode="append")
    refresh_distinct_aggregate(spark, tbl, agg, "k", "x")
    check()

    # overwrite: one copy of (a, 10) survives -> distinct count for a
    # must NOT drop 10; key b vanishes entirely
    write_versioned(_ndf(spark, [(8, "a", 10), (9, "a", 30)]), tbl)
    refresh_distinct_aggregate(spark, tbl, agg, "k", "x")
    check()
    got = {(r["k"], r["n_distinct"])
           for r in read_distinct_counts(spark, agg, "k").collect()}
    assert got == {("a", 2)}

    # idempotent + multi-commit catch-up
    before = current_version(agg)
    assert refresh_distinct_aggregate(spark, tbl, agg, "k", "x") == 3
    assert current_version(agg) == before
    write_versioned(_ndf(spark, [(10, "c", 1)]), tbl, mode="append")
    write_versioned(_ndf(spark, [(11, "c", 1)]), tbl, mode="append")
    refresh_distinct_aggregate(spark, tbl, agg, "k", "x")
    check()


def _jdf(spark, rows, side):
    if side == "l":
        return spark.createDataFrame(rows, "jk long, lval string")
    return spark.createDataFrame(rows, "jk long, rval long")


def test_incremental_join_view_append_only_delta_path(spark, tmp_path):
    """Delta-join maintenance: dView = dA >< B_new UNION A_old >< dB,
    appended — each refresh touches deltas plus the matching side, never
    the whole view. The maintained view must equal the fresh join after
    every refresh, including one-sided and both-sided catch-ups."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_join_view,
    )

    lt, rt, vw = (str(tmp_path / n) for n in ("lt", "rt", "vw"))

    def check():
        got = sorted(
            (r["jk"], r["lval"], r["rval"])
            for r in read_versioned(spark, vw).collect())
        want = sorted(
            (r["jk"], r["lval"], r["rval"])
            for r in read_versioned(spark, lt)
            .join(read_versioned(spark, rt), "jk").collect())
        assert got == want and len(got) > 0

    write_versioned(_jdf(spark, [(1, "a"), (2, "b")], "l"), lt)
    write_versioned(_jdf(spark, [(1, 10), (1, 11), (3, 30)], "r"), rt)
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (1, 1)
    check()

    # left-only delta: key 3 now matches the pre-existing right rows
    write_versioned(_jdf(spark, [(3, "c")], "l"), lt, mode="append")
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (2, 1)
    check()

    # both-sided catch-up across multiple commits: the new left row must
    # pair with BOTH old and new right rows exactly once (dA><B_new
    # covers dA><dB; A_old><dB adds the rest)
    write_versioned(_jdf(spark, [(2, 20)], "r"), rt, mode="append")
    write_versioned(_jdf(spark, [(1, 12)], "r"), rt, mode="append")
    write_versioned(_jdf(spark, [(1, "a2")], "l"), lt, mode="append")
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (3, 3)
    check()

    # idempotent: nothing advanced -> no new view version
    before = current_version(vw)
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (3, 3)
    assert current_version(vw) == before


def test_incremental_join_view_rebuilds_on_overwrite_and_vacuum(
        spark, tmp_path):
    """The append-only delta rule cannot cover an overwrite (deletes) or
    a vacuumed feed; both must fall back to one full recompute that
    overwrites the view — never a silently partial append."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_join_view,
    )

    lt, rt, vw = (str(tmp_path / n) for n in ("lt", "rt", "vw"))
    write_versioned(_jdf(spark, [(1, "a"), (2, "b")], "l"), lt)
    write_versioned(_jdf(spark, [(1, 10), (2, 20)], "r"), rt)
    refresh_join_view(spark, lt, rt, vw, "jk")

    # overwrite the left side: key 1 is gone, key 9 appears
    write_versioned(_jdf(spark, [(9, "z"), (2, "b2")], "l"), lt)
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (2, 1)
    got = sorted((r["jk"], r["lval"], r["rval"])
                 for r in read_versioned(spark, vw).collect())
    assert got == [(2, "b2", 20)]

    # vacuum the right side's history past the cursor, then append: the
    # truncated feed forces a rebuild, and the result is still exact
    write_versioned(_jdf(spark, [(2, 21)], "r"), rt)          # overwrite v2
    write_versioned(_jdf(spark, [(9, 90)], "r"), rt, "append")  # v3
    vacuum_versioned(rt, keep_versions=1, retention_s=0.0)
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (2, 3)
    got = sorted((r["jk"], r["lval"], r["rval"])
                 for r in read_versioned(spark, vw).collect())
    assert got == [(2, "b2", 21), (9, "z", 90)]


def test_streaming_aggregate_maintains_view_across_batches(
        spark, tbl, tmp_path):
    """The streaming CDC -> IVM composition: the events stream lands in a
    versioned table AND the per-user sum aggregate stays in lockstep —
    after the run, maintained state == fresh groupBy of the sink table.
    A straggler commit whose fold was 'lost' (simulated crash between
    table commit and refresh) is caught up by the next stream's refresh,
    and re-running over the same checkpoint changes nothing."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.streaming.events import events_stream
    from covid_19_data_engineering_spark.streaming.stateful import (
        start_streaming_aggregate,
    )

    sf = "/root/testdata/sf0.001"
    agg = str(tmp_path / "agg")
    cols = ["event_id", "user_id", "value"]

    def check():
        got = sorted(
            (r["user_id"], r["n_rows"], round(r["sum_value"], 6))
            for r in read_versioned(spark, agg).collect())
        want = sorted(
            (r["user_id"], r["n"], round(r["s"], 6))
            for r in read_versioned(spark, tbl)
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"),
                                    F.sum("value").alias("s")).collect())
        assert got == want and len(got) > 0

    q = start_streaming_aggregate(
        events_stream(spark, sf).select(*cols), tbl, agg,
        str(tmp_path / "ck1"), "user_id", "value")
    q.awaitTermination(120)
    check()

    # simulated crash: a batch committed to the table but its fold was
    # lost — the aggregate's cursor lags the table
    straggler = spark.createDataFrame(
        [(10_000_001, 1, 5.0), (10_000_002, 2, 7.0)],
        "event_id long, user_id long, value double")
    write_versioned(straggler, tbl, mode="append")

    # a second stream (fresh checkpoint -> new writer) lands more data;
    # its per-batch refresh must fold the straggler too
    q2 = start_streaming_aggregate(
        events_stream(spark, sf).select(*cols), tbl, agg,
        str(tmp_path / "ck2"), "user_id", "value")
    q2.awaitTermination(120)
    check()

    # replay over the first checkpoint: no new versions, aggregate still
    # exact (epoch guard skips the write, refresh no-ops on the cursor)
    v_before = current_version(tbl)
    a_before = current_version(agg)
    q3 = start_streaming_aggregate(
        events_stream(spark, sf).select(*cols), tbl, agg,
        str(tmp_path / "ck1"), "user_id", "value")
    q3.awaitTermination(120)
    assert current_version(tbl) == v_before
    assert current_version(agg) == a_before
    check()


def test_incremental_join_view_cas_blocks_double_fold(spark, tmp_path):
    """Two racing join refreshers must not append the same delta twice:
    the append is a CAS on the view version the cursor was read from.
    Simulated by committing a competing refresh between cursor read and
    append — provoked via a forged view advance — then asserting the
    retry path lands on the exact join."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_join_view,
    )

    lt, rt, vw = (str(tmp_path / n) for n in ("lt", "rt", "vw"))
    write_versioned(_jdf(spark, [(1, "a")], "l"), lt)
    write_versioned(_jdf(spark, [(1, 10)], "r"), rt)
    refresh_join_view(spark, lt, rt, vw, "jk")

    # racer: a second refresher folds the next delta first
    write_versioned(_jdf(spark, [(1, 11)], "r"), rt, mode="append")
    refresh_join_view(spark, lt, rt, vw, "jk")
    # stale poller: its CAS loses (view advanced), retry sees the
    # advanced cursor and no-ops — the pair (1, 11) lands exactly once
    assert refresh_join_view(spark, lt, rt, vw, "jk") == (1, 2)
    got = sorted((r["jk"], r["rval"])
                 for r in read_versioned(spark, vw).collect())
    assert got == [(1, 10), (1, 11)]


def test_incremental_join_view_cas_retry_under_real_race(
        spark, tmp_path, monkeypatch):
    """Drive the CommitConflict retry branch for real: a competing
    refresher folds the same cursor range BETWEEN this poller's cursor
    read and its append (injected at the write seam), so the CAS loses,
    the retry re-reads the advanced cursor, and the pair lands exactly
    once."""
    import covid_19_data_engineering_spark.sources.incremental as I

    lt, rt, vw = (str(tmp_path / n) for n in ("lt", "rt", "vw"))
    write_versioned(_jdf(spark, [(1, "a")], "l"), lt)
    write_versioned(_jdf(spark, [(1, 10)], "r"), rt)
    I.refresh_join_view(spark, lt, rt, vw, "jk")
    write_versioned(_jdf(spark, [(1, 11)], "r"), rt, mode="append")

    real_write = I.write_versioned
    fired = {"done": False}

    def racing_write(df, path, mode="overwrite", **kw):
        if not fired["done"] and path == vw and mode == "append":
            fired["done"] = True
            # the competitor folds the same range first (its own append
            # goes through this wrapper with fired set -> real write)
            I.refresh_join_view(spark, lt, rt, vw, "jk")
        return real_write(df, path, mode=mode, **kw)

    monkeypatch.setattr(I, "write_versioned", racing_write)
    assert I.refresh_join_view(spark, lt, rt, vw, "jk") == (1, 2)
    assert fired["done"], "race was not injected"
    got = sorted((r["jk"], r["rval"])
                 for r in read_versioned(spark, vw).collect())
    assert got == [(1, 10), (1, 11)]


def test_incremental_folds_treat_null_key_as_a_real_group(spark, tmp_path):
    """Round-9 review finding: a fresh groupBy makes NULL a real group,
    so every fold join must match NULL to NULL — otherwise the NULL-key
    row duplicates on each refresh (count/sum/distinct) or its stale
    min/max survives a delete forever (minmax)."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_minmax_aggregate,
        refresh_sum_aggregate,
    )
    import pyspark.sql.functions as F

    rows = [(1, None, 10), (2, None, 30), (3, "a", 5)]
    tbl = str(tmp_path / "src")
    aggs, aggm = str(tmp_path / "aggs"), str(tmp_path / "aggm")
    write_versioned(
        spark.createDataFrame(rows, "id long, k string, x long"), tbl)
    refresh_sum_aggregate(spark, tbl, aggs, "k", "x")
    refresh_minmax_aggregate(spark, tbl, aggm, "k", "x")

    # append into the NULL group: must FOLD into the existing row
    write_versioned(_ndf(spark, [(4, None, 2)]), tbl, mode="append")
    refresh_sum_aggregate(spark, tbl, aggs, "k", "x")
    refresh_minmax_aggregate(spark, tbl, aggm, "k", "x")
    got_s = sorted(((r["k"], r["n_rows"], r["sum_value"])
                    for r in read_versioned(spark, aggs).collect()),
                   key=lambda t: (t[0] is not None, t[0] or ""))
    assert got_s == [(None, 3, 42), ("a", 1, 5)]

    # overwrite deletes the NULL group's minimum: the per-key recompute
    # must include the NULL group (semi join must match NULL)
    write_versioned(_ndf(spark, [(5, None, 30), (6, "a", 5)]), tbl)
    refresh_minmax_aggregate(spark, tbl, aggm, "k", "x")
    got_m = sorted(((r["k"], r["min_value"], r["max_value"])
                    for r in read_versioned(spark, aggm).collect()),
                   key=lambda t: (t[0] is not None, t[0] or ""))
    assert got_m == [(None, 30, 30), ("a", 5, 5)]


# --------------------------------------------------------------------------
# Round 9: additive schema evolution + cast-and-rewrite type widening.
# --------------------------------------------------------------------------


def test_merge_schema_append_adds_nullable_column(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    wide = spark.createDataFrame([(2, "b", 9.5)],
                                 "id long, v string, score double")
    assert write_versioned(wide, tbl, mode="append", merge_schema=True) == 2
    out = {r["id"]: r for r in read_versioned(spark, tbl).collect()}
    assert set(out) == {1, 2}
    assert out[1]["score"] is None          # pre-evolution file null-fills
    assert out[2]["score"] == 9.5
    # union schema: base columns first, new column appended and nullable
    schema = read_versioned(spark, tbl).schema
    assert [f.name for f in schema.fields] == ["id", "v", "score"]
    assert schema["score"].nullable


def test_merge_schema_time_travel_keeps_old_schema(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    wide = spark.createDataFrame([(2, "b", 9.5)],
                                 "id long, v string, score double")
    write_versioned(wide, tbl, mode="append", merge_schema=True)
    v1 = read_versioned(spark, tbl, version=1)
    assert [f.name for f in v1.schema.fields] == ["id", "v"]
    assert v1.count() == 1


def test_append_without_merge_schema_still_rejects(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    wide = spark.createDataFrame([(2, "b", 9.5)],
                                 "id long, v string, score double")
    with pytest.raises(ValueError, match="exact-match"):
        write_versioned(wide, tbl, mode="append")


def test_merge_schema_rejects_drops_and_type_changes(spark, tbl):
    write_versioned(_df(spark, [(1, "a")]), tbl)
    dropped = spark.createDataFrame([(2,)], "id long")
    with pytest.raises(ValueError, match="drops column"):
        write_versioned(dropped, tbl, mode="append", merge_schema=True)
    retyped = spark.createDataFrame([(2, 7)], "id long, v long")
    with pytest.raises(ValueError, match="changes column"):
        write_versioned(retyped, tbl, mode="append", merge_schema=True)


def test_merge_schema_chain_and_second_evolution(spark, tbl):
    """Two successive evolutions stack; appends after them may carry the
    full union schema exactly."""
    write_versioned(_df(spark, [(1, "a")]), tbl)
    w1 = spark.createDataFrame([(2, "b", 9.5)],
                               "id long, v string, score double")
    write_versioned(w1, tbl, mode="append", merge_schema=True)
    w2 = spark.createDataFrame([(3, "c", 1.5, "x")],
                               "id long, v string, score double, tag string")
    write_versioned(w2, tbl, mode="append", merge_schema=True)
    out = {r["id"]: r for r in read_versioned(spark, tbl).collect()}
    assert [f.name for f in read_versioned(spark, tbl).schema.fields] == [
        "id", "v", "score", "tag"]
    assert out[1]["score"] is None and out[1]["tag"] is None
    assert out[2]["score"] == 9.5 and out[2]["tag"] is None
    assert out[3]["tag"] == "x"


def test_change_feed_across_schema_evolution(spark, tbl):
    from covid_19_data_engineering_spark.sources.versioned import (
        read_change_feed,
    )

    write_versioned(_df(spark, [(1, "a")]), tbl)
    wide = spark.createDataFrame([(2, "b", 9.5)],
                                 "id long, v string, score double")
    write_versioned(wide, tbl, mode="append", merge_schema=True)
    feed = read_change_feed(spark, tbl, from_version=0).collect()
    by_id = {r["id"]: r for r in feed}
    assert by_id[1]["_change_type"] == "insert"
    assert by_id[1]["score"] is None        # pre-evolution commit aligned
    assert by_id[2]["score"] == 9.5


def test_alter_versioned_column_type_widens(spark, tbl):
    from covid_19_data_engineering_spark.sources.versioned import (
        alter_versioned_column_type,
    )

    narrow = spark.createDataFrame([(1, 10), (2, 20)], "id long, n int")
    write_versioned(narrow, tbl)
    v = alter_versioned_column_type(spark, tbl, "n", "bigint")
    assert v == 2
    out = read_versioned(spark, tbl)
    assert dict(out.dtypes)["n"] == "bigint"
    assert sorted(r["n"] for r in out.collect()) == [10, 20]
    # the rewrite is an overwrite commit carrying the schema_change marker
    assert table_history(tbl)[0]["action"] == "overwrite"
    rec = json.load(open(os.path.join(tbl, "_log", "00000002.json")))
    assert rec["schema_change"] == {"column": "n", "to": "bigint"}
    # time travel still reads the pre-widening schema
    assert dict(read_versioned(spark, tbl, version=1).dtypes)["n"] == "int"
    with pytest.raises(ValueError, match="no column"):
        alter_versioned_column_type(spark, tbl, "missing", "bigint")


def test_bloom_point_lookup_prunes_files(spark, tmp_path):
    """write_versioned(bloom_cols=['k']) records a per-file Bloom filter;
    read_versioned(point={'k': v}) must (a) never lose a committed value
    (no false negatives: every present key's rows come back complete) and
    (b) actually skip files for absent keys (the point of the index —
    with 40 files and 16 bits/key the expected false-positive rate per
    file is ~0.24%, so an absent probe should plan ~0 files)."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "bloomed")
    # 40 files, disjoint key ranges per file, interleaved enough that
    # min/max stats alone could never isolate a point
    df = (
        spark.range(4000)
        .select((F.col("id") * 7919 % 4000).alias("k"),
                F.col("id").alias("payload"))
        .repartition(40)
    )
    write_versioned(df, path, bloom_cols=["k"])

    # no false negatives, exact rows back
    for probe in (0, 1234, 3999):
        got = (read_versioned(spark, path, point={"k": probe})
               .where(F.col("k") == probe).collect())
        assert len(got) == 1, probe

    # absent keys prune (count planned files via inputFiles)
    full = len(read_versioned(spark, path).inputFiles())
    assert full == 40
    pruned_counts = [
        len(read_versioned(spark, path, point={"k": absent}).inputFiles())
        for absent in (4001, 99999, 123456)
    ]
    assert max(pruned_counts) <= 4, pruned_counts  # ~0 expected, 4 = slack

    # rows stay correct THROUGH the pruned plan (empty result, no error)
    assert (read_versioned(spark, path, point={"k": 99999})
            .where(F.col("k") == 99999).count()) == 0


def test_bloom_survives_append_and_unbloomd_files_are_kept(spark, tmp_path):
    """Appends without bloom_cols contribute files with NO filter — those
    files must always be kept by a point read (conservative contract),
    while the bloomed base files still prune."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "mixed")
    base = spark.range(1000).select(F.col("id").alias("k")).repartition(10)
    write_versioned(base, path, bloom_cols=["k"])
    extra = (spark.range(1000, 1100).select(F.col("id").alias("k"))
             .repartition(2))
    write_versioned(extra, path, mode="append")  # no bloom on this commit

    # absent key: the 10 bloomed files prune, the 2 unbloomed stay
    files = read_versioned(spark, path, point={"k": 999999}).inputFiles()
    assert len(files) <= 2 + 1  # unbloomed appends + FP slack
    # a value that lives in the UNBLOOMED append is always found
    assert (read_versioned(spark, path, point={"k": 1050})
            .where(F.col("k") == 1050).count()) == 1


def test_bloom_ragged_file_sizes(spark, tmp_path):
    """Files whose row counts don't divide into whole 64-bit words (e.g.
    n=5 -> 80 raw bits) must still round the filter to word granularity —
    a ragged bitmap would drop high positions at pack time and crash the
    driver-side probe with an out-of-range byte index."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "ragged")
    df = spark.range(11).select(F.col("id").alias("k")).repartition(2)
    write_versioned(df, path, bloom_cols=["k"])
    for probe in range(11):  # every committed key found
        assert (read_versioned(spark, path, point={"k": probe})
                .where(F.col("k") == probe).count()) == 1
    # absent probes never crash (and usually prune both tiny files)
    assert (read_versioned(spark, path, point={"k": 777})
            .where(F.col("k") == 777).count()) == 0


def test_merge_versioned_upserts_by_key(spark, tmp_path):
    """MERGE semantics: matched keys are wholly replaced (both update
    rows of a doubled key survive), unmatched keys insert, untouched rows
    ride through; the pre-merge snapshot still time-travels, and the
    change feed reports the rewrite as delete+insert."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.versioned import (
        merge_versioned,
        read_change_feed,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    v1 = write_versioned(base, path)
    updates = spark.createDataFrame(
        [(2, "B1"), (2, "B2"), (4, "d")], "k long, v string")
    v2 = merge_versioned(spark, path, updates, key="k")

    got = {(r["k"], r["v"]) for r in read_versioned(spark, path).collect()}
    assert got == {(1, "a"), (3, "c"), (2, "B1"), (2, "B2"), (4, "d")}
    # time travel still reaches the pre-merge snapshot
    old = {(r["k"], r["v"])
           for r in read_versioned(spark, path, version=v1).collect()}
    assert old == {(1, "a"), (2, "b"), (3, "c")}
    # change feed: the overwrite surfaces as delete(old snapshot) +
    # insert(new snapshot)
    feed = read_change_feed(spark, path, from_version=v1, to_version=v2)
    kinds = {r["_change_type"] for r in feed.collect()}
    assert kinds == {"insert", "delete"}

    # schema / key guards
    import pytest as _pytest
    with _pytest.raises(ValueError):
        merge_versioned(spark, path,
                        spark.createDataFrame([(1,)], "k long"), key="k")
    with _pytest.raises(ValueError):
        merge_versioned(spark, path, updates, key="missing")


def test_delete_versioned_predicate_and_history(spark, tmp_path):
    """DELETE removes exactly the matching rows from the new snapshot;
    history retains them until vacuum (the documented GDPR caveat)."""
    from covid_19_data_engineering_spark.sources.versioned import (
        delete_versioned,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "deleted")
    v1 = write_versioned(
        spark.createDataFrame([(i, i % 3) for i in range(30)],
                              "k long, grp long"), path)
    delete_versioned(spark, path, "grp = 1")
    now = read_versioned(spark, path)
    assert now.where("grp = 1").count() == 0
    assert now.count() == 20
    assert read_versioned(spark, path, version=v1).count() == 30


def test_zorder_compaction_enables_two_dimensional_pruning(spark, tmp_path):
    """compact_versioned(zorder=...) is OPTIMIZE ZORDER BY: after the
    rewrite, a narrow range predicate on EITHER key column prunes most
    files via the commit-recorded min/max stats, where the hash-shuffled
    pre-compaction layout prunes nothing."""
    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "zordered")
    df = (
        spark.range(8000)
        .select((F.col("id") * 7919 % 8000).alias("a"),
                (F.col("id") * 104729 % 8000).alias("b"))
        .repartition(16)  # hash layout: every file spans both full ranges
    )
    write_versioned(df, path)
    full = len(read_versioned(spark, path,
                              prune={"a": (0, 200)}).inputFiles())
    assert full == 16  # interleaved ranges: min/max prunes nothing
    compact_versioned(spark, path, target_files=16, zorder=("a", "b"))
    for col in ("a", "b"):
        pruned = len(read_versioned(spark, path,
                                    prune={col: (0, 200)}).inputFiles())
        assert pruned <= 8, (col, pruned)
    # content unchanged
    assert read_versioned(spark, path).count() == 8000


def test_merge_versioned_matches_dict_model_seeded(spark, tmp_path):
    """Randomized (seeded) model check: MERGE against the obvious python
    dict model — for single-row-per-key updates, merged table ==
    {**base_by_key, **updates_by_key} — across three seeds of random
    bases/updates with overlapping and fresh keys."""
    import random

    from covid_19_data_engineering_spark.sources.versioned import (
        merge_versioned,
        read_versioned,
        write_versioned,
    )

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        base = {k: rng.randint(0, 10**6) for k in rng.sample(range(50), 20)}
        upd = {k: rng.randint(0, 10**6)
               for k in rng.sample(range(60), 15)}  # overlaps + fresh keys
        path = str(tmp_path / f"model_{seed}")
        write_versioned(
            spark.createDataFrame(list(base.items()), "k long, v long"),
            path)
        merge_versioned(
            spark,
            path,
            spark.createDataFrame(list(upd.items()), "k long, v long"),
            key="k",
        )
        got = {r["k"]: r["v"] for r in read_versioned(spark, path).collect()}
        assert got == {**base, **upd}, seed


def test_bloom_no_false_negatives_seeded(spark, tmp_path):
    """Randomized (seeded) probe sweep: every committed key must survive
    the point prune (no false negatives, the bloom contract's hard half),
    across random key sets including negatives and large magnitudes."""
    import random

    import pyspark.sql.functions as F

    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
        write_versioned,
    )

    rng = random.Random(1234)
    keys = list({rng.randint(-10**9, 10**9) for _ in range(60)})
    path = str(tmp_path / "fnsweep")
    write_versioned(
        spark.createDataFrame([(k,) for k in keys], "k long")
        .repartition(6),
        path, bloom_cols=["k"])
    for probe in rng.sample(keys, 25):
        n = (read_versioned(spark, path, point={"k": probe})
             .where(F.col("k") == probe).count())
        assert n == 1, probe


# --------------------------------------------------------------------------
# Shallow clone: zero-copy metadata-only table fork (clone_versioned).
# --------------------------------------------------------------------------


def _clone_imports():
    from covid_19_data_engineering_spark.sources.versioned import (
        clone_versioned,
        compact_versioned,
        merge_versioned,
        snapshot_metadata_aggregates,
    )
    return (clone_versioned, compact_versioned, merge_versioned,
            snapshot_metadata_aggregates)


def test_clone_is_zero_copy_and_reads_the_source_snapshot(
        spark, tmp_path):
    clone_versioned, _, _, snapshot_metadata_aggregates = _clone_imports()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, [(1, "a"), (2, "b")]), src)
    write_versioned(_df(spark, [(3, "c")]), src, mode="append")
    assert clone_versioned(src, dst) == 1
    got = {r["id"] for r in read_versioned(spark, dst).collect()}
    assert got == {1, 2, 3}
    # ZERO data files under the clone: pure metadata fork
    assert not os.path.isdir(os.path.join(dst, "data"))
    # commit-recorded footer metadata travels with the clone
    agg = snapshot_metadata_aggregates(dst, cols=("id",))
    assert agg["n_rows"] == 3


def test_clone_evolves_independently_of_the_source(spark, tmp_path):
    clone_versioned, _, _, _ = _clone_imports()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, [(1, "a")]), src)
    clone_versioned(src, dst)
    write_versioned(_df(spark, [(7, "x")]), dst, mode="append")
    write_versioned(_df(spark, [(8, "y")]), src, mode="append")
    assert {r["id"] for r in read_versioned(spark, src).collect()} \
        == {1, 8}
    assert {r["id"] for r in read_versioned(spark, dst).collect()} \
        == {1, 7}
    # time travel on the clone still sees the pristine snapshot
    assert {r["id"] for r in read_versioned(spark, dst, version=1)
            .collect()} == {1}


def test_clone_pins_a_version_and_rejects_nonempty_targets(
        spark, tmp_path):
    clone_versioned, _, _, _ = _clone_imports()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, [(1, "a")]), src)
    write_versioned(_df(spark, [(2, "b")]), src, mode="append")
    clone_versioned(src, dst, version=1)
    assert {r["id"] for r in read_versioned(spark, dst).collect()} == {1}
    with pytest.raises(ValueError, match="already has commits"):
        clone_versioned(src, dst)


def test_merge_on_clone_touches_no_source_file(spark, tmp_path):
    clone_versioned, _, merge_versioned, _ = _clone_imports()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, [(1, "a"), (2, "b")]), src)
    before = {
        os.path.join(p, n)
        for p, _, ns in os.walk(src) for n in ns
    }
    clone_versioned(src, dst)
    merge_versioned(spark, dst,
                    _df(spark, [(2, "B!"), (9, "new")]), key="id")
    after = {
        os.path.join(p, n)
        for p, _, ns in os.walk(src) for n in ns
    }
    assert before == after  # the source tree is byte-for-byte untouched
    got = {r["id"]: r["v"] for r in read_versioned(spark, dst).collect()}
    assert got == {1: "a", 2: "B!", 9: "new"}
    assert {r["id"]: r["v"]
            for r in read_versioned(spark, src).collect()} \
        == {1: "a", 2: "b"}


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    clone_versioned, _, _, _ = _clone_imports()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, [(1, "a")]), src)
    clone_versioned(src, dst)
    # rewrite the clone fully, then vacuum it aggressively
    write_versioned(_df(spark, [(5, "e")]), dst, mode="overwrite")
    deleted = vacuum_versioned(dst, keep_versions=1, retention_s=0.0)
    # nothing under the SOURCE was deleted (vacuum only walks dst/data)
    assert all(not os.path.isabs(d) for d in deleted)
    assert {r["id"] for r in read_versioned(spark, src).collect()} == {1}


def test_compact_makes_the_clone_self_contained(spark, tmp_path):
    (clone_versioned, compact_versioned, _,
     _) = _clone_imports()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, [(1, "a"), (2, "b")]), src)
    clone_versioned(src, dst)
    compact_versioned(spark, dst)
    from covid_19_data_engineering_spark.sources.versioned import (
        _snapshot_files,
    )
    files = _snapshot_files(dst, current_version(dst))
    assert files and all(not os.path.isabs(f) for f in files)
    # the source can now vacuum away entirely without hurting the clone
    write_versioned(_df(spark, [(9, "z")]), src, mode="overwrite")
    vacuum_versioned(src, keep_versions=1, retention_s=0.0)
    assert {r["id"] for r in read_versioned(spark, dst).collect()} \
        == {1, 2}


# --------------------------------------------------------------------------
# RESTORE: forward-moving time-travel rollback (restore_versioned).
# --------------------------------------------------------------------------


def test_restore_rolls_forward_to_an_old_snapshot(spark, tbl):
    from covid_19_data_engineering_spark.sources.versioned import (
        restore_versioned,
    )

    write_versioned(_df(spark, [(1, "a")]), tbl)
    write_versioned(_df(spark, [(2, "b")]), tbl, mode="append")
    write_versioned(_df(spark, [(9, "oops")]), tbl, mode="overwrite")
    v = restore_versioned(tbl, 2)
    assert v == 4  # history moves FORWARD
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} \
        == {1, 2}
    # the bad version stays readable for audit until vacuumed
    assert {r["id"] for r in read_versioned(spark, tbl, version=3)
            .collect()} == {9}
    # life continues on top of the restore
    write_versioned(_df(spark, [(3, "c")]), tbl, mode="append")
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} \
        == {1, 2, 3}


def test_restore_is_metadata_only_and_vacuum_safe(spark, tbl):
    import os as _os

    from covid_19_data_engineering_spark.sources.versioned import (
        restore_versioned,
    )

    write_versioned(_df(spark, [(1, "a")]), tbl)
    write_versioned(_df(spark, [(9, "bad")]), tbl, mode="overwrite")
    n_parquet_before = sum(
        1 for p, _, ns in _os.walk(tbl) for n in ns
        if n.endswith(".parquet"))
    restore_versioned(tbl, 1)
    n_parquet_after = sum(
        1 for p, _, ns in _os.walk(tbl) for n in ns
        if n.endswith(".parquet"))
    assert n_parquet_after == n_parquet_before  # zero data written
    # an aggressive vacuum keeps the restored snapshot's files
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} == {1}


def test_restore_rejects_unknown_versions(spark, tbl):
    from covid_19_data_engineering_spark.sources.versioned import (
        restore_versioned,
    )

    write_versioned(_df(spark, [(1, "a")]), tbl)
    with pytest.raises(ValueError, match="not committed"):
        restore_versioned(tbl, 7)


# --------------------------------------------------------------------------
# CHECK constraints: declared contract enforced on every write path.
# --------------------------------------------------------------------------


def _constraint_imports():
    from covid_19_data_engineering_spark.sources.versioned import (
        ConstraintViolation,
        add_check_constraint,
        drop_check_constraint,
        table_check_constraints,
    )
    return (ConstraintViolation, add_check_constraint,
            drop_check_constraint, table_check_constraints)


def test_check_constraint_enforced_on_append_and_null_passes(spark, tbl):
    (ConstraintViolation, add_check_constraint, _,
     table_check_constraints) = _constraint_imports()
    df = spark.createDataFrame([(1, 10.0)], "id long, price double")
    write_versioned(df, tbl)
    add_check_constraint(spark, tbl, "price_pos", "price > 0")
    assert table_check_constraints(tbl) == {"price_pos": "price > 0"}
    # a TRUE row and a NULL row both pass (SQL CHECK semantics)
    ok = spark.createDataFrame([(2, 5.0), (3, None)],
                               "id long, price double")
    write_versioned(ok, tbl, mode="append")
    # a FALSE row is refused before any data file is staged
    bad = spark.createDataFrame([(4, -1.0)], "id long, price double")
    with pytest.raises(ConstraintViolation, match="price_pos"):
        write_versioned(bad, tbl, mode="append")
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} \
        == {1, 2, 3}


def test_check_constraint_validates_existing_data_on_add(spark, tbl):
    (ConstraintViolation, add_check_constraint, _,
     _) = _constraint_imports()
    write_versioned(
        spark.createDataFrame([(1, -3.0)], "id long, price double"), tbl)
    with pytest.raises(ConstraintViolation, match="price_pos"):
        add_check_constraint(spark, tbl, "price_pos", "price > 0")


def test_check_constraint_survives_overwrite_and_drop_restores(
        spark, tbl):
    (ConstraintViolation, add_check_constraint, drop_check_constraint,
     table_check_constraints) = _constraint_imports()
    write_versioned(
        spark.createDataFrame([(1, 1.0)], "id long, price double"), tbl)
    add_check_constraint(spark, tbl, "price_pos", "price > 0")
    # an overwrite does NOT shed the contract (unlike bloom_cols)
    with pytest.raises(ConstraintViolation):
        write_versioned(
            spark.createDataFrame([(9, -9.0)], "id long, price double"),
            tbl, mode="overwrite")
    write_versioned(
        spark.createDataFrame([(9, 9.0)], "id long, price double"),
        tbl, mode="overwrite")
    assert table_check_constraints(tbl) == {"price_pos": "price > 0"}
    drop_check_constraint(tbl, "price_pos")
    assert table_check_constraints(tbl) == {}
    write_versioned(
        spark.createDataFrame([(4, -1.0)], "id long, price double"),
        tbl, mode="append")  # no longer enforced
    with pytest.raises(KeyError):
        drop_check_constraint(tbl, "price_pos")


def test_check_constraint_enforced_through_merge(spark, tbl):
    (ConstraintViolation, add_check_constraint, _,
     _) = _constraint_imports()
    from covid_19_data_engineering_spark.sources.versioned import (
        merge_versioned,
    )

    write_versioned(
        spark.createDataFrame([(1, 1.0), (2, 2.0)],
                              "id long, price double"), tbl)
    add_check_constraint(spark, tbl, "price_pos", "price > 0")
    with pytest.raises(ConstraintViolation):
        merge_versioned(
            spark, tbl,
            spark.createDataFrame([(2, -5.0)], "id long, price double"),
            key="id")
    assert {r["id"]: r["price"]
            for r in read_versioned(spark, tbl).collect()} \
        == {1: 1.0, 2: 2.0}


def test_check_constraint_survives_vacuum_via_checkpoint(spark, tbl,
                                                         monkeypatch):
    import covid_19_data_engineering_spark.sources.versioned as V

    (_, add_check_constraint, _,
     table_check_constraints) = _constraint_imports()
    monkeypatch.setattr(V, "CHECKPOINT_INTERVAL", 4)
    write_versioned(
        spark.createDataFrame([(1, 1.0)], "id long, price double"), tbl)
    add_check_constraint(spark, tbl, "price_pos", "price > 0")
    for i in range(6):
        write_versioned(
            spark.createDataFrame([(10 + i, 1.0)],
                                  "id long, price double"),
            tbl, mode="append")
    vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    # the declaring commit may be vacuumed away; the anchor checkpoint
    # answers for the property
    assert table_check_constraints(tbl) == {"price_pos": "price > 0"}
    with pytest.raises(V.ConstraintViolation):
        write_versioned(
            spark.createDataFrame([(99, -1.0)], "id long, price double"),
            tbl, mode="append")


def test_clone_of_clone_references_original_files(spark, tmp_path):
    """A clone of a clone passes absolute members through: the grand-
    clone references the ORIGINAL source files directly (no chain of
    indirection to resolve), and a restore on a clone stays inside the
    clone's own history."""
    from covid_19_data_engineering_spark.sources.versioned import (
        _snapshot_files,
        clone_versioned,
        restore_versioned,
    )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    c = str(tmp_path / "c")
    write_versioned(_df(spark, [(1, "x"), (2, "y")]), a)
    clone_versioned(a, b)
    clone_versioned(b, c)
    src_abs = {os.path.join(os.path.abspath(a), f)
               for f in _snapshot_files(a, 1)}
    assert set(_snapshot_files(c, 1)) == src_abs
    assert {r["id"] for r in read_versioned(spark, c).collect()} == {1, 2}
    # restore on a clone: roll b back over its own append
    write_versioned(_df(spark, [(7, "z")]), b, mode="append")
    restore_versioned(b, 1)
    assert {r["id"] for r in read_versioned(spark, b).collect()} == {1, 2}
    assert {r["id"] for r in read_versioned(spark, a).collect()} == {1, 2}


def test_lifecycle_random_sequences_match_state_model(spark, tmp_path):
    """Seeded random-sequence model check over the FULL table lifecycle
    — append / overwrite / MERGE / DELETE / compact / RESTORE / vacuum
    in arbitrary order — against the obvious python model (a dict per
    committed version). After every operation the latest read must equal
    the model's current state, a random surviving version must time-
    travel to the model's recorded state, and RESTORE must jump the
    current state to exactly the target version's dict."""
    import random

    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
        delete_versioned,
        merge_versioned,
        restore_versioned,
    )

    def as_df(state: dict):
        return spark.createDataFrame(
            list(state.items()) or [], "k long, v long")

    for seed in (11, 42):
        rng = random.Random(seed)
        path = str(tmp_path / f"life_{seed}")
        cur = {k: rng.randint(0, 999) for k in range(5)}
        v = write_versioned(as_df(cur), path)
        hist = {v: dict(cur)}
        next_key = 100
        for _ in range(11):
            op = rng.choice(["append", "merge", "delete", "overwrite",
                             "compact", "restore", "vacuum"])
            if op == "append":
                fresh = {next_key + i: rng.randint(0, 999)
                         for i in range(rng.randint(1, 4))}
                next_key += 10
                v = write_versioned(as_df(fresh), path, mode="append")
                cur = {**cur, **fresh}
            elif op == "merge":
                keys = (rng.sample(sorted(cur), min(2, len(cur)))
                        + [next_key])
                next_key += 10
                upd = {k: rng.randint(0, 999) for k in keys}
                v = merge_versioned(spark, path, as_df(upd), key="k")
                cur = {**cur, **upd}
            elif op == "delete" and cur:
                v = delete_versioned(spark, path, "v % 3 = 0")
                cur = {k: val for k, val in cur.items() if val % 3 != 0}
            elif op == "overwrite":
                cur = {next_key + i: rng.randint(0, 999)
                       for i in range(3)}
                next_key += 10
                v = write_versioned(as_df(cur), path)
            elif op == "compact":
                v = compact_versioned(spark, path)
            elif op == "restore":
                target = rng.choice(
                    [t for t in table_versions(path) if t in hist])
                v = restore_versioned(path, target)
                cur = dict(hist[target])
            elif op == "vacuum":
                vacuum_versioned(path, keep_versions=2, retention_s=0.0)
                hist = {t: s for t, s in hist.items()
                        if t in table_versions(path)}
                continue
            hist[v] = dict(cur)
            got = {r["k"]: r["v"]
                   for r in read_versioned(spark, path).collect()}
            assert got == cur, (seed, op, v)
            probe = rng.choice(
                [t for t in table_versions(path) if t in hist])
            got_t = {r["k"]: r["v"]
                     for r in read_versioned(spark, path,
                                             version=probe).collect()}
            assert got_t == hist[probe], (seed, op, probe)


# --------------------------------------------------------------------------
# Per-file NDV sketches: metadata-only APPROX COUNT DISTINCT.
# --------------------------------------------------------------------------


def test_ndv_estimate_metadata_only_and_merges_across_commits(
        spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_ndv_estimate,
    )

    path = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(i, f"u{i % 300}") for i in range(600)], "id long, u string")
    write_versioned(df1.repartition(3), path, bloom_cols=["u"])
    est1 = snapshot_ndv_estimate(path, "u")
    assert est1 is not None and abs(est1 - 300) / 300 < 0.15
    # an append with 200 FRESH keys: the merged sketch must move up
    df2 = spark.createDataFrame(
        [(i, f"w{i % 200}") for i in range(400)], "id long, u string")
    write_versioned(df2.repartition(2), path, mode="append",
                    bloom_cols=["u"])
    est2 = snapshot_ndv_estimate(path, "u")
    assert est2 is not None and abs(est2 - 500) / 500 < 0.15
    # undeclared column -> None (fall back to a scan, never a guess)
    assert snapshot_ndv_estimate(path, "id") is None


def test_ndv_missing_registers_returns_none_not_undercount(
        spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_ndv_estimate,
    )

    path = str(tmp_path / "t")
    write_versioned(
        spark.createDataFrame([(1, "a")], "id long, u string"), path,
        bloom_cols=["u"])
    # a legacy-style append WITHOUT the declaration leaves one live
    # file with no registers: the estimate must refuse, not undercount
    write_versioned(
        spark.createDataFrame([(2, "b")], "id long, u string"), path,
        mode="append")
    assert snapshot_ndv_estimate(path, "u") is None


def test_ndv_survives_merge_rewrite_clone_and_restore(spark, tmp_path):
    from covid_19_data_engineering_spark.sources.versioned import (
        clone_versioned,
        merge_versioned,
        restore_versioned,
        snapshot_ndv_estimate,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    base = spark.createDataFrame(
        [(i, f"k{i}") for i in range(400)], "id long, u string")
    write_versioned(base.repartition(4), src, bloom_cols=["u"])
    merge_versioned(
        spark, src,
        spark.createDataFrame([(5, "k5x"), (900, "k900")],
                              "id long, u string"),
        key="id")
    est = snapshot_ndv_estimate(src, "u")
    assert est is not None and abs(est - 402) / 402 < 0.15
    clone_versioned(src, dst)
    est_c = snapshot_ndv_estimate(dst, "u")
    assert est_c == est  # the clone carries the sketch byte-for-byte
    restore_versioned(src, 1)
    est_r = snapshot_ndv_estimate(src, "u")
    assert est_r is not None and abs(est_r - 400) / 400 < 0.15


def test_vacuum_dry_run_previews_without_touching_disk(spark, tbl):
    """dry_run lists exactly what the real vacuum would delete, while
    leaving every file, commit record, and checkpoint untouched."""
    write_versioned(_df(spark, [(1, "a")]), tbl)
    write_versioned(_df(spark, [(2, "b")]), tbl, mode="overwrite")
    write_versioned(_df(spark, [(3, "c")]), tbl, mode="overwrite")
    before = sorted(
        os.path.join(p, n) for p, _, ns in os.walk(tbl) for n in ns)
    preview = vacuum_versioned(tbl, keep_versions=1, retention_s=0.0,
                               dry_run=True)
    after = sorted(
        os.path.join(p, n) for p, _, ns in os.walk(tbl) for n in ns)
    assert preview and after == before  # nothing moved
    real = vacuum_versioned(tbl, keep_versions=1, retention_s=0.0)
    assert sorted(real) == sorted(preview)  # the preview was exact
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} == {3}

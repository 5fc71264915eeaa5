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
    deleted = vacuum_versioned(tbl, keep_versions=1)
    # v1's file and the orphan go; v2+v3 files stay (v3's snapshot needs v2)
    assert any("orphan" in d for d in deleted)
    assert {r["id"] for r in read_versioned(spark, tbl).collect()} == {2, 3}
    assert {r["id"] for r in read_versioned(spark, tbl, version=2).collect()} == {2}
    with pytest.raises((ValueError, FileNotFoundError)):
        read_versioned(spark, tbl, version=1)


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

"""Planted-frame semantics for the incremental-load operators
(operators/merge.py): SCD-2 version transitions and CDC diff classes.
Oracle value-parity runs through the registry harness."""

from __future__ import annotations

import pytest

from covid_19_data_engineering_spark.operators.merge import scd2_merge, snapshot_diff


@pytest.fixture(scope="module")
def dim(spark):
    rows = [(1, 100.0, "A", 1), (2, 200.0, "B", 3), (3, 300.0, "C", 1)]
    return spark.createDataFrame(
        rows, "k long, bal double, seg string, version int"
    )


def test_scd2_closes_and_appends(spark, dim):
    updates = spark.createDataFrame(
        [(2, 250.0, "B"),       # changed balance -> new version
         (3, 300.0, "C"),       # identical -> no-op
         (9, 999.0, "Z")],      # unknown key -> ignored (no current row)
        "k long, bal double, seg string",
    )
    out = scd2_merge(dim, updates, "k", ["bal", "seg"]).collect()
    rows = {(r["k"], r["version"]): (r["bal"], r["is_current"]) for r in out}
    assert rows[(1, 1)] == (100.0, True)      # untouched key stays current
    assert rows[(2, 3)] == (200.0, False)     # superseded version closed
    assert rows[(2, 4)] == (250.0, True)      # new version appended
    assert rows[(3, 1)] == (300.0, True)      # identical update is a no-op
    assert len(rows) == 4 and (9, 1) not in rows


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    new = spark.createDataFrame([(2, 25.0), (3, 30.0), (4, 40.0)], "k long, v double")
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert got == {1: "delete", 2: "update", 4: "insert"}   # 3 unchanged -> omitted

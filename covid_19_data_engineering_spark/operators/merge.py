"""Incremental-load operators: SCD-2 merge and CDC snapshot diff.

The reference pipeline is full-reload only (load_tables_daily.py drops and
rebuilds prod from staging every run; history is an INSERT-SELECT snapshot).
At 100 TB a full reload is off the table — these operators are the
incremental counterparts a warehouse needs:

- ``scd2_merge``: apply a batch of changed rows to a versioned dimension,
  closing superseded versions and appending the new ones (slowly-changing
  dimension type 2). One equi-join on the dimension key + one union —
  both sides shuffle once on the key; at scale, bucketing the dimension by
  key makes the join co-located.
- ``snapshot_diff``: the CDC primitive — given two snapshots of a table,
  emit (key, change_type) for inserts / deletes / updates. One full outer
  join on the key.

Both are deterministic DataFrame compositions with exact SQL twins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def scd2_merge(dim: DataFrame, updates: DataFrame, key_col: str,
               tracked_cols: list[str]) -> DataFrame:
    """Apply ``updates`` to the current version of a dimension.

    dim: one CURRENT row per key with columns (key, *tracked, version).
    updates: candidate new values, (key, *tracked).
    Emits, per key:
      - unchanged keys: the current row, still current;
      - changed keys: the old row closed (is_current=false) PLUS a new
        current row with version+1.
    A real deployment writes this to the versioned dimension table;
    semantics here are the pure transformation.
    """
    changed_pred = None
    for c in tracked_cols:
        neq = ~F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}"))
        changed_pred = neq if changed_pred is None else (changed_pred | neq)

    d, u = dim.alias("d"), updates.alias("u")
    joined = d.join(u, F.col(f"d.{key_col}") == F.col(f"u.{key_col}"), "left")
    changed = F.col(f"u.{key_col}").isNotNull() & changed_pred

    old_rows = joined.select(
        F.col(f"d.{key_col}").alias(key_col),
        *[F.col(f"d.{c}").alias(c) for c in tracked_cols],
        F.col("d.version").alias("version"),
        (~changed).alias("is_current"),
    )
    new_rows = joined.where(changed).select(
        F.col(f"d.{key_col}").alias(key_col),
        *[F.col(f"u.{c}").alias(c) for c in tracked_cols],
        (F.col("d.version") + 1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return old_rows.unionByName(new_rows)


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str,
                  tracked_cols: list[str]) -> DataFrame:
    """CDC diff of two snapshots: (key, change_type) for every key that was
    inserted, deleted, or updated between them. Unchanged keys are omitted.
    One full outer join on the key — shuffle on both sides, co-located if
    the snapshots share a bucketed layout."""
    o, n = old.alias("o"), new.alias("n")
    diff_pred = None
    for c in tracked_cols:
        neq = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        diff_pred = neq if diff_pred is None else (diff_pred | neq)

    joined = o.join(n, F.col(f"o.{key_col}") == F.col(f"n.{key_col}"), "full_outer")
    change = (
        F.when(F.col(f"o.{key_col}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key_col}").isNull(), F.lit("delete"))
        .when(diff_pred, F.lit("update"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key_col}"), F.col(f"n.{key_col}")).alias(key_col),
            change.alias("change_type"),
        )
        .where(F.col("change_type").isNotNull())
    )


def merge_versioned(spark: SparkSession, path: str, updates: DataFrame,
                    key_col: str, max_conflict_retries: int = 3) -> int:
    """Row-level MERGE INTO a versioned table (upsert: update matched
    keys, insert new ones) — the Delta ``MERGE`` analogue on the
    engine's own log-structured format (sources/versioned.py).

    Read-modify-write done SAFELY: the rewrite commits with
    ``expect_base`` pinned to the snapshot version the merge was derived
    from, so a concurrent append/compaction raises CommitConflict inside
    write_versioned instead of being silently erased; the merge then
    re-reads and retries (bounded). Plan shape: one left-anti join of
    the table against the update keys (drop superseded rows) + union —
    a single key-partitioned shuffle on each side; at scale, writing the
    table bucketed by the merge key makes the anti-join co-located.
    Returns the committed version."""
    from covid_19_data_engineering_spark.sources.versioned import (
        CommitConflict,
        read_versioned,
        table_versions,
        write_versioned,
    )

    # Delta's MERGE rule: multiple source rows matching one target key is
    # an error, not a silent double-insert — the anti-join would drop the
    # old row once and append BOTH updates, corrupting the upsert
    # invariant forever after
    dup = (updates.groupBy(key_col).count()
           .where(F.col("count") > 1).limit(1).collect())
    if dup:
        raise ValueError(
            f"merge_versioned: updates carry {dup[0]['count']} rows for "
            f"{key_col}={dup[0][key_col]!r}; an upsert needs exactly one "
            "source row per key — pre-aggregate the updates")

    for _ in range(max_conflict_retries):
        versions = table_versions(path)
        if not versions:
            raise FileNotFoundError(f"no committed versions at {path}")
        base = versions[-1]
        current = read_versioned(spark, path, version=base)
        keys = updates.select(key_col)
        merged = current.join(keys, key_col, "left_anti") \
            .unionByName(updates.select(*current.columns))
        try:
            return write_versioned(merged, path, mode="overwrite",
                                   expect_base=base,
                                   meta={"merge_key": key_col})
        except CommitConflict:
            continue  # a writer landed mid-merge: re-derive from its tip
    raise CommitConflict(
        f"merge_versioned: lost {max_conflict_retries} derivation races "
        f"on {path}")


# --- registered instantiations over the synthetic star schema ----------------
# updates: every 10th customer's balance moves by +100 — a deterministic
# stand-in for the day's changed rows.


@register(
    "customer_scd2_merge",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal, c_mktsegment,
             1 AS version FROM customer
    ),
    upd AS (
      SELECT c_custkey, ROUND(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT d.c_custkey, d.c_acctbal, d.c_mktsegment, d.version,
           (u.c_custkey IS NULL) AS is_current
    FROM dim d LEFT JOIN upd u USING (c_custkey)
    UNION ALL
    SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment, d.version + 1, TRUE
    FROM dim d JOIN upd u USING (c_custkey)
    ORDER BY c_custkey, version
    """,
    doc="SCD-2 dimension merge: close superseded customer versions and "
    "append the new current rows (every 10th customer's balance changes). "
    "One key join + union; bucketing the dim by key co-locates it.",
)
def customer_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    dim = cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(1).alias("version"),
    )
    updates = (
        cust.where(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    return scd2_merge(dim, updates, "c_custkey", ["c_acctbal", "c_mktsegment"]).orderBy(
        "c_custkey", "version"
    )


@register(
    "customer_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
      FROM customer WHERE c_custkey % 7 != 0
    ),
    new AS (
      SELECT c_custkey,
             ROUND(c_acctbal + CASE WHEN c_custkey % 3 = 0 THEN 50 ELSE 0 END, 2)
               AS c_acctbal
      FROM customer WHERE c_custkey % 5 != 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                WHEN o.c_acctbal != n.c_acctbal THEN 'update' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE CASE WHEN o.c_custkey IS NULL THEN 'insert'
               WHEN n.c_custkey IS NULL THEN 'delete'
               WHEN o.c_acctbal != n.c_acctbal THEN 'update' END IS NOT NULL
    ORDER BY c_custkey
    """,
    doc="CDC snapshot diff: inserts/deletes/updates between two customer "
    "snapshots (deterministic mod-split stand-ins) via one full outer join.",
)
def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    old = cust.where(F.col("c_custkey") % 7 != 0).select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    new = cust.where(F.col("c_custkey") % 5 != 0).select(
        "c_custkey",
        F.round(
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 3 == 0, F.lit(50)).otherwise(F.lit(0)),
            2,
        ).alias("c_acctbal"),
    )
    return snapshot_diff(old, new, "c_custkey", ["c_acctbal"]).orderBy("c_custkey")

"""Incremental view maintenance over versioned tables: keep a grouped
COUNT aggregate in lockstep with a source table by consuming its change
feed, never re-scanning the source.

This is the payoff loop for the storage layer: `write_versioned` commits
changes, `read_change_feed` exposes them as row-level insert/delete
deltas, and `refresh_count_aggregate` folds exactly those deltas into a
materialized aggregate — itself a versioned table, whose commit record
carries the source version it reflects (the resume cursor). A crash
between refreshes loses nothing: the next refresh reads the cursor from
the aggregate's own log and replays from there. Append-only workloads
cost O(appended rows) per refresh no matter how large the source grows;
an overwrite costs one snapshot diff, which is what an overwrite means.

Reference parity: the reference's consumers re-scan its append-only
history table to rebuild aggregates (vertica_upload.py:209-230); this is
the engine-native incremental replacement. SURVEY §2 C-extensions /
storage battery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.sources.versioned import (
    _read_commit,
    current_version,
    read_change_feed,
    read_versioned,
    table_versions,
    write_versioned,
)


def refresh_count_aggregate(spark: SparkSession, table_path: str,
                            agg_path: str, key_col: str) -> int:
    """Bring the materialized per-``key_col`` COUNT at ``agg_path`` up to
    date with ``table_path``; returns the source version now reflected.

    The aggregate table's schema is (key_col, n_rows). Deltas fold as
    insert -> +1, delete -> -1; keys whose count reaches zero drop out,
    so the aggregate always equals a fresh groupBy of the source
    snapshot (the invariant the tests pin). Idempotent: refreshing with
    no new source commits is a no-op that leaves the aggregate
    unversioned-bumped.
    """
    src_version = current_version(table_path)
    agg_versions = table_versions(agg_path)
    if agg_versions:
        last = _read_commit(agg_path, agg_versions[-1])["source_version"]
        if last >= src_version:
            return last
        old = read_versioned(spark, agg_path)
    else:
        last = 0
        old = None
    feed = read_change_feed(spark, table_path, last, src_version)
    delta = (
        feed.groupBy(key_col)
        .agg(F.sum(F.when(F.col("_change_type") == "insert", 1)
                   .otherwise(-1)).alias("_d"))
    )
    if old is None:
        new = delta.select(key_col, F.col("_d").alias("n_rows"))
    else:
        new = (
            old.join(delta, key_col, "full")
            .select(
                key_col,
                (F.coalesce("n_rows", F.lit(0))
                 + F.coalesce("_d", F.lit(0))).alias("n_rows"),
            )
        )
    new = new.where(F.col("n_rows") != 0)
    write_versioned(new, agg_path, mode="overwrite",
                    meta={"source_version": src_version})
    return src_version

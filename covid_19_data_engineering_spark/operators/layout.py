"""Z-order (Morton) file layout — the data-layout optimization that makes
min/max pruning work on TWO filter dimensions at once.

At 100 TB the fastest query is the one whose files never open: parquet
footers carry per-file min/max, and the scan planner prunes files whose
range misses the predicate. A table sorted by one column prunes on that
column only; interleaving the bits of two (quantized) key columns — the
Morton / Z-order curve, what Delta's OPTIMIZE ZORDER BY and Iceberg's
sort orders implement — gives BOTH columns tight per-file ranges. This
operator computes the layout plan: each row's z-value, its target file
(the top z-bits — a radix partition, no global sort or single-partition
window), and the per-file min/max footprint a pruning planner would see.

Determinism across engines: both columns quantize to 16-bit lanes by
exact integer arithmetic against the column RANGE — (v - min) *
2^16 div (max - min + 1), min/max collected as four O(1) scalars; the
oracle uses scalar subselects — so negative and offset-range columns
quantize correctly, and the bit interleave is
an UNROLLED sum of 32 pure-BIGINT div/mod terms with literal powers of
two — the bit positions are compile-time constants, so there is no
reason to pay a runtime higher-order-function fold (the first cut did,
and the interpreted per-row pow/aggregate lambda cost ~9s at sf0.1 vs
~1s unrolled inside whole-stage codegen).

Scale shape: one scan computes z-values map-only; file assignment is
``z div 2^(32 - file_bits)`` (radix, embarrassingly parallel — unlike
ntile, which would funnel the corpus through one window partition); the
readout is a groupBy on at most 2^file_bits groups, crushed by map-side
partial aggregation. This is exactly how a cluster lays out a petabyte:
write with partitionBy(file_id), each file internally z-contiguous.

No reference analogue (the reference delegates storage layout to its
warehouses); SURVEY §2 C-extensions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

Z_BITS = 16     # quantization bits per dimension
FILE_BITS = 6   # 2^6 = 64 target files


def _morton_sql(qa: str, qb: str, div: str) -> str:
    """Unrolled Morton interleave of Z_BITS bits per lane as one integer
    expression over columns ``qa``/``qb``: z = Σ_i bit_i(qa)·2^(2i+1) +
    bit_i(qb)·2^(2i). ``div`` is the engine's integer-division operator
    ("div" for Spark SQL, "//" for DuckDB); every term is literal-power
    BIGINT arithmetic, so both engines stay in compiled arithmetic."""
    return " + ".join(
        f"(({qa} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        f" + (({qb} {div} {1 << i}) % 2) * {1 << (2 * i)}"
        for i in range(Z_BITS)
    )


def _quantized_exprs(df: DataFrame, col_a: str, col_b: str):
    """Range-normalized 16-bit lane quantizers for both key columns:
    (v - min) * 2^Z_BITS div (max - min + 1), min/max collected as four
    O(1) scalars — quantizing against the raw max silently corrupted
    negative columns (negative lane values break the bit interleave)
    and collapsed offset ranges like [10^6, 10^6 + 100] into one bucket
    (round-7 ADVICE low)."""
    stats = df.agg(
        F.min(col_a).alias("la"), F.max(col_a).alias("ma"),
        F.min(col_b).alias("lb"), F.max(col_b).alias("mb"),
    ).first()
    if stats["ma"] is None or stats["mb"] is None:
        raise ValueError(
            f"zorder: empty input or all-NULL {col_a}/{col_b}")
    la, ma = int(stats["la"]), int(stats["ma"])
    lb, mb = int(stats["lb"]), int(stats["mb"])
    qa = F.expr(f"((CAST({col_a} AS BIGINT) - {la}) * {1 << Z_BITS}) "
                f"div ({ma} - {la} + 1)")
    qb = F.expr(f"((CAST({col_b} AS BIGINT) - {lb}) * {1 << Z_BITS}) "
                f"div ({mb} - {lb} + 1)")
    return qa, qb


def zorder_repartition(df: DataFrame, col_a: str, col_b: str,
                       n_files: int = 1 << FILE_BITS) -> DataFrame:
    """Physically lay ``df`` out along the z-order curve: range-partition
    on the Morton z-value into ``n_files`` partitions and sort within
    each, so every output file covers one contiguous z-range and its
    parquet footer min/max is TIGHT ON BOTH key columns. This is the
    writer-side half of ``zorder_file_layout``'s plan — what Delta's
    OPTIMIZE ZORDER BY executes — and feeds the versioned format's
    commit-recorded stats (sources/versioned.py), so
    ``read_versioned(prune=...)`` skips files on either dimension.
    The range partitioner samples z-values (one pass) instead of a
    global sort; row content is unchanged."""
    qa, qb = _quantized_exprs(df, col_a, col_b)
    z = F.expr(_morton_sql("_qa", "_qb", "div"))
    return (
        df.withColumn("_qa", qa).withColumn("_qb", qb)
        .withColumn("_z", z).drop("_qa", "_qb")
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_file_layout(df: DataFrame, col_a: str, col_b: str,
                       file_bits: int = FILE_BITS) -> DataFrame:
    """Per-file layout footprint after z-ordering ``df`` on (col_a, col_b):
    (file_id, n_rows, min_a, max_a, min_b, max_b). file_id = the top
    ``file_bits`` bits of the 2*Z_BITS-bit z-value (radix partition);
    quantization is range-normalized (see ``_quantized_exprs``)."""
    qa, qb = _quantized_exprs(df, col_a, col_b)
    shift = 1 << (2 * Z_BITS - file_bits)
    return (
        df.select(
            F.col(col_a).alias("a"), F.col(col_b).alias("b"),
            qa.alias("qa"), qb.alias("qb"),
        )
        .select("a", "b",
                F.expr(f"({_morton_sql('qa', 'qb', 'div')}) div {shift}")
                .alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"), F.max("a").alias("max_a"),
            F.min("b").alias("min_b"), F.max("b").alias("max_b"),
        )
    )


def _zorder_oracle_sql() -> str:
    nq = 1 << Z_BITS
    shift = 1 << (2 * Z_BITS - FILE_BITS)
    z = _morton_sql("qa", "qb", "//")
    return f"""
    WITH q AS (
      SELECT l_orderkey AS a, l_partkey AS b,
             ((CAST(l_orderkey AS BIGINT)
                 - (SELECT MIN(l_orderkey) FROM lineitem)) * {nq})
               // ((SELECT MAX(l_orderkey) FROM lineitem)
                     - (SELECT MIN(l_orderkey) FROM lineitem) + 1) AS qa,
             ((CAST(l_partkey AS BIGINT)
                 - (SELECT MIN(l_partkey) FROM lineitem)) * {nq})
               // ((SELECT MAX(l_partkey) FROM lineitem)
                     - (SELECT MIN(l_partkey) FROM lineitem) + 1) AS qb
      FROM lineitem
    ),
    zed AS (
      SELECT a, b, CAST({z} AS BIGINT) // {shift} AS file_id FROM q
    )
    SELECT file_id, COUNT(*) AS n_rows,
           MIN(a) AS min_a, MAX(a) AS max_a,
           MIN(b) AS min_b, MAX(b) AS max_b
    FROM zed GROUP BY file_id ORDER BY file_id
    """


@register(
    "zorder_file_layout",
    oracle=_zorder_oracle_sql(),
    doc=f"Z-order layout plan for lineitem on (l_orderkey, l_partkey): "
    f"{Z_BITS}-bit range-normalized integer quantization per dimension "
    "((v - min) * 2^bits div (max - min + 1) — negative- and "
    "offset-range-safe), unrolled "
    "literal-power Morton bit interleave (pure BIGINT, codegen-compiled), "
    "radix file assignment "
    f"(top {FILE_BITS} z-bits — no global sort), per-file min/max "
    "footprint. The layout both filter dimensions prune on — what "
    "OPTIMIZE ZORDER BY computes before rewriting files.",
)
def zorder_layout_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    return zorder_file_layout(li, "l_orderkey", "l_partkey") \
        .orderBy("file_id")


# --- bucketed tables: the shuffle-free co-located join -----------------------
# The other half of the storage-layout story beside z-order: a fact-fact
# join whose BOTH sides were written bucketed on the join key (the same
# bucket count, hash-partitioned at write time) needs NO exchange at read
# time — Spark's bucketed scan exposes the write-time partitioning to the
# planner and the SortMergeJoin consumes the buckets directly. At 100 TB
# this converts the single largest shuffle a star-schema workload pays
# (fact x fact on orderkey) into a metadata property of the table layout,
# paid ONCE at write and amortized over every subsequent join. This is
# the DataFrame-API equivalent of Hive bucketed tables / Iceberg's
# bucket partition transform.
#
# The engine's own versioned format (sources/versioned.py) stores plain
# parquet, so bucketing here uses the session catalog (saveAsTable with
# bucketBy), the only Spark surface that persists bucket metadata. Tables
# are EXTERNAL under .state_cache and re-registered per session (the
# in-memory catalog does not survive restarts; re-creating costs one
# write of each side at gate scale and is exactly what a production job
# does once per table lifetime, not per query).

JOIN_BUCKETS = 8


def _bucket_slug(sf_dir: str) -> str:
    import re

    return re.sub(r"[^A-Za-z0-9_]+", "_", sf_dir.strip("/"))


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Register bucketed twins of orders and lineitem (bucketBy JOIN_BUCKETS
    on the orderkey, sorted within buckets) for ``sf_dir``, idempotent per
    session. Returns the two catalog table names."""
    import os

    slug = _bucket_slug(sf_dir)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    names = []
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"{table}_b{JOIN_BUCKETS}_{slug}"
        names.append(name)
        if spark.catalog.tableExists(name):
            continue
        path = os.path.join(repo, ".state_cache", "bucketed", slug, table)
        (
            load_table(spark, table, sf_dir)
            .write.mode("overwrite")
            .bucketBy(JOIN_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(name)
        )
    return names[0], names[1]


def bucketed_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority off the bucketed orders x lineitem join.
    Values are identical to the plain-parquet join (bucketing is layout,
    not semantics — the oracle runs the plain join); the point is the
    PLAN: both scans read their write-time buckets and the SortMergeJoin
    has no Exchange on either input (pinned in tests/test_plans.py
    against the unbucketed twin's plan)."""
    o_name, l_name = ensure_bucketed_tables(spark, sf_dir)
    orders = spark.table(o_name)
    li = spark.table(l_name)
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.expr("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100"
                       " + 0.5) AS BIGINT)")
            ).alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc=f"Shuffle-free fact x fact join via write-time bucketing: orders "
    f"and lineitem saved as {JOIN_BUCKETS}-bucket tables on the orderkey "
    "(bucketBy + sortBy, external under .state_cache), then joined and "
    "rolled up by priority. Values equal the plain join (oracle); the "
    "plan is the deliverable — both scans carry SelectedBucketsCount and "
    "the SortMergeJoin consumes write-time partitioning with ZERO "
    "exchanges on its inputs, the layout that converts a star schema's "
    "largest recurring shuffle into a one-time write cost.",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bucketed_priority_revenue(spark, sf_dir)


# --- versioned point lookup: Bloom + z-order pruning under the gate ----------
# The versioned format's file-skipping (commit-recorded min/max stats +
# per-file Bloom filters over a z-ordered layout, sources/versioned.py)
# was pytest-only until round 12; this query puts it inside the driver's
# oracle gate. The deliverable is both the VALUES (must hash-match a
# plain filter over the raw parquet) and the PLAN-LEVEL pruning: the
# point read opens a strict subset of the snapshot's files, asserted
# against the snapshot manifest by ensure_versioned_orders' pytest
# (tests/test_round12_ops.py) and measured via snapshot_pruned_files.

POINT_LOOKUP_FILES = 16
_VTABLE_STATE_VERSION = "v1"


def _versioned_orders_dir(sf_dir: str) -> str:
    """Per-corpus cache location for the versioned orders table, keyed by
    the source parquet's size+mtime fingerprint (a regenerated corpus at
    the same path invalidates the cache) and a layout version (logic
    bumps invalidate old caches instead of silently serving them)."""
    import os
    import re

    slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/"))
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    fp = f"{st.st_size}-{st.st_mtime_ns}"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, ".state_cache", "versioned_orders",
                        _VTABLE_STATE_VERSION, slug, fp)


def ensure_versioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the versioned orders table the point
    lookup reads: hash-spread initial write with a Bloom index on
    o_orderkey, then OPTIMIZE ZORDER BY (o_custkey, o_orderkey) — the
    compaction re-arms the Bloom index on the rewritten files (the
    table-property contract), and the z-order makes the per-file min/max
    tight on both columns. Returns the table path."""
    from covid_19_data_engineering_spark.sources.versioned import (
        compact_versioned,
        table_versions,
        write_versioned,
    )

    path = _versioned_orders_dir(sf_dir)
    versions = table_versions(path)
    if not versions:
        write_versioned(
            load_table(spark, "orders", sf_dir)
            .repartition(POINT_LOOKUP_FILES),
            path, bloom_cols=["o_orderkey"])
        versions = [1]
    if len(versions) == 1:
        # a crash between write and compact leaves v1 only; finishing
        # the build here makes the cache self-healing
        compact_versioned(spark, path, target_files=POINT_LOOKUP_FILES,
                          zorder=("o_custkey", "o_orderkey"))
    return path


@register(
    "versioned_pruned_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % 9973 = 1
    ORDER BY o_orderkey
    """,
    doc="Multi-key point lookup on the versioned z-ordered orders table "
    "with file-level Bloom pruning under the oracle gate (round-11 "
    "verdict #5): the probe keys (o_orderkey % 9973 = 1 — data-"
    "independent rule, 1-16 keys across gate SFs) are resolved "
    "driver-side, read_versioned(point=...) drops every file whose "
    "commit-recorded Bloom filter provably lacks all of them BEFORE "
    "Spark opens a single footer, and the row-level filter still "
    "applies (kept files may carry non-matching rows). Values must "
    "hash-match the plain filter over the raw parquet; the files-read "
    "subset is pinned by pytest against the snapshot manifest.",
)
def versioned_pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_19_data_engineering_spark.sources.versioned import (
        read_versioned,
    )

    path = ensure_versioned_orders(spark, sf_dir)
    keys = [
        int(r[0]) for r in
        load_table(spark, "orders", sf_dir)
        .where("o_orderkey % 9973 = 1")
        .select("o_orderkey").collect()
    ]
    snap = read_versioned(spark, path, point={"o_orderkey": keys})
    return (
        snap.where(F.col("o_orderkey").isin(keys))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --- Hilbert-curve layout: the locality-tighter sibling of z-order -----------
# Morton interleave is cheap but takes long diagonal jumps between
# quadrants; the Hilbert curve visits every cell of one quadrant before
# leaving it, so consecutive curve positions are ALWAYS grid neighbors and
# per-file bounding boxes come out tighter — which is why Delta Lake added
# OPTIMIZE ... by Hilbert clustering (liquid clustering) over plain
# z-order. The xy->d walk is inherently sequential across bit levels (each
# level rotates/reflects the frame for the next), so it does NOT reduce to
# one bit-interleave sum; it unrolls instead into H_BITS chained integer
# projections — Catalyst collapses the chain into a single whole-stage-
# codegen projection, and the oracle mirrors it as chained CTEs with the
# SAME expression text (integer div/mod/CASE only, engine-exact).

H_BITS = 8          # 8 bits per dimension -> 16-bit Hilbert index, 256x256
H_FILE_BITS = 6     # top 6 bits -> 64 target files


def _hilbert_level_exprs(s: int, div: str) -> tuple[str, str, str]:
    """One level of the canonical xy2d walk (side ``s``), as pure-integer
    expression text over current columns x, y, d:

      rx = (x div s) % 2 ; ry = (y div s) % 2
      d += s*s * ((3*rx) XOR ry)          [arithmetic: 3*rx + ry - 2*rx*ry]
      if ry == 0:  (reflect when rx == 1, then swap)
          x' = s-1-(y%s) if rx else y%s
          y' = s-1-(x%s) if rx else x%s
      else:        x' = x%s ; y' = y%s
    """
    rx = f"((x {div} {s}) % 2)"
    ry = f"((y {div} {s}) % 2)"
    nd = f"d + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    nx = (f"CASE WHEN {ry} = 0 THEN "
          f"(CASE WHEN {rx} = 1 THEN {s - 1} - (y % {s}) ELSE y % {s} END) "
          f"ELSE x % {s} END")
    ny = (f"CASE WHEN {ry} = 0 THEN "
          f"(CASE WHEN {rx} = 1 THEN {s - 1} - (x % {s}) ELSE x % {s} END) "
          f"ELSE y % {s} END")
    return nx, ny, nd


def hilbert_index(df: DataFrame, qx: str = "qx", qy: str = "qy",
                  keep: tuple[str, ...] = ("a", "b")) -> DataFrame:
    """Append Hilbert curve position ``d`` for quantized H_BITS-bit lanes
    ``qx``/``qy``: H_BITS chained integer projections (one per bit level),
    collapsed by Catalyst into one codegen stage — map-only, no shuffle."""
    cols = list(keep)
    out = df.selectExpr(*cols,
                        f"CAST({qx} AS BIGINT) AS x",
                        f"CAST({qy} AS BIGINT) AS y",
                        "CAST(0 AS BIGINT) AS d")
    for i in range(H_BITS):
        s = 1 << (H_BITS - 1 - i)
        nx, ny, nd = _hilbert_level_exprs(s, "div")
        out = out.selectExpr(*cols, f"({nx}) AS x", f"({ny}) AS y",
                             f"({nd}) AS d")
    return out.selectExpr(*cols, "d")


def hilbert_file_layout(df: DataFrame, col_a: str, col_b: str,
                        file_bits: int = H_FILE_BITS) -> DataFrame:
    """Per-file layout footprint after Hilbert-ordering ``df`` on
    (col_a, col_b): (file_id, n_rows, min_a, max_a, min_b, max_b) — the
    same readout as ``zorder_file_layout`` so the two curves compare
    directly. Quantization reuses the range-normalized integer lanes
    (H_BITS wide); file_id = top ``file_bits`` bits of the Hilbert index
    (radix — embarrassingly parallel, no global sort)."""
    stats = df.agg(
        F.min(col_a).alias("la"), F.max(col_a).alias("ma"),
        F.min(col_b).alias("lb"), F.max(col_b).alias("mb"),
    ).first()
    if stats["ma"] is None or stats["mb"] is None:
        raise ValueError(f"hilbert: empty input or all-NULL {col_a}/{col_b}")
    la, ma = int(stats["la"]), int(stats["ma"])
    lb, mb = int(stats["lb"]), int(stats["mb"])
    nq = 1 << H_BITS
    base = df.selectExpr(
        f"{col_a} AS a", f"{col_b} AS b",
        f"((CAST({col_a} AS BIGINT) - {la}) * {nq}) div ({ma} - {la} + 1) AS qx",
        f"((CAST({col_b} AS BIGINT) - {lb}) * {nq}) div ({mb} - {lb} + 1) AS qy",
    )
    shift = 1 << (2 * H_BITS - file_bits)
    return (
        hilbert_index(base)
        .selectExpr("a", "b", f"d div {shift} AS file_id")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"), F.max("a").alias("max_a"),
            F.min("b").alias("min_b"), F.max("b").alias("max_b"),
        )
    )


def _hilbert_oracle_sql() -> str:
    nq = 1 << H_BITS
    shift = 1 << (2 * H_BITS - H_FILE_BITS)
    ctes = [f"""
    lvl0 AS (
      SELECT l_orderkey AS a, l_partkey AS b,
             ((CAST(l_orderkey AS BIGINT)
                 - (SELECT MIN(l_orderkey) FROM lineitem)) * {nq})
               // ((SELECT MAX(l_orderkey) FROM lineitem)
                     - (SELECT MIN(l_orderkey) FROM lineitem) + 1) AS x,
             ((CAST(l_partkey AS BIGINT)
                 - (SELECT MIN(l_partkey) FROM lineitem)) * {nq})
               // ((SELECT MAX(l_partkey) FROM lineitem)
                     - (SELECT MIN(l_partkey) FROM lineitem) + 1) AS y,
             CAST(0 AS BIGINT) AS d
      FROM lineitem
    )"""]
    for i in range(H_BITS):
        s = 1 << (H_BITS - 1 - i)
        nx, ny, nd = _hilbert_level_exprs(s, "//")
        ctes.append(f"""
    lvl{i + 1} AS (
      SELECT a, b, ({nx}) AS x, ({ny}) AS y, ({nd}) AS d FROM lvl{i}
    )""")
    return f"""
    WITH {','.join(ctes)}
    SELECT d // {shift} AS file_id, COUNT(*) AS n_rows,
           MIN(a) AS min_a, MAX(a) AS max_a,
           MIN(b) AS min_b, MAX(b) AS max_b
    FROM lvl{H_BITS} GROUP BY 1 ORDER BY file_id
    """


@register(
    "hilbert_file_layout",
    oracle=_hilbert_oracle_sql(),
    doc=f"Hilbert-curve layout plan for lineitem on (l_orderkey, "
    f"l_partkey): {H_BITS}-bit range-normalized quantization, the "
    "canonical xy2d walk unrolled into chained pure-integer projections "
    "(one whole-stage-codegen stage; the oracle replays the identical "
    f"expression text as chained CTEs), radix file assignment (top "
    f"{H_FILE_BITS} bits). The locality-tighter OPTIMIZE clustering "
    "beside zorder_file_layout — same readout schema, directly "
    "comparable footprints.",
)
def hilbert_layout_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    return hilbert_file_layout(li, "l_orderkey", "l_partkey").orderBy("file_id")


# --- dynamic partition pruning: the scan optimization star-schema joins
# live on at 100 TB. A fact table partitioned by a date-derived column
# joined to a FILTERED dim prunes fact partitions AT RUNTIME from the
# dim-side join keys (Spark's DPP subquery) — the scan never opens
# partitions no surviving dim row points at. Bucketing (above) kills the
# shuffle; DPP kills the read. The fact twin is written once per
# (sf_dir) under .state_cache, partitioned by order year.

RECENT_YEAR_FROM = 1999


def ensure_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write (once) and return the path of the orders twin partitioned
    by o_year — the layout a 100 TB fact table ships with."""
    import os

    slug = _bucket_slug(sf_dir)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, ".state_cache", "partitioned", slug, "orders")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, "orders", sf_dir)
            .withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(path)
        )
    # the year dim must be a FILE source (a LocalRelation dim gets its
    # filter constant-folded away) and the dim filter must be a
    # COMPARISON (segment = 'recent'): Spark's isLikelySelective treats
    # a bare boolean attribute as non-selective and refuses to insert
    # the pruning subquery at all — both found the hard way
    dim_path = os.path.join(repo, ".state_cache", "partitioned", slug,
                            "year_dim")
    if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
        spark.createDataFrame(
            [(y, "recent" if y >= RECENT_YEAR_FROM else "archive")
             for y in range(1995, 2002)],
            "y int, segment string",
        ).coalesce(1).write.mode("overwrite").parquet(dim_path)
    return path


def dpp_recent_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year order count and revenue for the dim-selected recent
    years, computed through a DPP-prunable join: the year dim filters to
    is_recent rows, and the runtime subquery prunes the fact's o_year
    partitions before the scan (tests assert the dynamicpruning
    expression in the plan)."""
    import os

    path = ensure_partitioned_orders(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = (
        spark.read.parquet(os.path.join(os.path.dirname(path), "year_dim"))
        .where(F.col("segment") == "recent")
    )
    # broadcast(dim) pins the dim as the build side: DPP's default
    # reuseBroadcastOnly mode injects the runtime pruning subquery into
    # the FACT scan only when the dim side is the reused broadcast (on
    # kilobyte test data Spark otherwise builds on the fact and no
    # pruning subquery exists to reuse)
    return (
        fact.join(F.broadcast(dim), fact.o_year == dim.y)
        .groupBy("o_year")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .select(F.col("o_year").cast("int").alias("order_year"),
                "n_orders", "revenue")
        .orderBy("order_year")
    )


@register(
    "dpp_recent_year_revenue",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE year(o_orderdate) >= {RECENT_YEAR_FROM}
    GROUP BY 1
    ORDER BY order_year
    """,
    doc="Dynamic partition pruning demonstration: the orders fact twin is "
    "partitioned by o_year (written once under .state_cache); joining it "
    "to a filtered year dim injects Spark's runtime dynamicpruning "
    "subquery into the scan's PartitionFilters, so non-selected years' "
    "partitions never open. Bucketing kills the shuffle; DPP kills the "
    "read — the two table-layout levers a 100 TB star schema runs on.",
)
def dpp_recent_year_revenue_query(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    return dpp_recent_year_revenue(spark, sf_dir)

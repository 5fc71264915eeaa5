"""Incremental view maintenance over versioned tables: keep grouped
COUNT / SUM / MIN-MAX aggregates in lockstep with a source table by
consuming its change feed, never re-scanning the source.

This is the payoff loop for the storage layer: `write_versioned` commits
changes, `read_change_feed` exposes them as row-level insert/delete
deltas, and the refresh functions fold exactly those deltas into a
materialized aggregate — itself a versioned table, whose commit record
carries the source version it reflects (the resume cursor). A crash
between refreshes loses nothing: the next refresh reads the cursor from
the aggregate's own log and replays from there. Append-only workloads
cost O(appended rows) per refresh no matter how large the source grows;
an overwrite costs one snapshot diff, which is what an overwrite means.

Aggregate algebra (why three entry points, not one):

- COUNT and SUM are *self-inverting* — a delete folds as the exact
  negative of an insert, so the maintained state never needs the source
  again: refresh cost is O(rows changed), period.
- MIN/MAX are NOT invertible: deleting the current minimum says nothing
  about the next minimum. ``refresh_minmax_aggregate`` therefore folds
  inserts monoid-style (least/greatest) and answers deletes with a
  *delete-triggered per-key recompute*: only keys that saw a delete
  re-aggregate from the current snapshot (a semi-join restriction), so
  append-heavy workloads still never touch the source and delete-heavy
  ones pay for exactly the keys they disturbed.

Failure contract: when vacuum has dropped change history the cursor
still needs, ``read_change_feed`` raises ``ChangeFeedTruncated`` instead
of emitting a silently partial feed (round-8 ADVICE medium). Every
refresh here catches it and falls back to a FULL RECOMPUTE from the
current snapshot — correctness is preserved, the cost is one fresh
groupBy, and the cursor re-anchors at the recomputed version. The resume
cursor itself is read by walking the aggregate's log newest-first for
the most recent commit that carries ``source_version`` (round-8 ADVICE
low: assuming the latest commit is always a refresh commit breaks
permanently the first time someone compacts the aggregate table).

Reference parity: the reference's consumers re-scan its append-only
history table to rebuild aggregates (vertica_upload.py:209-230); this is
the engine-native incremental replacement. SURVEY §2 C-extensions /
storage battery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.sources.versioned import (
    ChangeFeedTruncated,
    _read_commit_or_none,
    current_version,
    read_change_feed,
    read_versioned,
    table_versions,
    write_versioned,
)


def _resume_cursor(agg_path: str) -> int | None:
    """The source version the aggregate at ``agg_path`` currently
    reflects: walk its commit log newest-first for the most recent
    commit carrying ``source_version``. Commits written by OTHER tools
    (a compaction's record carries ``compacted_from``, not a cursor) are
    stepped over instead of crashing the refresh loop; a vacuumed-away
    record ends the walk (history below it is gone). None when no
    refresh commit survives — the caller bootstraps from scratch.
    """
    for v in reversed(table_versions(agg_path)):
        c = _read_commit_or_none(agg_path, v)
        if c is None:
            break
        if "source_version" in c:
            return c["source_version"]
    return None


def _commit_refresh(new: DataFrame, agg_path: str, src_version: int) -> int:
    write_versioned(new, agg_path, mode="overwrite",
                    meta={"source_version": src_version})
    return src_version


def _null_safe_full_join(old: DataFrame, delta: DataFrame,
                         key_cols: list[str]) -> DataFrame:
    """Full-outer join of maintained state with a delta frame on
    ``key_cols`` treating NULL keys as EQUAL — a fresh groupBy makes
    NULL a real group, so the fold must match it (a plain equi-join
    never matches NULL to NULL and would duplicate the NULL-key row on
    every refresh). Output: one coalesced copy of each key column plus
    both sides' payload columns."""
    renamed = delta.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[c for c in delta.columns if c not in key_cols],
    )
    cond = None
    for k in key_cols:
        c = old[k].eqNullSafe(renamed[f"_k_{k}"])
        cond = c if cond is None else (cond & c)
    joined = old.join(renamed, cond, "full")
    return joined.select(
        *[F.coalesce(old[k], renamed[f"_k_{k}"]).alias(k)
          for k in key_cols],
        *[old[c] for c in old.columns if c not in key_cols],
        *[renamed[c] for c in delta.columns if c not in key_cols],
    )


def _null_safe_key_filter(df: DataFrame, keys: DataFrame, key_col: str,
                          how: str) -> DataFrame:
    """left_semi / left_anti restriction of ``df`` by the single-column
    ``keys`` frame, with NULL keys matching NULL (same reasoning as the
    fold join: the NULL group is a real group)."""
    k = keys.select(F.col(key_col).alias("_k_restrict"))
    return df.join(k, df[key_col].eqNullSafe(k["_k_restrict"]), how)


def refresh_count_aggregate(spark: SparkSession, table_path: str,
                            agg_path: str, key_col: str) -> int:
    """Bring the materialized per-``key_col`` COUNT at ``agg_path`` up to
    date with ``table_path``; returns the source version now reflected.

    The aggregate table's schema is (key_col, n_rows). Deltas fold as
    insert -> +1, delete -> -1; keys whose count reaches zero drop out,
    so the aggregate always equals a fresh groupBy of the source
    snapshot (the invariant the tests pin). Idempotent: refreshing with
    no new source commits is a no-op that leaves the aggregate
    unversioned-bumped. A vacuumed-away feed range falls back to a full
    recompute instead of persisting a partial fold.
    """
    src_version = current_version(table_path)
    last = _resume_cursor(agg_path)
    if last is not None and last >= src_version:
        return last

    def recompute() -> DataFrame:
        return (
            read_versioned(spark, table_path, version=src_version)
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )

    if last is None:
        return _commit_refresh(recompute(), agg_path, src_version)
    try:
        feed = read_change_feed(spark, table_path, last, src_version)
    except ChangeFeedTruncated:
        return _commit_refresh(recompute(), agg_path, src_version)
    old = read_versioned(spark, agg_path)
    delta = (
        feed.groupBy(key_col)
        .agg(F.sum(F.when(F.col("_change_type") == "insert", 1)
                   .otherwise(-1)).alias("_d"))
    )
    new = (
        _null_safe_full_join(old, delta, [key_col])
        .select(
            key_col,
            (F.coalesce("n_rows", F.lit(0))
             + F.coalesce("_d", F.lit(0))).alias("n_rows"),
        )
        .where(F.col("n_rows") != 0)
    )
    return _commit_refresh(new, agg_path, src_version)


def refresh_sum_aggregate(spark: SparkSession, table_path: str,
                          agg_path: str, key_col: str,
                          value_col: str) -> int:
    """Maintain per-``key_col`` (COUNT, SUM of ``value_col``) at
    ``agg_path`` from the source's change feed; returns the source
    version now reflected. AVG is a derived readout (sum_value /
    n_rows), so this one materialization serves COUNT, SUM, and AVG
    consumers.

    Aggregate schema: (key_col, n_rows, n_vals, sum_value). Deltas fold
    as insert -> (+1, +value), delete -> (-1, -value) — SUM is its own
    inverse, so no source re-scan ever happens on the feed path. NULL
    values contribute to n_rows but not to n_vals/sum_value, and a key
    whose non-null count is zero reports sum_value NULL (not 0) —
    exactly what a fresh ``groupBy().agg(count(*), count(v), sum(v))``
    computes; n_vals is also the denominator SQL AVG uses. Keys whose
    row count reaches zero drop out. For exact (order-independent)
    sums, pass an integer fixed-point column — float addition is
    associative only approximately, and the fold order here differs
    from a fresh scan's.

    Same crash-safety story as the COUNT twin: the cursor is the
    ``source_version`` in the aggregate's own commit record (read via a
    newest-first walk that tolerates foreign commits), refreshes are
    idempotent, and a ``ChangeFeedTruncated`` feed (vacuumed history)
    falls back to one full recompute instead of persisting a partial
    fold.
    """
    src_version = current_version(table_path)
    last = _resume_cursor(agg_path)
    if last is not None and last >= src_version:
        return last

    def recompute() -> DataFrame:
        return (
            read_versioned(spark, table_path, version=src_version)
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count(value_col).alias("n_vals"),
                 F.sum(value_col).alias("sum_value"))
        )

    if last is None:
        return _commit_refresh(recompute(), agg_path, src_version)
    try:
        feed = read_change_feed(spark, table_path, last, src_version)
    except ChangeFeedTruncated:
        return _commit_refresh(recompute(), agg_path, src_version)
    old = read_versioned(spark, agg_path)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)) \
        .otherwise(F.lit(-1))
    delta = (
        feed.groupBy(key_col)
        .agg(F.sum(sign).alias("_dn"),
             F.sum(F.when(F.col(value_col).isNotNull(), sign)
                   .otherwise(0)).alias("_dnv"),
             F.sum(sign * F.col(value_col)).alias("_dv"))
    )
    folded = (
        _null_safe_full_join(old, delta, [key_col])
        .select(
            key_col,
            (F.coalesce("n_rows", F.lit(0))
             + F.coalesce("_dn", F.lit(0))).alias("n_rows"),
            (F.coalesce("n_vals", F.lit(0))
             + F.coalesce("_dnv", F.lit(0))).alias("n_vals"),
            (F.coalesce("sum_value", F.lit(0))
             + F.coalesce("_dv", F.lit(0))).alias("_raw_sum"),
        )
        .where(F.col("n_rows") != 0)
    )
    new = folded.select(
        key_col, "n_rows", "n_vals",
        # a key with zero surviving non-null values reports NULL, like a
        # fresh SUM — the accumulated 0 resumes via coalesce next fold
        F.when(F.col("n_vals") == 0, F.lit(None))
        .otherwise(F.col("_raw_sum")).alias("sum_value"),
    )
    return _commit_refresh(new, agg_path, src_version)


def refresh_minmax_aggregate(spark: SparkSession, table_path: str,
                             agg_path: str, key_col: str,
                             value_col: str) -> int:
    """Maintain per-``key_col`` (MIN, MAX of ``value_col``) at
    ``agg_path``; returns the source version now reflected.

    MIN/MAX are not delta-invertible (removing the current minimum says
    nothing about the next one), so the fold splits by delta type:

    - keys that saw ONLY inserts fold monoid-style —
      least(old_min, batch_min) / greatest(old_max, batch_max) — O(rows
      inserted), source never read;
    - keys that saw ANY delete are re-aggregated from the pinned source
      snapshot, restricted by a LEFT SEMI join to exactly those keys —
      the *delete-triggered per-key recompute* strategy. Keys whose rows
      all vanished drop out for free (the semi join returns nothing for
      them).

    Append-only workloads therefore never re-scan the source; a delete
    pays a scan filtered to the touched keys (at scale, with the
    snapshot partitioned/z-ordered by key, that filter prunes files via
    the commit-recorded min/max stats). Cursor, idempotence, and the
    ChangeFeedTruncated -> full-recompute fallback match the COUNT/SUM
    twins. Aggregate schema: (key_col, min_value, max_value).
    """
    src_version = current_version(table_path)
    last = _resume_cursor(agg_path)
    if last is not None and last >= src_version:
        return last

    def recompute() -> DataFrame:
        return (
            read_versioned(spark, table_path, version=src_version)
            .groupBy(key_col)
            .agg(F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value"))
        )

    if last is None:
        return _commit_refresh(recompute(), agg_path, src_version)
    try:
        feed = read_change_feed(spark, table_path, last, src_version)
    except ChangeFeedTruncated:
        return _commit_refresh(recompute(), agg_path, src_version)
    old = read_versioned(spark, agg_path)
    del_keys = (
        feed.where(F.col("_change_type") == "delete")
        .select(key_col).distinct()
    )
    # delete-affected keys: re-aggregate from the pinned snapshot,
    # restricted to exactly those keys (fully-deleted keys drop out);
    # null-safe restriction so the NULL group recomputes like any other
    recomputed = (
        _null_safe_key_filter(
            read_versioned(spark, table_path, version=src_version),
            del_keys, key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.min(value_col).alias("min_value"),
             F.max(value_col).alias("max_value"))
    )
    # insert-only keys: pure monoid fold against the old state
    ins_agg = (
        _null_safe_key_filter(
            feed.where(F.col("_change_type") == "insert"),
            del_keys, key_col, "left_anti")
        .groupBy(key_col)
        .agg(F.min(value_col).alias("_imin"),
             F.max(value_col).alias("_imax"))
    )
    folded = (
        _null_safe_full_join(
            _null_safe_key_filter(old, del_keys, key_col, "left_anti"),
            ins_agg, [key_col])
        .select(
            key_col,
            F.least("min_value", "_imin").alias("min_value"),
            F.greatest("max_value", "_imax").alias("max_value"),
        )
    )
    new = folded.unionByName(recomputed)
    return _commit_refresh(new, agg_path, src_version)


def refresh_distinct_aggregate(spark: SparkSession, table_path: str,
                               agg_path: str, key_col: str,
                               value_col: str) -> int:
    """Maintain per-``key_col`` COUNT(DISTINCT ``value_col``) at
    ``agg_path``; returns the source version now reflected.

    DISTINCT is not delta-invertible over a bare count (deleting one
    copy of a value says nothing about whether other copies remain), but
    it IS decomposable: the materialization is the SUPPORT table
    (key_col, value_col, n_rows) — the multiplicity of every distinct
    (key, value) pair — which folds exactly like COUNT (+1/-1 per
    delta, pairs at zero drop out). The distinct count is then the
    support table's per-key row count, a readout over state whose size
    is the number of DISTINCT pairs, not the row count. NULL values are
    excluded (SQL COUNT(DISTINCT v) ignores them). Cursor, idempotence,
    and the ChangeFeedTruncated -> full-recompute fallback match the
    other refreshes.
    """
    src_version = current_version(table_path)
    last = _resume_cursor(agg_path)
    if last is not None and last >= src_version:
        return last

    def recompute() -> DataFrame:
        return (
            read_versioned(spark, table_path, version=src_version)
            .where(F.col(value_col).isNotNull())
            .groupBy(key_col, value_col)
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )

    if last is None:
        return _commit_refresh(recompute(), agg_path, src_version)
    try:
        feed = read_change_feed(spark, table_path, last, src_version)
    except ChangeFeedTruncated:
        return _commit_refresh(recompute(), agg_path, src_version)
    old = read_versioned(spark, agg_path)
    delta = (
        feed.where(F.col(value_col).isNotNull())
        .groupBy(key_col, value_col)
        .agg(F.sum(F.when(F.col("_change_type") == "insert", 1)
                   .otherwise(-1)).alias("_d"))
    )
    new = (
        _null_safe_full_join(old, delta, [key_col, value_col])
        .select(
            key_col, value_col,
            (F.coalesce("n_rows", F.lit(0))
             + F.coalesce("_d", F.lit(0))).alias("n_rows"),
        )
        .where(F.col("n_rows") != 0)
    )
    return _commit_refresh(new, agg_path, src_version)


def refresh_topk_view(spark: SparkSession, table_path: str,
                      agg_path: str, key_col: str, value_col: str,
                      id_col: str, k: int = 3) -> int:
    """Maintain the per-``key_col`` TOP-K rows (largest ``value_col``,
    ties broken by ascending ``id_col``) at ``agg_path``; returns the
    source version now reflected. NULL values are excluded (a NULL can
    never be a top value under DESC NULLS LAST semantics — stated
    explicitly because Spark and SQL engines disagree on the default).

    Top-k is a MONOID under inserts — topk(S ∪ dS) = topk(topk(S) ∪ dS),
    since adding rows can never promote a row the old state already
    discarded — so insert-only keys fold by re-ranking old-state ∪
    inserted rows, O(k + inserted) per touched key, source never read.
    Deletes are not invertible (dropping a top row says nothing about
    the (k+1)-th), so keys that saw ANY delete re-aggregate from the
    pinned snapshot restricted by a semi join — the same delete-triggered
    per-key recompute strategy as ``refresh_minmax_aggregate``. Untouched
    keys carry their state rows forward verbatim (no re-ranking work).

    View schema: (key_col, value_col, id_col). Cursor, idempotence, and
    the ChangeFeedTruncated -> full-recompute fallback match the other
    refreshes. At scale the state is groups x k rows — a top-k dashboard
    maintained at O(changed keys) per refresh instead of a window over
    the full source.
    """
    from pyspark.sql import Window

    src_version = current_version(table_path)
    last = _resume_cursor(agg_path)
    if last is not None and last >= src_version:
        return last

    w = Window.partitionBy(key_col).orderBy(
        F.col(value_col).desc_nulls_last(), F.col(id_col).asc())

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col(value_col).isNotNull())
            .select(key_col, value_col, id_col)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )

    def recompute() -> DataFrame:
        return topk(read_versioned(spark, table_path, version=src_version))

    if last is None:
        return _commit_refresh(recompute(), agg_path, src_version)
    try:
        feed = read_change_feed(spark, table_path, last, src_version)
    except ChangeFeedTruncated:
        return _commit_refresh(recompute(), agg_path, src_version)
    old = read_versioned(spark, agg_path)
    del_keys = (
        feed.where(F.col("_change_type") == "delete")
        .select(key_col).distinct()
    )
    ins = _null_safe_key_filter(
        feed.where(F.col("_change_type") == "insert"),
        del_keys, key_col, "left_anti",
    ).where(F.col(value_col).isNotNull())
    ins_keys = ins.select(key_col).distinct()
    # delete-affected keys: per-key recompute from the pinned snapshot
    recomputed = topk(_null_safe_key_filter(
        read_versioned(spark, table_path, version=src_version),
        del_keys, key_col, "left_semi"))
    # insert-only keys: monoid fold (old top-k rows ∪ inserts, re-ranked)
    folded = topk(
        _null_safe_key_filter(old, ins_keys, key_col, "left_semi")
        .unionByName(ins.select(key_col, value_col, id_col))
    )
    untouched = _null_safe_key_filter(
        _null_safe_key_filter(old, del_keys, key_col, "left_anti"),
        ins_keys, key_col, "left_anti")
    new = untouched.unionByName(folded).unionByName(recomputed)
    return _commit_refresh(new, agg_path, src_version)


def read_distinct_counts(spark: SparkSession, agg_path: str,
                         key_col: str) -> DataFrame:
    """The COUNT(DISTINCT) readout over a maintained support table:
    (key_col, n_distinct)."""
    return (
        read_versioned(spark, agg_path)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def refresh_join_view(spark: SparkSession, left_path: str, right_path: str,
                      view_path: str, on: str) -> tuple[int, int]:
    """Maintain the materialized INNER equi-join of two versioned tables
    at ``view_path``; returns the (left, right) source versions now
    reflected.

    The classic delta-join rule for the append-only fast path: with
    appends dA to the left and dB to the right since the last refresh,

        dView = dA >< B_new  UNION ALL  A_old >< dB

    (dA >< B_new already covers dA >< dB, so each new pair appears
    exactly once), appended to the view — cost O(dA join B + A join dB),
    never a view rebuild. A_old is the LEFT side pinned at its previous
    cursor version — exactly what the versioned log's time travel
    provides, no second copy kept anywhere. At scale both delta joins
    shuffle only the delta plus the matching side (with the stored side
    partitioned/z-ordered on the key, the commit-recorded min/max stats
    prune the non-delta side's files).

    Any delete in either feed (an overwrite commit), or a vacuumed feed
    range (ChangeFeedTruncated), falls back to one full recompute that
    overwrites the view — correctness first, the same contract as the
    aggregate refreshes. Dual cursors ride the view's own commit record
    ({"left_version", "right_version"} — ``source_version`` is not used
    so the single-source cursor walk never confuses a join view for an
    aggregate); both columns sets must be disjoint apart from ``on``.

    Race safety: the aggregate refreshes are naturally safe under
    concurrent pollers (state and cursor OVERWRITE atomically together,
    so the last writer's pair is self-consistent), but a join refresh
    APPENDS — two racers folding the same cursor range would land the
    same pairs twice. The delta append is therefore a compare-and-swap
    on the view version the cursor was read from (``expect_base``); the
    loser sees CommitConflict, re-reads the advanced cursor, and retries
    from there (usually a no-op).
    """
    lv_new = current_version(left_path)
    rv_new = current_version(right_path)
    cursor = None
    view_at_read = current_version(view_path)
    for v in range(view_at_read, 0, -1):
        c = _read_commit_or_none(view_path, v)
        if c is None:
            break
        if "left_version" in c and "right_version" in c:
            cursor = (c["left_version"], c["right_version"])
            break
    meta = {"left_version": lv_new, "right_version": rv_new}
    if cursor is not None and cursor[0] >= lv_new and cursor[1] >= rv_new:
        return cursor

    def recompute() -> tuple[int, int]:
        full = read_versioned(spark, left_path, version=lv_new).join(
            read_versioned(spark, right_path, version=rv_new), on)
        write_versioned(full, view_path, mode="overwrite", meta=meta)
        return lv_new, rv_new

    if cursor is None:
        return recompute()
    lv_old, rv_old = cursor

    def range_has_overwrite(path: str, frm: int, to: int) -> bool:
        """Driver-side rebuild decision from the COMMIT RECORDS alone:
        a delete can only come from a non-compaction overwrite, so this
        answers in O(log reads) with zero Spark jobs — the feed scan the
        previous version launched here paid two full delta scans per
        refresh just to learn 'no deletes'. A vacuumed record reads as
        an overwrite (forces the rebuild the truncated feed would)."""
        for v in range(frm + 1, to + 1):
            c = _read_commit_or_none(path, v)
            if c is None:
                return True
            if c["action"] == "overwrite" and "compacted_from" not in c:
                return True
        return False

    if (range_has_overwrite(left_path, lv_old, lv_new)
            or range_has_overwrite(right_path, rv_old, rv_new)):
        # an overwrite rewrote a base snapshot (or history is gone): the
        # append-only delta rule no longer covers the change — rebuild
        return recompute()
    try:
        lfeed = read_change_feed(spark, left_path, lv_old, lv_new)
        rfeed = read_change_feed(spark, right_path, rv_old, rv_new)
    except ChangeFeedTruncated:
        return recompute()
    feed_cols = ("_change_type", "_commit_version")
    d_left = lfeed.drop(*feed_cols)
    d_right = rfeed.drop(*feed_cols)
    b_new = read_versioned(spark, right_path, version=rv_new)
    a_old = read_versioned(spark, left_path, version=lv_old)
    d_view = d_left.join(b_new, on).unionByName(a_old.join(d_right, on))
    from covid_19_data_engineering_spark.sources.versioned import (
        CommitConflict,
    )

    try:
        write_versioned(d_view, view_path, mode="append", meta=meta,
                        expect_base=view_at_read)
    except CommitConflict:
        # a concurrent refresher advanced the view since we read its
        # cursor; re-read and fold from wherever it landed (no-op when
        # the racer covered our range)
        return refresh_join_view(spark, left_path, right_path,
                                 view_path, on)
    return lv_new, rv_new

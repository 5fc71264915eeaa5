"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windows cover time bucketing; this is the escape hatch for
operator semantics Spark doesn't ship: here, a per-user running anomaly
tracker that maintains (count, mean, M2) Welford state across micro-batches
and emits one row per batch per user with the running z-score of the batch's
max value.

Scale posture: state is keyed by user_id (the shuffle key), O(3 floats) per
key, evicted by the processing-time timeout — the same state-store mechanics
``session_window`` uses, but with user-defined transition logic. Arrow moves
each group's batch across the Python boundary once.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events_total bigint, running_mean double, "
    "running_std double, batch_max double, batch_max_zscore double"
)
STATE_SCHEMA = "count bigint, mean double, m2 double"


def _update_anomaly_state(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Welford-merge each arriving batch into (count, mean, M2) state, emit
    the batch max's z-score against the PRIOR running distribution."""
    (user_id,) = key
    if state.exists:
        count, mean, m2 = state.get
    else:
        count, mean, m2 = 0, 0.0, 0.0

    prior_count, prior_mean, prior_m2 = count, mean, m2
    batch_max = None
    for pdf in batches:
        for v in pdf["value"].astype(float):
            count += 1
            delta = v - mean
            mean += delta / count
            m2 += delta * (v - mean)
            batch_max = v if batch_max is None else max(batch_max, v)

    state.update((count, mean, m2))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict idle users after 1h

    if batch_max is None:
        return
    if prior_count >= 2:
        prior_std = (prior_m2 / (prior_count - 1)) ** 0.5
        z = (batch_max - prior_mean) / prior_std if prior_std > 0 else 0.0
    else:
        z = 0.0
    running_std = (m2 / (count - 1)) ** 0.5 if count >= 2 else 0.0
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events_total": [count],
            "running_mean": [round(mean, 4)],
            "running_std": [round(running_std, 4)],
            "batch_max": [batch_max],
            "batch_max_zscore": [round(z, 4)],
        }
    )


def stream_user_anomaly(events: DataFrame) -> DataFrame:
    """Per-user stateful anomaly scores over the value column."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_anomaly_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def start_versioned_append_stream(sdf, table_path: str, checkpoint_dir: str,
                                  writer_id: str | None = None):
    """Stream micro-batches into a versioned table: each non-empty batch
    commits as ONE append version (the first as the founding overwrite),
    so downstream readers get snapshot isolation and time travel across
    the ingestion timeline — the Delta-style streaming-sink shape on the
    engine's own log-structured format.

    Exactly-once across micro-batch RETRIES: foreachBatch may replay an
    epoch after a failure, so each commit carries a (writer, epoch) txn
    marker — ``writer_id`` defaults to the checkpoint directory, which
    IS the epoch sequence's identity (Delta's txnAppId idea) — and the
    sink skips any epoch at or below this writer's last committed one.
    The lookup (``last_txn_epoch``) survives interleaved commits by
    OTHER writers: compaction or a second stream cannot erase the
    marker, because checkpoints aggregate the per-writer txn map and
    the walk is bounded at O(CHECKPOINT_INTERVAL) log reads. A NEW
    query with a fresh checkpoint dir restarts epochs at 0 but carries
    a different writer_id, so its batches land instead of being
    silently swallowed by a stale guard. The guard is NOT check-then-act
    (round-7 ADVICE low): write_versioned re-verifies the epoch inside
    its atomic claim loop, so even two live writers misconfigured onto
    one writer_id cannot double-commit an epoch — the loser surfaces
    TxnAlreadyApplied, which the sink treats as the no-op it is."""
    from covid_19_data_engineering_spark.sources.versioned import (
        TxnAlreadyApplied,
        current_version,
        last_txn_epoch,
        write_versioned,
    )

    app = writer_id or checkpoint_dir

    def _sink(batch_df, epoch_id: int) -> None:
        last_epoch = last_txn_epoch(table_path, app)
        if last_epoch is not None and epoch_id <= last_epoch:
            return  # replayed epoch — skip before any Spark action
        if batch_df.isEmpty():
            return
        try:
            write_versioned(
                batch_df, table_path,
                mode="append" if current_version(table_path) > 0
                else "overwrite",
                meta={"txn": {"app": app, "epoch": epoch_id}},
            )
        except TxnAlreadyApplied:
            pass  # raced replay: the epoch landed via another path

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_streaming_aggregate(sdf, table_path: str, agg_path: str,
                              checkpoint_dir: str, key_col: str,
                              value_col: str, writer_id: str | None = None):
    """Streaming MATERIALIZED VIEW — the CDC -> IVM loop composed with
    the streaming sink: each micro-batch (1) commits to the versioned
    table exactly-once via the (writer, epoch) txn guard, then (2) folds
    the committed deltas into the maintained per-``key_col``
    (n_rows, n_vals, sum_value) aggregate through the change feed
    (``refresh_sum_aggregate``).

    Crash safety falls out of the two cursors' independence: the
    refresh reads its resume point from the AGGREGATE's own commit log,
    so a crash between table commit and aggregate fold loses nothing —
    the next batch's refresh replays the missed feed range; a replayed
    epoch skips the table commit (txn guard) while its refresh call
    no-ops (cursor already at the source version). The refresh also
    runs on replayed epochs precisely to perform that catch-up. The
    invariant after every batch: maintained aggregate == fresh groupBy
    of the sink table (the pytest pin), at O(batch rows) fold cost —
    what a 100 TB ingest pays instead of re-aggregating the table per
    batch."""
    from covid_19_data_engineering_spark.sources.incremental import (
        refresh_sum_aggregate,
    )
    from covid_19_data_engineering_spark.sources.versioned import (
        TxnAlreadyApplied,
        current_version,
        last_txn_epoch,
        write_versioned,
    )

    app = writer_id or checkpoint_dir

    def _sink(batch_df, epoch_id: int) -> None:
        last_epoch = last_txn_epoch(table_path, app)
        fresh = last_epoch is None or epoch_id > last_epoch
        if fresh and not batch_df.isEmpty():
            try:
                write_versioned(
                    batch_df, table_path,
                    mode="append" if current_version(table_path) > 0
                    else "overwrite",
                    meta={"txn": {"app": app, "epoch": epoch_id}},
                )
            except TxnAlreadyApplied:
                pass  # raced replay: the epoch landed via another path
        if current_version(table_path) > 0:
            # idempotent cursor-driven fold: catches up any feed range a
            # previous crash left unfolded, no-ops when already current
            refresh_sum_aggregate(batch_df.sparkSession, table_path,
                                  agg_path, key_col, value_col)

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Lineage truncation seam: localCheckpoint by default, reliable
checkpoint() when a checkpoint directory is configured.

The iterative operators (connected components' label/star rounds, graph
algorithms' per-round folds) re-reference their previous round's result
twice per round, so the logical plan doubles per round unless it is
truncated — every loop in this repo truncates via ``localCheckpoint``.
That stores blocks on EXECUTORS: fast (no DFS write), but a lost
executor loses the blocks AND the lineage to rebuild them, failing the
job mid-iteration. On a real cluster the posture documented in SCALE.md
is reliable ``DataFrame.checkpoint()`` — same truncation, DFS-backed,
executor-loss-safe — which this seam swaps in process-wide (round-12
verdict #5: the documented posture was untested prose).

Usage::

    from covid_19_data_engineering_spark.operators.lineage import (
        set_reliable_checkpoint_dir,
    )
    set_reliable_checkpoint_dir(spark, "hdfs:///tmp/cc-checkpoints")
    connected_components(edges)          # rounds now survive executor loss
    set_reliable_checkpoint_dir(spark, None)   # restore the local default

Operators call ``.transform(truncate)`` (lazy) or
``.transform(truncate_eager)`` where they previously called
``.localCheckpoint(...)`` — chaining-compatible, and a no-op behavior
change while no directory is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_RELIABLE_DIR: str | None = None


def set_reliable_checkpoint_dir(spark: SparkSession,
                                path: str | None) -> None:
    """Route every ``truncate``/``truncate_eager`` call through reliable
    ``DataFrame.checkpoint()`` rooted at ``path``; ``None`` restores the
    localCheckpoint default. The directory should be on durable shared
    storage (HDFS/S3) on a cluster; executor loss then costs a re-read
    of the checkpoint instead of a failed job."""
    global _RELIABLE_DIR
    _RELIABLE_DIR = path
    if path is not None:
        spark.sparkContext.setCheckpointDir(path)


def reliable_checkpoint_dir() -> str | None:
    return _RELIABLE_DIR


def truncate(df: DataFrame) -> DataFrame:
    """Lazy lineage truncation (materializes with the next job)."""
    if _RELIABLE_DIR is not None:
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def truncate_eager(df: DataFrame) -> DataFrame:
    """Eager lineage truncation (materializes now)."""
    if _RELIABLE_DIR is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

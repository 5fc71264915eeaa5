"""Shared vector primitives: cosine similarity and deterministic
random-hyperplane LSH bucketing.

Used by both the similarity-search operators (operators/similarity.py) and
the embedding near-dup operator (operators/dedup.py) so the two surfaces
share one bucket assignment. Everything is a pure JVM column expression
(zip_with / aggregate / transform) — no Python in the hot path — and the
hyperplanes are derived from fixed integer mixes, so bucket assignment is
reproducible across runs and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def cosine_sim(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: (x * x).cast("double")),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: (x * x).cast("double")),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


# 16 tables x 4 bits: per-table collision prob for angle θ is
# (1-θ/π)^4, and 16 independent tables give recall 1-(1-p)^16 —
# ~0.9 for cosine≥0.3 neighbors, ~1-5e-8 for cosine≥0.95 near-dups.
# More bits/table (sharper buckets, fewer candidates) is the knob to
# turn as the corpus grows.
N_PLANES = 64
SIGN_BITS_PER_TABLE = 4
N_TABLES = N_PLANES // SIGN_BITS_PER_TABLE
DIM = 64
# deterministic pseudo-random hyperplanes: component (p, d) derives from a
# fixed integer mix — stable across runs/engines, no runtime randomness
PLANES: list[list[float]] = [
    [(((p * 1_000_003 + d) * 2654435761 % 2**32) / 2**31 - 1.0) for d in range(DIM)]
    for p in range(N_PLANES)
]


def lsh_bucket_ctes() -> str:
    """DuckDB twin of ``with_lsh_buckets`` as a composable CTE chain
    (emb -> planes -> bits -> bkt). The hyperplanes come from the same fixed
    integer mix as ``PLANES``: ((p*1000003 + d) * 2654435761 % 2^32) / 2^31
    - 1 is pure BIGINT arithmetic and the division by a power of two is
    exact in DOUBLE, so bucket assignment is bit-identical across engines.
    The per-plane dot product folds left-to-right like Spark's F.aggregate.
    Shared by the ann_lsh_topk and dedup_embedding_cosine oracles."""
    return f"""emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    planes AS (
      SELECT p, list_transform(
               range(0, {DIM}),
               d -> CAST((p * 1000003 + d) * 2654435761 % 4294967296 AS DOUBLE)
                    / 2147483648.0 - 1.0
             ) AS pl
      FROM (SELECT unnest(range(0, {N_PLANES})) AS p)
    ),
    bits AS (
      SELECT v.vec_id, pr.p,
             CASE WHEN list_reduce(
               list_transform(range(1, {DIM} + 1), i -> v.e[i] * pr.pl[i]),
               (a, b) -> a + b) >= 0 THEN 1 ELSE 0 END AS bit
      FROM emb v CROSS JOIN planes pr
    ),
    bkt AS (
      SELECT vec_id, CAST(p // {SIGN_BITS_PER_TABLE} AS INTEGER) AS tbl,
             SUM(bit * CASE p % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                  WHEN 2 THEN 2 ELSE 1 END) AS bucket
      FROM bits GROUP BY vec_id, p // {SIGN_BITS_PER_TABLE}
    )"""


def signature_bits(vec: Column) -> list[Column]:
    bits = []
    for plane in PLANES:
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append((dot >= 0).cast("int"))
    return bits


def with_lsh_buckets(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Explode each row into its N_TABLES (table, bucket) LSH assignments.

    Output columns: (id_col, vec_col, table, bucket). The signature bits are
    computed in ONE projection; the explode multiplies rows by N_TABLES but
    adds no shuffle — downstream equi-joins on (table, bucket) bound the
    candidate pair space.
    """
    bits = signature_bits(F.col(vec_col))
    buckets = []
    for t in range(N_TABLES):
        chunk = bits[t * SIGN_BITS_PER_TABLE:(t + 1) * SIGN_BITS_PER_TABLE]
        acc = F.lit(0)
        for bit in chunk:
            acc = acc * 2 + bit
        buckets.append(F.struct(F.lit(t).alias("table"), acc.alias("bucket")))
    return df.select(
        id_col, vec_col, F.explode(F.array(*buckets)).alias("tb")
    ).select(id_col, vec_col, F.col("tb.table").alias("table"),
             F.col("tb.bucket").alias("bucket"))

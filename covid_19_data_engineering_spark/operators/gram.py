"""Distributed Gram / covariance profile over the embedding table — the
preprocessing pass behind PCA, whitening, and feature-decorrelation audits.

The Spark-first shape is NOT an explode into (row, i, j) triples (a 4096x
row blow-up for 64 dims): each Arrow batch crosses into one vectorized
numpy kernel (``mapInPandas``) that emits a single 64x64 partial Gram
matrix plus the first-moment vector, and the only shuffle aggregates
<= 4096 + 64 + 1 keyed partials. That is the textbook map-side-combined
second-moment pass — corpus volume changes the number of partials, never
their size.

Parity across engines despite Python in the loop: every per-element
product is rounded HALF-AWAY-FROM-ZERO to fixed-point int64
(round(x_i * x_j * 1e9)) BEFORE any summation, so the partial sums are
exact integers — invariant to Arrow batch boundaries, partitioning, and
summation order — and DuckDB replays the identical rounding with its own
round(). Embeddings are float32 on disk; both engines cast to float64
before the product (float32 x float32 products land on different ULPs).

No reference analogue (the reference has no vector surface at all);
SURVEY §2 C-extensions / embedding battery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

_FX = 1_000_000_000  # fixed-point scale for per-element products/moments
_DIM = 64


def _gram_partials(batches: "Iterator") -> "Iterator":
    """Per Arrow batch: one 64x64 upper-triangle partial Gram in exact
    int64 fixed-point, the first-moment vector (j = -1 rows), and the row
    count (i = j = -1)."""
    import numpy as np
    import pandas as pd

    def half_away(y):
        return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)

    iu = np.triu_indices(_DIM)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        prods = half_away(x[:, :, None] * x[:, None, :] * _FX).sum(axis=0)
        moments = half_away(x * _FX).sum(axis=0)
        out = pd.DataFrame({
            "i": np.concatenate([iu[0], np.arange(_DIM), [-1]]),
            "j": np.concatenate([iu[1], np.full(_DIM, -1), [-1]]),
            "s": np.concatenate([prods[iu], moments, [len(pdf)]]),
        })
        yield out


def embedding_covariance_profile(emb: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` covariance entries (by |cov|, diagonal included) of the
    embedding distribution — (i, j, cov).

    cov_ij = E[x_i x_j] - E[x_i] E[x_j], with both moments carried as
    exact fixed-point int64 sums (see module docstring). The corpus is
    scanned once; one shuffle reduces <= 2145 + 64 + 1 keyed partials;
    the top-k runs on the 64x64 result.
    """
    partials = emb.select("embedding").mapInPandas(
        _gram_partials, "i int, j int, s long")
    agg = partials.groupBy("i", "j").agg(F.sum("s").alias("s"))
    cnt = agg.where("i = -1 AND j = -1").select(F.col("s").alias("n"))
    moments = agg.where("i >= 0 AND j = -1").select(
        "i", F.col("s").alias("m"))
    pairs = agg.where("j >= 0").select("i", "j", F.col("s").alias("p"))
    mi = moments.select(F.col("i").alias("_i"), F.col("m").alias("m_i"))
    mj = moments.select(F.col("i").alias("_j"), F.col("m").alias("m_j"))
    cov = ("(CAST(p AS DOUBLE) / n - "
           f"(CAST(m_i AS DOUBLE) / n) * (CAST(m_j AS DOUBLE) / n) / {_FX})"
           f" / {_FX}")
    return (
        pairs.join(F.broadcast(mi), pairs["i"] == mi["_i"])
        .join(F.broadcast(mj), pairs["j"] == mj["_j"])
        .crossJoin(F.broadcast(cnt))
        .select("i", "j", F.round(F.expr(cov), 8).alias("cov"))
        .orderBy(F.abs(F.col("cov")).desc(), "i", "j")
        .limit(k)
    )


@register(
    "embedding_covariance_profile",
    oracle=f"""
    WITH pe AS (
      SELECT d.d AS i, CAST(e.embedding[d.d + 1] AS DOUBLE) AS x, e.vec_id
      FROM embeddings e, range({_DIM}) d(d)
    ),
    pairs AS (
      -- floor(abs(y)+0.5)*sign(y), NOT round(): the numpy kernel and the
      -- oracle must round through the IDENTICAL float ops, or a product
      -- within one ULP of a half-integer flips between engines
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(floor(abs(a.x * b.x * {_FX}) + 0.5)
                           * sign(a.x * b.x * {_FX}) AS BIGINT))
                  AS BIGINT) AS p
      FROM pe a JOIN pe b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    moments AS (
      SELECT i, CAST(SUM(CAST(floor(abs(x * {_FX}) + 0.5)
                              * sign(x * {_FX}) AS BIGINT)) AS BIGINT) AS m
      FROM pe GROUP BY i
    ),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
    SELECT p.i, p.j,
           ROUND((CAST(p.p AS DOUBLE) / n -
                  (CAST(a.m AS DOUBLE) / n) * (CAST(b.m AS DOUBLE) / n)
                  / {_FX}) / {_FX}, 8) AS cov
    FROM pairs p
    JOIN moments a ON a.i = p.i
    JOIN moments b ON b.i = p.j
    CROSS JOIN cnt
    ORDER BY abs(cov) DESC, p.i, p.j
    LIMIT 20
    """,
    doc="Top-20 covariance entries of the embedding distribution (|cov| "
    "ranked, variances included) — the decorrelation audit before PCA / "
    "whitening / diagonal-covariance assumptions. One corpus scan through "
    "a vectorized Arrow-batch Gram kernel (no 4096x posexplode), one "
    "shuffle over <= 2145 + 65 keyed partials; per-element products are "
    "fixed-point int64 BEFORE summation, so the result is invariant to "
    "batch boundaries and summation order and replays exactly in the "
    "oracle's unnest formulation.",
)
def embedding_covariance_profile_query(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    return embedding_covariance_profile(load_table(spark, "embeddings", sf_dir))


# --------------------------------------------------------------------------
# Per-dimension quantile calibration: the p0.1 / p50 / p99.9 of every
# embedding dimension, for clip-then-quantize (int8) calibration — max-abs
# scaling (what embedding_quantize_int8 uses) wastes range on one outlier;
# percentile clipping is the production practice. 64 parallel
# histogram-refine passes, never a global sort.
# --------------------------------------------------------------------------

_CAL_BINS = 1024
_CAL_QS = (0.001, 0.5, 0.999)
# micro-unit fixed point via floor(x*1e6 + 0.5): ONE shared expression on
# both engines (consistent tie behavior matters, not the convention)
_MICRO = "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"


def embedding_quantile_calibration(emb: DataFrame,
                                   bins: int = _CAL_BINS) -> DataFrame:
    """(dim, quantile, rank, value_micro): exact order statistics of every
    embedding dimension at p = 0.001 / 0.5 / 0.999, in 1e-6 units.

    The quantile histogram-refine pattern (operators/quantiles.py), run
    for all 64 dimensions AT ONCE: one posexplode scan bins every (dim,
    value) against per-dim [lo, hi] (a broadcast 64-row aggregate — no
    driver round-trip), the cumsum + rank location runs on <= 64 * bins
    aggregated rows, and pass 2 ranks only candidate (dim, bucket) pairs
    — expected n/bins rows per task, 64-way parallel. Nothing ever sees
    a global order; the corpus is scanned exactly twice.
    """
    vals = emb.select(
        F.posexplode("embedding").alias("dim", "x"),
    ).select("dim", F.expr(_MICRO).alias("v"))
    params = vals.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        vals.join(F.broadcast(params), "dim")
        .select("dim", "v",
                F.expr(f"CAST((v - lo) * {bins} DIV (hi - lo + 1) "
                       "AS BIGINT)").alias("b"))
    )
    counts = binned.groupBy("dim", "b").agg(F.count(F.lit(1)).alias("cnt"))
    cum_w = Window.partitionBy("dim").orderBy("b") \
        .rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "below", F.coalesce(F.sum("cnt").over(cum_w), F.lit(0)))
    qdf = emb.sparkSession.createDataFrame(
        [(q,) for q in _CAL_QS], "quantile double")
    targets = params.crossJoin(F.broadcast(qdf)).select(
        "dim", "quantile",
        F.expr("CAST(floor((n - 1) * quantile) AS BIGINT) + 1").alias("rank"),
    )
    located = (
        targets.join(cum, ["dim"])
        .where((F.col("below") < F.col("rank"))
               & (F.col("rank") <= F.col("below") + F.col("cnt")))
        .select("dim", "quantile", "rank", "b",
                (F.col("rank") - F.col("below")).alias("rk_in"))
    )
    cand = located.select("dim", "b").distinct()
    ranked = (
        binned.join(F.broadcast(cand), ["dim", "b"])
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("dim", "b").orderBy("v")))
    )
    return (
        located.join(ranked, ["dim", "b"])
        .where(F.col("rk_in") == F.col("rn"))
        .select("dim", "quantile", "rank",
                F.col("v").alias("value_micro"))
        .orderBy("dim", "quantile")
    )


@register(
    "embedding_quantile_calibration",
    oracle=f"""
    WITH vals AS (
      SELECT d.d AS dim,
             {_MICRO.replace('CAST(x AS DOUBLE)',
                             'CAST(e.embedding[d.d + 1] AS DOUBLE)')} AS v
      FROM embeddings e, range({_DIM}) d(d)
    ),
    params AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n FROM vals GROUP BY dim
    ),
    targets AS (
      SELECT dim, CAST(q AS DOUBLE) AS quantile,
             CAST(floor((n - 1) * q) AS BIGINT) + 1 AS rank
      FROM params, (SELECT unnest([{', '.join(str(q) for q in _CAL_QS)}]) AS q)
    ),
    ranked AS (
      SELECT dim, v,
             ROW_NUMBER() OVER (PARTITION BY dim ORDER BY v) AS rn
      FROM vals
    )
    SELECT t.dim, t.quantile, t.rank, r.v AS value_micro
    FROM targets t JOIN ranked r ON r.dim = t.dim AND r.rn = t.rank
    ORDER BY t.dim, t.quantile
    """,
    doc="Per-dimension embedding order statistics (p0.1/p50/p99.9 in 1e-6 "
    "units) for clip-then-quantize calibration — max-abs int8 scaling "
    "wastes range on a single outlier; percentile clipping is the "
    "production practice. All 64 dimensions run ONE shared histogram-"
    "refine: posexplode once, bin against broadcast per-dim [lo, hi], "
    "locate ranks on the <= 64*1024 aggregated count table, rank only "
    "candidate (dim, bucket) pairs 64-way parallel. The oracle states the "
    "same k = floor((n-1)p)+1 semantics as 64 plain ranked windows.",
)
def embedding_quantile_calibration_query(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    return embedding_quantile_calibration(
        load_table(spark, "embeddings", sf_dir))

"""Principal component via power iteration — PCA the 100 TB way.

PCA over n rows never needs the n x n anything: the sufficient statistic
is the d x d covariance, and for d = 64 that is 2,145 numbers no matter
how many billions of rows produced them. The Spark-first decomposition
is therefore:

1. ONE distributed pass — the Arrow-batch Gram kernel from
   operators/gram.py (map-side-combined exact int64 partials, one
   shuffle over <= 2,210 keys);
2. a SKETCH-SIZED power iteration on the collected 64 x 64 covariance
   (a bounded O(d^2) driver collect, the same class as the 256-cell CMS
   grid readout) — 8 fixed rounds of w = C v, v = w / ||w||.

Cross-engine exactness for an ITERATIVE float computation: every
reduction inside the iteration is fixed-point — each term of a
matrix-vector product rounds half-away-from-zero to int64 at 1e9 scale
BEFORE summation (the gram.py trick), the squared-norm likewise — so
the only float ops are elementwise multiplies, one division and one
sqrt per round, each correctly rounded on identical operands in both
engines. The covariance entries themselves are derived from the exact
integer moments through the identical expression on both sides, and the
start vector is all-1/8 (1/8 is a power of two: exact). The DuckDB
oracle replays the 8 rounds CTE-for-CTE over the mirrored covariance
table; numpy executes the same arithmetic verbatim.

Output: one row per dimension — (dim, loading) of the dominant
eigenvector, plus the Rayleigh eigenvalue and its explained-variance
share (eigenvalue / trace), both via the same fixed-point reductions.
Sign is pinned by the deterministic start vector.

No reference analogue (SURVEY §2 negative inventory); the natural
consumer of embedding_covariance_profile's decorrelation audit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.gram import (
    _DIM,
    _FX,
    _gram_partials,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

PCA_ROUNDS = 8
_V0 = 0.125  # 1/8 = 1/sqrt(64), a power of two: exact in both engines


def _collect_covariance(emb: DataFrame) -> "tuple":
    """The distributed pass + bounded readout: returns (C, n) where C is
    the full d x d covariance as float64 built from exact integer
    moments through the same expression the oracle states."""
    import numpy as np

    partials = emb.select("embedding").mapInPandas(
        _gram_partials, "i int, j int, s long")
    agg = partials.groupBy("i", "j").agg(F.sum("s").alias("s")).collect()
    n = None
    p = {}
    m = np.zeros(_DIM, dtype=np.int64)
    for r in agg:
        if r["i"] == -1 and r["j"] == -1:
            n = r["s"]
        elif r["j"] == -1:
            m[r["i"]] = r["s"]
        else:
            p[(r["i"], r["j"])] = r["s"]
    c = np.zeros((_DIM, _DIM), dtype=np.float64)
    for (i, j), pij in p.items():
        # the identical float expression as the covariance oracle:
        # (p/n - (m_i/n)*(m_j/n)/FX)/FX, every operand an exact integer
        v = (pij / n - (m[i] / n) * (m[j] / n) / _FX) / _FX
        c[i, j] = v
        c[j, i] = v
    return c, n


def _power_iterate(c: "object") -> "tuple":
    """8 rounds of fixed-point power iteration mirroring the oracle's
    CTE chain op-for-op; returns (v, eigenvalue, trace)."""
    import math

    import numpy as np

    def fx_round(t):
        return (np.sign(t) * np.floor(np.abs(t) + 0.5)).astype(np.int64)

    v = np.full(_DIM, _V0, dtype=np.float64)
    for _ in range(PCA_ROUNDS):
        t = c * v[None, :] * float(_FX)          # elementwise doubles
        w = fx_round(t).sum(axis=1)              # exact int64 reduction
        nw = w.astype(np.float64) / float(_FX)
        q = int(fx_round(nw * nw * float(_FX)).sum())
        norm = math.sqrt(q / float(_FX))
        v = nw / norm
    # Rayleigh quotient lambda = v' C v, terms (c_ij * v_i) * v_j rounded
    # to fixed point before the exact sum
    lam_fx = int(fx_round((c * v[:, None]) * v[None, :] * float(_FX)).sum())
    lam = lam_fx / float(_FX)
    tr_fx = int(fx_round(np.diag(c) * float(_FX)).sum())
    trace = tr_fx / float(_FX)
    return v, lam, trace


def _pca_oracle_sql() -> str:
    fx = _FX
    rounds = []
    for r in range(1, PCA_ROUNDS + 1):
        prev = f"v{r - 1}"
        rounds.append(f""",
    w{r} AS MATERIALIZED (
      SELECT C.i,
             CAST(SUM(CAST(floor(abs(C.cov * v.val * {fx}) + 0.5)
                           * sign(C.cov * v.val * {fx}) AS BIGINT))
                  AS BIGINT) AS wi
      FROM covfull C JOIN {prev} v ON v.j = C.j
      GROUP BY C.i
    ),
    n{r} AS MATERIALIZED (
      SELECT sqrt(CAST(CAST(SUM(CAST(floor(
                 abs((CAST(wi AS DOUBLE) / {fx})
                     * (CAST(wi AS DOUBLE) / {fx}) * {fx}) + 0.5)
                 AS BIGINT)) AS BIGINT) AS DOUBLE) / {fx}) AS nn
      FROM w{r}
    ),
    v{r} AS MATERIALIZED (
      SELECT i AS j,
             (CAST(wi AS DOUBLE) / {fx}) / (SELECT nn FROM n{r}) AS val
      FROM w{r}
    )""")
    return f"""
    WITH pe AS MATERIALIZED (
      SELECT d.d AS i, CAST(e.embedding[d.d + 1] AS DOUBLE) AS x, e.vec_id
      FROM embeddings e, range({_DIM}) d(d)
    ),
    pairs AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(floor(abs(a.x * b.x * {fx}) + 0.5)
                           * sign(a.x * b.x * {fx}) AS BIGINT))
                  AS BIGINT) AS p
      FROM pe a JOIN pe b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    moments AS MATERIALIZED (
      SELECT i, CAST(SUM(CAST(floor(abs(x * {fx}) + 0.5)
                              * sign(x * {fx}) AS BIGINT)) AS BIGINT) AS m
      FROM pe GROUP BY i
    ),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    covut AS MATERIALIZED (
      SELECT p.i, p.j,
             (CAST(p.p AS DOUBLE) / n -
              (CAST(a.m AS DOUBLE) / n) * (CAST(b.m AS DOUBLE) / n)
              / {fx}) / {fx} AS cov
      FROM pairs p
      JOIN moments a ON a.i = p.i
      JOIN moments b ON b.i = p.j
      CROSS JOIN cnt
    ),
    covfull AS MATERIALIZED (
      SELECT i, j, cov FROM covut
      UNION ALL
      SELECT j AS i, i AS j, cov FROM covut WHERE i < j
    ),
    v0 AS (SELECT unnest(range(0, {_DIM})) AS j, CAST({_V0} AS DOUBLE) AS val)
    {"".join(rounds)},
    lam AS (
      SELECT CAST(CAST(SUM(CAST(floor(
               abs((C.cov * a.val) * b.val * {fx}) + 0.5)
               * sign((C.cov * a.val) * b.val * {fx}) AS BIGINT))
             AS BIGINT) AS DOUBLE) / {fx} AS ev
      FROM covfull C
      JOIN v{PCA_ROUNDS} a ON a.j = C.i
      JOIN v{PCA_ROUNDS} b ON b.j = C.j
    ),
    tr AS (
      SELECT CAST(CAST(SUM(CAST(floor(abs(cov * {fx}) + 0.5)
                                * sign(cov * {fx}) AS BIGINT))
             AS BIGINT) AS DOUBLE) / {fx} AS trace
      FROM covfull WHERE i = j
    )
    SELECT v.j AS dim,
           ROUND(v.val, 6) AS loading,
           ROUND((SELECT ev FROM lam), 6) AS eigenvalue,
           ROUND((SELECT ev FROM lam) / (SELECT trace FROM tr), 4)
             AS explained_share
    FROM v{PCA_ROUNDS} v
    ORDER BY dim
    """


@register(
    "embedding_pca_power",
    oracle=_pca_oracle_sql(),
    doc=f"Dominant principal component of the embedding distribution via "
    f"{PCA_ROUNDS} fixed power-iteration rounds: ONE distributed pass "
    "(the Arrow-batch exact-int Gram kernel, map-side-combined, one "
    "shuffle over <= 2,210 keys) reduces any corpus to the 64x64 "
    "covariance, then the iteration runs sketch-sized (a bounded O(d^2) "
    "readout). Every reduction is fixed-point int64 before summation — "
    "matrix-vector products, norms, the Rayleigh eigenvalue, the trace "
    "— so the iterative float computation is bit-stable across engines "
    "and the oracle replays all 8 rounds CTE-for-CTE. Returns per-dim "
    "loadings plus the eigenvalue and explained-variance share.",
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    c, _ = _collect_covariance(emb)
    v, lam, trace = _power_iterate(c)
    rows = [(int(d), round(float(v[d]), 6), round(lam, 6),
             round(lam / trace, 4)) for d in range(_DIM)]
    return spark.createDataFrame(
        rows, "dim long, loading double, eigenvalue double, "
              "explained_share double"
    ).orderBy("dim")

"""Semantic deduplication (SemDeDup): k-means partition, then cosine
near-dup pruning WITHIN clusters only.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (2023): embed the corpus, k-means it, and look
for high-cosine pairs only inside each cluster — the clustering bounds
the quadratic pair search to O(Σ cluster²) instead of O(n²), and K is
THE scale knob: it must GROW with the corpus or clusters (and the pair
search) grow quadratically. The registered query therefore derives
K = max(8, n / SEM_CLUSTER_TARGET) — identical integer arithmetic in
the oracle's cent0 CTE — capping expected cluster size at any scale
(measured: the fixed-K variant ran 4.8x at 3x data; capped runs ~1x).

Decision rule (deterministic, single-pass, SQL-expressible): rank each
cluster's members by distance-to-centroid (closest first, vec_id tie);
a vector is ``drop_semantic`` iff some BETTER-RANKED member of its
cluster has cosine >= τ with it, and it records that dominator
(best-ranked one) plus the max cosine seen. This is the one-shot variant
of the paper's greedy keep-closest-to-centroid scan: the greedy version
re-checks only against already-retained members (a chain a > b > c with
cos(a,b) >= τ > cos(a,c), cos(b,c) >= τ keeps c once b is dropped);
dominated-by-any is stricter, order-independent, and needs no iteration
— the honest trade for an exact cross-engine oracle, stated here rather
than hidden.

Scale shape: the partition stage is the k-means plan (map-only broadcast
assignment); ranking is one window per cluster; the pair stage is an
equi-join on cid whose volume the clustering bounds; the decision rollup
is a groupBy on the dominated side. All JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.operators.kmeans import (
    KM_K,
    kmeans_assignments,
    kmeans_cte_chain,
)
from covid_19_data_engineering_spark.operators.vectors import cosine_sim
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

# the synthetic embeddings are near-orthogonal (pair cosines ~0, max
# ~0.5), so the production-style 0.9+ threshold would be vacuous at every
# SF; 0.4 keeps real survivors flowing — the same reasoning as
# dedup_embedding_cosine's threshold
SEM_THRESHOLD = 0.4

# target members per cluster: K = max(KM_K, n // SEM_CLUSTER_TARGET), the
# SemDeDup scale knob made AUTOMATIC — a fixed K turns the within-cluster
# pair search quadratic as the corpus grows (measured: 4.8x time at 3x
# data with K=8); deriving K from corpus size caps expected cluster size,
# so the pair stage scales ~linearly. Identical integer arithmetic on
# both engines (greatest/"//" in the oracle's cent0 CTE).
SEM_CLUSTER_TARGET = 256


def semantic_dedup(emb: DataFrame, threshold: float = SEM_THRESHOLD,
                   k: int | None = None) -> DataFrame:
    """Per-vector semantic-dedup decision table:
    (vec_id, cluster_id, status, dup_of, max_cosine).

    status = 'drop_semantic' when a better-centroid-ranked cluster member
    sits within the cosine threshold; dup_of = the best-ranked such
    member (NULL on keep); max_cosine = the strongest in-cluster
    similarity to a better-ranked member (NULL on keep). ``k=None``
    derives K from corpus size (SEM_CLUSTER_TARGET members per cluster)
    — one bounded count() — so cluster sizes stay flat as the corpus
    grows."""
    if k is None:
        k = max(KM_K, emb.count() // SEM_CLUSTER_TARGET)
    assigned = kmeans_assignments(emb, k)
    rank_w = Window.partitionBy("cid").orderBy("dist", "vec_id")
    # hoist each vector's norm out of the pair stage (the round-5
    # embedding-dedup lesson): dot/(na*nb) with per-vector norms is the
    # SAME operand tree as cosine_sim per pair, at one array walk instead
    # of three
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("e"), lambda x: (x * x).cast("double")),
            F.lit(0.0), lambda acc, v: acc + v,
        )
    )
    ranked = assigned.withColumn("rk", F.row_number().over(rank_w)) \
        .withColumn("_n", norm)
    # the cluster working set feeds both self-join sides and the final
    # spine — materialize it once (same shared-working-set rule as every
    # band join)
    ranked = ranked.localCheckpoint(eager=True)
    a = ranked.select(F.col("cid").alias("cid_a"), F.col("vec_id").alias("dom"),
                      F.col("e").alias("ea"), F.col("_n").alias("_na"),
                      F.col("rk").alias("rk_a"))
    b = ranked.select(F.col("cid").alias("cid_b"), F.col("vec_id").alias("vid"),
                      F.col("e").alias("eb"), F.col("_n").alias("_nb"),
                      F.col("rk").alias("rk_b"))
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: (x * y).cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    cos = F.round(dot / (F.col("_na") * F.col("_nb")), 4)
    dominated = (
        a.join(b, (F.col("cid_a") == F.col("cid_b"))
               & (F.col("rk_a") < F.col("rk_b")))
        .select("vid", "dom", "rk_a", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .groupBy("vid")
        .agg(
            F.max("cosine").alias("max_cosine"),
            F.min(F.struct("rk_a", "dom")).alias("best"),
        )
        .select("vid", F.col("best.dom").alias("dup_of"), "max_cosine")
    )
    return (
        ranked.select("vec_id", F.col("cid").alias("cluster_id"))
        .join(dominated, F.col("vec_id") == F.col("vid"), "left")
        .select(
            "vec_id", "cluster_id",
            F.when(F.col("dup_of").isNotNull(), F.lit("drop_semantic"))
            .otherwise(F.lit("keep")).alias("status"),
            "dup_of", "max_cosine",
        )
    )


def _semantic_dedup_oracle_sql() -> str:
    k_expr = f"greatest({KM_K}, n_all // {SEM_CLUSTER_TARGET})"
    return f"""
    WITH {kmeans_cte_chain(k_expr)},
    ranked AS (
      SELECT vec_id, e, cid,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rk
      FROM a2
    ),
    pairs AS (
      SELECT b.vec_id AS vid, a.vec_id AS dom, a.rk AS rk_a,
             ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
      FROM ranked a JOIN ranked b
        ON a.cid = b.cid AND a.rk < b.rk
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= {SEM_THRESHOLD}
    ),
    dom2 AS (
      SELECT vid,
             MAX(cosine) AS max_cosine,
             arg_min(dom, rk_a) AS dup_of
      FROM pairs GROUP BY vid
    )
    SELECT r.vec_id, r.cid AS cluster_id,
           CASE WHEN d.dup_of IS NOT NULL THEN 'drop_semantic'
                ELSE 'keep' END AS status,
           d.dup_of, d.max_cosine
    FROM ranked r LEFT JOIN dom2 d ON d.vid = r.vec_id
    ORDER BY r.vec_id
    """


@register(
    "semantic_dedup",
    oracle=_semantic_dedup_oracle_sql(),
    doc=f"SemDeDup (Abbas et al. 2023): k-means partition (K = "
    f"max({KM_K}, n/{SEM_CLUSTER_TARGET}) — cluster size capped as the "
    "corpus grows; deterministic Lloyd assignment shared with "
    f"kmeans_embedding_clusters) then cosine >= {SEM_THRESHOLD} pruning "
    "WITHIN clusters — the capped clustering keeps the pair search "
    "~linear in corpus size; each dropped vector records its "
    "best-centroid-ranked dominator and max cosine.",
)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    return semantic_dedup(emb).orderBy("vec_id")

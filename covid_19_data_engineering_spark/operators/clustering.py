"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise dedup (MinHash LSH / SimHash / n-gram Jaccard in operators/dedup.py)
emits edges; a training-data pipeline needs *clusters* — if A~B and B~C, all
three are one duplicate group and one canonical survivor should be kept even
though (A,C) was never emitted as a pair. That transitive closure is connected
components, an inherently iterative algorithm (no single SQL/DataFrame plan
expresses it — SURVEY.md §2's "non-SQL-expressible" tier, driver rows-only
check).

Algorithm: iterated min-label propagation. Each node starts labeled with its
own id; each round every node takes the min label in its neighborhood
(including itself); converged when no label changes. Rounds needed ≈ graph
diameter; dedup-cluster diameters are tiny (chains of near-identical docs), so
the loop exits in a handful of rounds. This is the simple variant of the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14), which bounds rounds at
O(log n) for adversarial graphs — swap in if cluster diameters ever grow.

100 TB posture:
- each round is one shuffle keyed on node id (groupBy min) plus one broadcast-
  or shuffle-join of the label table against edges; edge and label tables are
  O(dup pairs) and O(docs) — tiny next to the corpus;
- the label table is eagerly localCheckpoint()ed every round. This is load-
  bearing, not a nicety: each round's plan references the previous labels
  twice (the neighborhood join and the outer merge), so without truncation
  the logical plan doubles per round — Catalyst analysis goes exponential
  long before the data does. On a cluster with executor loss concerns, swap
  for reliable checkpoint(): same truncation, HDFS-backed;
- convergence is checked with a cheap count of changed labels (an agg, not a
  collect of the table).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.dedup import (
    minhash_agree_sql,
    minhash_lsh_candidates,
    minhash_pipeline_ctes,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def connected_components(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                         max_iter: int = 20) -> DataFrame:
    """Resolve undirected edges into components.

    Returns ``(node, component)`` where component is the min node id reachable
    from ``node``. Isolated endpoints appear (every node in ``edges`` is
    covered); nodes absent from ``edges`` are their own singleton components
    and are left to the caller (a left join + coalesce against the corpus).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min label over the neighborhood: neighbors' labels ∪ own label
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(sym["u"].alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.col("nbr_component")).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("changed"),
            )
            .localCheckpoint(eager=True)  # truncate lineage — see module doc
        )
        changed = new_labels.where(F.col("changed")).limit(1).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


def duplicate_clusters(docs: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Full dedup-cluster pass: LSH candidate pairs above ``threshold`` →
    connected components → every document labeled with its cluster id (its
    own id when it has no near-dup). Keep ``doc_id == cluster`` rows for the
    canonical-survivor corpus."""
    pairs = minhash_lsh_candidates(docs).where(F.col("est_jaccard") >= threshold)
    comps = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comps, docs["doc_id"] == comps["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
        )
    )


def _components_oracle_sql() -> str:
    """Transitive closure as a recursive CTE over the minhash-candidate
    edges (whose SQL twin lives in operators/dedup.py): reach(node, comp)
    saturates, component = MIN(reachable id). The Spark side stays iterative
    (a recursive CTE over 100 TB of edges is not a plan; label propagation
    with bounded rounds is) — the oracle only needs to agree on the answer."""
    return f"""
    WITH RECURSIVE {minhash_pipeline_ctes()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE ROUND(CAST({minhash_agree_sql()} AS DOUBLE) / 32, 4) >= 0.3
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.comp FROM sym s JOIN reach r ON s.v = r.node
    ),
    comp AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
    SELECT component AS cluster, COUNT(*) AS cluster_size
    FROM comp GROUP BY component HAVING COUNT(*) > 1
    ORDER BY cluster
    """


@register(
    "dedup_cluster_components",
    oracle=_components_oracle_sql(),
    doc="Connected components over MinHash-LSH near-dup pairs: transitive "
    "duplicate clusters with min-doc_id canonical labels (iterative "
    "min-label propagation, persisted per round). Oracle: the same edges "
    "via the minhash SQL twin + a recursive-CTE transitive closure.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        duplicate_clusters(docs)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .where(F.col("cluster_size") > 1)
        .orderBy("cluster")
    )


def _representatives_oracle_sql() -> str:
    """Same recursive-CTE closure as the components oracle, then the
    canonical pick: highest quality score in the cluster, min doc_id on
    ties (the deterministic tiebreak matters — quality scores quantize to
    4 decimals and collide often)."""
    from covid_19_data_engineering_spark.operators.textstats import quality_score_sql

    return f"""
    WITH RECURSIVE {minhash_pipeline_ctes()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE ROUND(CAST({minhash_agree_sql()} AS DOUBLE) / 32, 4) >= 0.3
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.comp FROM sym s JOIN reach r ON s.v = r.node
    ),
    comp AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node),
    scored AS (
      SELECT c.component AS cluster, d.doc_id,
             {quality_score_sql()} AS quality
      FROM comp c JOIN documents d ON d.doc_id = c.node
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster ORDER BY quality DESC, doc_id
      ) AS rn,
      COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
      FROM scored
    )
    SELECT cluster, doc_id AS keep_doc, quality AS keep_quality, cluster_size
    FROM ranked WHERE rn = 1 AND cluster_size > 1
    ORDER BY cluster
    """


@register(
    "dedup_cluster_representatives",
    oracle=_representatives_oracle_sql(),
    doc="Canonical-survivor selection per duplicate cluster: connected "
    "components over MinHash-LSH pairs, then keep the HIGHEST-quality doc "
    "per cluster (min doc_id tiebreak) instead of the naive min-id. This is "
    "the curation-correct dedup: near-dup groups usually contain one clean "
    "copy and several boilerplate-wrapped ones, and min-id keeps an "
    "arbitrary one. Same iterative closure as dedup_cluster_components; "
    "the quality join adds one broadcast-sized label join, and the "
    "representative pick is a window over O(clustered docs) rows.",
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from covid_19_data_engineering_spark.operators.textstats import quality_score_col

    docs = load_table(spark, "documents", sf_dir)
    clusters = duplicate_clusters(docs)
    scored = clusters.join(
        docs.select("doc_id", quality_score_col(F.col("text")).alias("quality")),
        "doc_id",
    )
    w = Window.partitionBy("cluster")
    rank_w = Window.partitionBy("cluster").orderBy(F.col("quality").desc(), "doc_id")
    return (
        scored.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(rank_w))
        .where((F.col("rn") == 1) & (F.col("cluster_size") > 1))
        .select(
            "cluster",
            F.col("doc_id").alias("keep_doc"),
            F.col("quality").alias("keep_quality"),
            "cluster_size",
        )
        .orderBy("cluster")
    )


def retention_manifest(docs: DataFrame, threshold: float = 0.3) -> DataFrame:
    """End-to-end dedup DECISION table — the artifact a curation run
    actually ships: every doc_id mapped to keep / drop_exact /
    drop_near_dup plus the doc retained in its place.

    Precedence: exact-content duplicates (normalized-text md5) drop first,
    keeping the min doc_id per fingerprint; then near-dup clusters
    (MinHash-LSH -> connected components) drop everything but the
    highest-quality representative. The representative is provably always
    exact-canonical (exact copies share quality and cluster, so the
    min-id-on-quality-tie pick lands on the fingerprint's min id), so the
    two rules never orphan a cluster.

    100 TB posture: fingerprint dedup is one shuffle on a uniform md5 key;
    the cluster stage reuses the bounded-round component labels; the final
    assembly is equi-joins on doc_id/cluster (no new shuffle families).
    """
    from covid_19_data_engineering_spark.operators.textstats import (
        fingerprint_col,
        quality_score_col,
    )
    from pyspark.sql import Window

    # the only text-reading pass this function adds (duplicate_clusters owns
    # the other); checkpoint the 3-column result so the exact/ranked/manifest
    # branches never re-read document text
    base = docs.select(
        "doc_id",
        fingerprint_col(F.col("text")).alias("fp"),
        quality_score_col(F.col("text")).alias("quality"),
    ).localCheckpoint(eager=True)
    exact = base.groupBy("fp").agg(F.min("doc_id").alias("exact_canon"))
    clusters = duplicate_clusters(docs)
    rank_w = Window.partitionBy("cluster").orderBy(F.col("quality").desc(), "doc_id")
    size_w = Window.partitionBy("cluster")
    ranked = (
        clusters.join(base, "doc_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(size_w))
        .withColumn("rn", F.row_number().over(rank_w))
    )
    reps = ranked.where(F.col("rn") == 1).select(
        "cluster", F.col("doc_id").alias("rep_doc")
    )
    return (
        ranked.join(exact, "fp")
        .join(reps, "cluster")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("exact_canon"), F.lit("drop_exact"))
            .when(
                (F.col("cluster_size") > 1) & (F.col("doc_id") != F.col("rep_doc")),
                F.lit("drop_near_dup"),
            )
            .otherwise(F.lit("keep"))
            .alias("status"),
            F.when(F.col("doc_id") != F.col("exact_canon"), F.col("exact_canon"))
            .when(
                (F.col("cluster_size") > 1) & (F.col("doc_id") != F.col("rep_doc")),
                F.col("rep_doc"),
            )
            .otherwise(F.col("doc_id"))
            .alias("ref_doc"),
        )
    )


def _retention_manifest_oracle_sql() -> str:
    from covid_19_data_engineering_spark.operators.textstats import quality_score_sql

    return f"""
    WITH RECURSIVE {minhash_pipeline_ctes()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE ROUND(CAST({minhash_agree_sql()} AS DOUBLE) / 32, 4) >= 0.3
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.comp FROM sym s JOIN reach r ON s.v = r.node
    ),
    comp AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node),
    base AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             {quality_score_sql()} AS quality
      FROM documents
    ),
    exact AS (SELECT fp, MIN(doc_id) AS exact_canon FROM base GROUP BY fp),
    clusters AS (
      SELECT b.doc_id, COALESCE(c.component, b.doc_id) AS cluster
      FROM base b LEFT JOIN comp c ON c.node = b.doc_id
    ),
    ranked AS (
      SELECT cl.cluster, cl.doc_id, b.fp, b.quality,
             ROW_NUMBER() OVER (PARTITION BY cl.cluster
                                ORDER BY b.quality DESC, cl.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cl.cluster) AS cluster_size
      FROM clusters cl JOIN base b USING (doc_id)
    ),
    reps AS (SELECT cluster, doc_id AS rep_doc FROM ranked WHERE rn = 1)
    SELECT r.doc_id,
           CASE WHEN r.doc_id != e.exact_canon THEN 'drop_exact'
                WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc THEN 'drop_near_dup'
                ELSE 'keep' END AS status,
           CASE WHEN r.doc_id != e.exact_canon THEN e.exact_canon
                WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc THEN p.rep_doc
                ELSE r.doc_id END AS ref_doc
    FROM ranked r
    JOIN exact e USING (fp)
    JOIN reps p USING (cluster)
    ORDER BY r.doc_id
    """


@register(
    "dedup_retention_manifest",
    oracle=_retention_manifest_oracle_sql(),
    doc="The shippable dedup decision table: every document marked keep / "
    "drop_exact / drop_near_dup with the surviving doc it defers to. "
    "Composes fingerprint dedup (one md5-keyed shuffle), MinHash-LSH "
    "connected components, and quality-ranked representative selection "
    "into one manifest — what an incremental curation run joins against "
    "before admitting new data.",
)
def dedup_retention_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return retention_manifest(docs).orderBy("doc_id")

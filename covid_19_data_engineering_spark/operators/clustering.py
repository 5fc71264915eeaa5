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
    _minhash_rep_pairs,
    minhash_agree_sql,
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


def duplicate_clusters(docs: DataFrame, threshold: float = 0.3,
                       rep_state: tuple[DataFrame, DataFrame] | None = None) -> DataFrame:
    """Full dedup-cluster pass: LSH candidate pairs above ``threshold`` →
    connected components → every document labeled with its cluster id (its
    own id when it has no near-dup). Keep ``doc_id == cluster`` rows for the
    canonical-survivor corpus.

    The component iteration runs over REPRESENTATIVE pairs only (one node
    per exact text — the round-3 hot-bucket fix): exact copies are by
    definition in their representative's component, so the label table the
    loop shuffles each round is O(content-distinct docs), never inflated by
    boilerplate dup sets. Members inherit their representative's component
    afterwards via one equi-join. Labels are unchanged from the naive
    expanded-graph formulation: the representative is the min key of its
    group, so the min reachable representative IS the min reachable member.

    ``rep_state``: optionally inject precomputed ``(rep_pairs, members)``
    so a composition (the incremental manifest) shares one collapse+bands
    working set across stages instead of re-deriving signatures.
    """
    rep_pairs, members = rep_state if rep_state is not None else _minhash_rep_pairs(docs)
    pairs = rep_pairs.where(F.col("est_jaccard") >= threshold)
    comps = connected_components(pairs, src="rep_a", dst="rep_b")
    rep_cluster = (
        members.select(F.col("rep").alias("node_rep")).distinct()
        .join(comps, F.col("node_rep") == F.col("node"), "left")
        .select(
            F.col("node_rep"),
            F.coalesce(F.col("component"), F.col("node_rep")).alias("cluster"),
        )
    )
    return (
        docs.select("doc_id")
        .join(members.select("doc_id", "rep"), "doc_id", "left")
        .join(rep_cluster, F.col("rep") == F.col("node_rep"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"),
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


def retention_manifest(docs: DataFrame, threshold: float = 0.3,
                       rep_state: tuple[DataFrame, DataFrame] | None = None) -> DataFrame:
    """End-to-end dedup DECISION table — the artifact a curation run
    actually ships: every doc_id mapped to keep / drop_exact /
    drop_near_dup plus the doc retained in its place.

    Precedence: exact-content duplicates (normalized-text md5) drop first,
    keeping the min doc_id per fingerprint; then near-dup clusters
    (MinHash-LSH -> connected components) drop everything but the
    highest-quality representative.

    ``ref_doc`` INVARIANT (round-3 ADVICE): every ref_doc lands on a row
    whose own status is 'keep'. Two rules enforce it:
    - the cluster representative is ranked among the cluster's EXACT
      CANONICALS only (doc_id == exact_canon). The normalized fingerprint is
      case/whitespace-insensitive while quality reads raw text, so an
      unrestricted rank could crown a doc that is itself drop_exact;
    - drop_exact rows resolve the ref CHAIN: their fingerprint's canonical
      may itself be drop_near_dup (its cluster kept a different
      fingerprint's canonical), in which case the member defers to the
      canonical's representative. Chains have depth <= 2 by construction
      (member -> canonical -> representative, and representatives are
      always canonical and kept), so one extra equi-join on exact_canon
      resolves everything — no iteration.

    100 TB posture: fingerprint dedup is one shuffle on a uniform md5 key;
    the cluster stage reuses the bounded-round component labels; the final
    assembly is equi-joins on doc_id/cluster/exact_canon (no new shuffle
    families).
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
    clusters = duplicate_clusters(docs, threshold, rep_state)
    rank_w = Window.partitionBy("cluster").orderBy(F.col("quality").desc(), "doc_id")
    size_w = Window.partitionBy("cluster")
    ranked = (
        clusters.join(base, "doc_id")
        .join(exact, "fp")
        .withColumn("cluster_size", F.count(F.lit(1)).over(size_w))
    )
    # representative rank runs over exact canonicals ONLY — see docstring
    reps = (
        ranked.where(F.col("doc_id") == F.col("exact_canon"))
        .withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") == 1)
        .select("cluster", F.col("doc_id").alias("rep_doc"))
    )
    with_rep = ranked.join(reps, "cluster")
    # each canonical's own final ref (itself, or its cluster's rep when the
    # cluster kept a different fingerprint's canonical) — drop_exact members
    # defer to THIS, resolving the depth-2 ref chain in one equi-join
    canon_ref = with_rep.where(F.col("doc_id") == F.col("exact_canon")).select(
        F.col("doc_id").alias("_canon"),
        F.when(
            (F.col("cluster_size") > 1) & (F.col("doc_id") != F.col("rep_doc")),
            F.col("rep_doc"),
        )
        .otherwise(F.col("doc_id"))
        .alias("_canon_ref"),
    )
    return (
        with_rep.join(canon_ref, F.col("exact_canon") == F.col("_canon"))
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("exact_canon"), F.lit("drop_exact"))
            .when(
                (F.col("cluster_size") > 1) & (F.col("doc_id") != F.col("rep_doc")),
                F.lit("drop_near_dup"),
            )
            .otherwise(F.lit("keep"))
            .alias("status"),
            F.when(F.col("doc_id") != F.col("exact_canon"), F.col("_canon_ref"))
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
      SELECT cl.cluster, cl.doc_id, b.fp, b.quality, e.exact_canon,
             COUNT(*) OVER (PARTITION BY cl.cluster) AS cluster_size
      FROM clusters cl JOIN base b USING (doc_id) JOIN exact e USING (fp)
    ),
    -- representative rank over exact canonicals ONLY (mirrors the engine):
    -- an unrestricted quality rank can pick a doc itself marked drop_exact
    canon_ranked AS (
      SELECT cluster, doc_id,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY quality DESC, doc_id) AS rn
      FROM ranked WHERE doc_id = exact_canon
    ),
    reps AS (SELECT cluster, doc_id AS rep_doc FROM canon_ranked WHERE rn = 1),
    -- each canonical's own final ref: drop_exact members defer to this,
    -- resolving the depth-2 ref chain (member -> canonical -> rep)
    canon_ref AS (
      SELECT r.doc_id AS canon,
             CASE WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc
                  THEN p.rep_doc ELSE r.doc_id END AS canon_ref
      FROM ranked r JOIN reps p USING (cluster)
      WHERE r.doc_id = r.exact_canon
    )
    SELECT r.doc_id,
           CASE WHEN r.doc_id != r.exact_canon THEN 'drop_exact'
                WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc THEN 'drop_near_dup'
                ELSE 'keep' END AS status,
           CASE WHEN r.doc_id != r.exact_canon THEN c.canon_ref
                WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc THEN p.rep_doc
                ELSE r.doc_id END AS ref_doc
    FROM ranked r
    JOIN reps p USING (cluster)
    JOIN canon_ref c ON c.canon = r.exact_canon
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


# --- incremental retention manifest (round-4) --------------------------------

_INCR_SPLIT = 250  # doc_id < split plays the frozen snapshot (same convention
# as cross_snapshot_dedup); >= split is the arriving batch


def incremental_retention_manifest(new: DataFrame, snapshot: DataFrame,
                                   threshold: float = 0.3) -> DataFrame:
    """Admission decisions for a NEW batch against a frozen corpus — the
    incremental composition of ``cross_snapshot_near_dups`` and
    ``retention_manifest``. Snapshot decisions are never revisited
    (append-only manifests); the expensive machinery runs on batch-sized
    inputs only:

    - the snapshot manifest is (re)used as the resolver mapping every
      snapshot doc to its final 'keep' row (in production it is a stored
      table; here it is recomputed from the snapshot frame);
    - batch-internal near-dup edges come from the exact-collapsed rep band
      self-join (O(batch) rows); batch-to-snapshot edges from the two-sided
      band join (O(batch x collisions) — the corpus never self-joins);
    - connected components run over the BATCH graph (batch reps + only the
      snapshot docs they collide with) — never over the corpus. Snapshot-
      to-snapshot edges are deliberately absent: the frozen side must not
      re-cluster, so two batch docs merge only through batch/cross paths.

    Decision order per new doc (exact beats near, snapshot beats batch):
    1. normalized fp matches a snapshot fp -> drop_exact, ref = the
       snapshot canon's final keep row (via the snapshot manifest);
    2. batch-internal exact dup (doc != batch canon) -> drop_exact, ref =
       its canon's own final ref (depth-2 chain, as in retention_manifest);
    3. component contains a snapshot anchor -> drop_near_dup, ref = the
       min-id anchor's final keep row;
    4. component keeps its highest-quality batch canonical (min-id tie);
       everyone else drops to it;
    5. otherwise keep.
    The ref invariant holds: every ref_doc resolves to a 'keep' row (of
    the snapshot manifest or of this batch output).
    """
    from covid_19_data_engineering_spark.operators.dedup import (
        band_self_pairs,
        exact_text_collapse,
        minhash_agreement,
        minhash_bands,
    )
    from covid_19_data_engineering_spark.operators.textstats import (
        fingerprint_col,
        quality_score_col,
    )
    from pyspark.sql import Window

    # ONE collapse + ONE band checkpoint per side, shared by every stage
    # (the snapshot manifest, the batch self-join, and the cross join) —
    # composing via the standalone operators re-derived each working set
    # once per stage (~2x the whole query's cost at bench scale)
    s_reps, s_members = exact_text_collapse(snapshot)
    s_bands = minhash_bands(s_reps).localCheckpoint(eager=True)
    n_reps, n_members = exact_text_collapse(new)
    n_bands = minhash_bands(n_reps).localCheckpoint(eager=True)

    snap_resolve = retention_manifest(
        snapshot, threshold, rep_state=(band_self_pairs(s_bands), s_members)
    ).select(F.col("doc_id").alias("_sid"), F.col("ref_doc").alias("_sref"))
    base = new.select(
        "doc_id",
        fingerprint_col(F.col("text")).alias("fp"),
        quality_score_col(F.col("text")).alias("quality"),
    ).localCheckpoint(eager=True)
    exact = base.groupBy("fp").agg(F.min("doc_id").alias("batch_canon"))
    snap_fp = (
        snapshot.select(fingerprint_col(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("snap_canon"))
    )

    rep_pairs, members = band_self_pairs(n_bands), n_members
    batch_edges = rep_pairs.where(F.col("est_jaccard") >= threshold).select(
        "rep_a", "rep_b"
    )
    # cross edges at rep level: new-rep bands x snapshot-rep bands; exact-dup
    # members on BOTH sides are represented by their reps, and expansion is
    # unnecessary here because the component closure + member maps recover
    # membership (snapshot rep stands for every snapshot doc in its group —
    # the anchor join below resolves through the snapshot manifest anyway)
    cross_edges = (
        n_bands.alias("n")
        .join(
            s_bands.alias("s"),
            (F.col("n.band") == F.col("s.band")) & (F.col("n.bucket") == F.col("s.bucket")),
        )
        .select(
            F.col("n.doc_id").alias("rep_a"),
            F.col("s.doc_id").alias("rep_b"),
            minhash_agreement(F.col("n.sig"), F.col("s.sig")).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("rep_a", "rep_b")
        .distinct()
    )
    comps = connected_components(
        batch_edges.unionByName(cross_edges), src="rep_a", dst="rep_b"
    )
    # anchor = membership in the snapshot frame (NOT an id-range test — the
    # registered query's 250-split is a harness convention, the library
    # works for arbitrary key spaces)
    anchored = (
        comps.join(snapshot.select(F.col("doc_id").alias("node")), "node")
        .groupBy("component")
        .agg(F.min("node").alias("anchor"))
    )
    doc_comp = (
        base.select("doc_id")
        .join(members.select("doc_id", "rep"), "doc_id", "left")
        .join(comps, F.col("rep") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("component", "rep", "doc_id").alias("comp"),
        )
    )

    scored = (
        doc_comp.join(base, "doc_id")
        .join(exact, "fp")
        .join(snap_fp.withColumnRenamed("snap_canon", "snap_canon"), "fp", "left")
        .join(anchored.withColumnRenamed("component", "comp"), "comp", "left")
    ).localCheckpoint(eager=True)
    # ^ three consumers (rep ranking, canon decisions, member expansion)
    # would each re-execute the whole five-way join tree without this
    canon_rows = scored.where(F.col("doc_id") == F.col("batch_canon"))
    rank_w = Window.partitionBy("comp").orderBy(F.col("quality").desc(), "doc_id")
    reps = (
        canon_rows.where(F.col("snap_canon").isNull())
        .withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") == 1)
        .select("comp", F.col("doc_id").alias("rep_doc"))
    )
    canon_dec = (
        canon_rows.join(reps, "comp", "left")
        .join(snap_resolve.withColumnRenamed("_sid", "snap_canon"), "snap_canon", "left")
        .withColumnRenamed("_sref", "_snap_exact_ref")
        .join(snap_resolve.withColumnRenamed("_sid", "anchor"), "anchor", "left")
        .withColumnRenamed("_sref", "_anchor_ref")
        .select(
            F.col("doc_id").alias("canon"),
            F.when(F.col("snap_canon").isNotNull(), F.lit("drop_exact"))
            .when(F.col("anchor").isNotNull(), F.lit("drop_near_dup"))
            .when(F.col("rep_doc") != F.col("doc_id"), F.lit("drop_near_dup"))
            .otherwise(F.lit("keep"))
            .alias("status"),
            F.when(F.col("snap_canon").isNotNull(), F.col("_snap_exact_ref"))
            .when(F.col("anchor").isNotNull(), F.col("_anchor_ref"))
            .when(F.col("rep_doc") != F.col("doc_id"), F.col("rep_doc"))
            .otherwise(F.col("doc_id"))
            .alias("ref_doc"),
        )
    )
    canon_final = canon_dec.select("canon", F.col("ref_doc").alias("_canon_ref"))
    out_canon = canon_dec.select(
        F.col("canon").alias("doc_id"), "status", "ref_doc"
    )
    # scored carries every base row with its batch_canon — the member
    # expansion reads the checkpoint instead of re-joining base with exact
    out_members = (
        scored.where(F.col("doc_id") != F.col("batch_canon"))
        .join(canon_final, F.col("batch_canon") == F.col("canon"))
        .select("doc_id", F.lit("drop_exact").alias("status"),
                F.col("_canon_ref").alias("ref_doc"))
    )
    return out_canon.unionByName(out_members)


def _incremental_manifest_oracle_sql() -> str:
    """Full SQL replication: the snapshot-side retention manifest (filtered
    to doc_id < split) feeds the resolver; the batch graph closure runs over
    band pairs whose GREATER endpoint is in the batch — which admits
    batch-batch and batch-snapshot edges and excludes snapshot-snapshot
    edges exactly like the engine (the frozen side must not re-cluster)."""
    from covid_19_data_engineering_spark.operators.textstats import quality_score_sql

    agree = minhash_agree_sql()
    split = _INCR_SPLIT
    norm_fp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return f"""
    WITH RECURSIVE {minhash_pipeline_ctes()},
    -- ONE band self-join for the whole oracle (MATERIALIZED: the snapshot
    -- closure, batch closure, and both pair filters all read it; without
    -- the hint DuckDB inlines the expensive join once per reference)
    all_pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE ROUND(CAST({agree} AS DOUBLE) / 32, 4) >= 0.3
    ),
    s_pairs AS (SELECT doc_a, doc_b FROM all_pairs WHERE doc_b < {split}),
    s_sym AS (
      SELECT doc_a AS u, doc_b AS v FROM s_pairs
      UNION SELECT doc_b, doc_a FROM s_pairs
    ),
    s_reach(node, comp) AS (
      SELECT u, u FROM s_sym
      UNION
      SELECT s.u, r.comp FROM s_sym s JOIN s_reach r ON s.v = r.node
    ),
    s_comp AS (SELECT node, MIN(comp) AS component FROM s_reach GROUP BY node),
    s_base AS (
      SELECT doc_id, {norm_fp} AS fp, {quality_score_sql()} AS quality
      FROM documents WHERE doc_id < {split}
    ),
    s_exact AS (SELECT fp, MIN(doc_id) AS exact_canon FROM s_base GROUP BY fp),
    s_clusters AS (
      SELECT b.doc_id, COALESCE(c.component, b.doc_id) AS cluster
      FROM s_base b LEFT JOIN s_comp c ON c.node = b.doc_id
    ),
    s_ranked AS (
      SELECT cl.cluster, cl.doc_id, b.fp, b.quality, e.exact_canon,
             COUNT(*) OVER (PARTITION BY cl.cluster) AS cluster_size
      FROM s_clusters cl JOIN s_base b USING (doc_id) JOIN s_exact e USING (fp)
    ),
    s_canon_ranked AS (
      SELECT cluster, doc_id,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY quality DESC, doc_id) AS rn
      FROM s_ranked WHERE doc_id = exact_canon
    ),
    s_reps AS (SELECT cluster, doc_id AS rep_doc FROM s_canon_ranked WHERE rn = 1),
    s_canon_ref AS (
      SELECT r.doc_id AS canon,
             CASE WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc
                  THEN p.rep_doc ELSE r.doc_id END AS canon_ref
      FROM s_ranked r JOIN s_reps p USING (cluster)
      WHERE r.doc_id = r.exact_canon
    ),
    s_manifest AS (
      SELECT r.doc_id,
             CASE WHEN r.doc_id != r.exact_canon THEN c.canon_ref
                  WHEN r.cluster_size > 1 AND r.doc_id != p.rep_doc THEN p.rep_doc
                  ELSE r.doc_id END AS ref_doc
      FROM s_ranked r JOIN s_reps p USING (cluster)
      JOIN s_canon_ref c ON c.canon = r.exact_canon
    ),
    g_pairs AS (SELECT doc_a, doc_b FROM all_pairs WHERE doc_b >= {split}),
    g_sym AS (
      SELECT doc_a AS u, doc_b AS v FROM g_pairs
      UNION SELECT doc_b, doc_a FROM g_pairs
    ),
    g_reach(node, comp) AS (
      SELECT u, u FROM g_sym
      UNION
      SELECT s.u, r.comp FROM g_sym s JOIN g_reach r ON s.v = r.node
    ),
    g_comp AS (SELECT node, MIN(comp) AS component FROM g_reach GROUP BY node),
    anchored AS (
      SELECT component, MIN(node) AS anchor
      FROM g_comp WHERE node < {split} GROUP BY component
    ),
    n_base AS (
      SELECT doc_id, {norm_fp} AS fp, {quality_score_sql()} AS quality
      FROM documents WHERE doc_id >= {split}
    ),
    n_exact AS (SELECT fp, MIN(doc_id) AS batch_canon FROM n_base GROUP BY fp),
    doc_comp AS (
      SELECT b.doc_id, COALESCE(c.component, b.doc_id) AS comp
      FROM n_base b LEFT JOIN g_comp c ON c.node = b.doc_id
    ),
    scored AS (
      SELECT dc.doc_id, dc.comp, b.fp, b.quality, e.batch_canon,
             se.exact_canon AS snap_canon, a.anchor
      FROM doc_comp dc
      JOIN n_base b USING (doc_id)
      JOIN n_exact e USING (fp)
      LEFT JOIN s_exact se USING (fp)
      LEFT JOIN anchored a ON a.component = dc.comp
    ),
    canon_rows AS (SELECT * FROM scored WHERE doc_id = batch_canon),
    reps_r AS (
      SELECT comp, doc_id,
             ROW_NUMBER() OVER (PARTITION BY comp
                                ORDER BY quality DESC, doc_id) AS rn
      FROM canon_rows WHERE snap_canon IS NULL
    ),
    comp_reps AS (SELECT comp, doc_id AS rep_doc FROM reps_r WHERE rn = 1),
    canon_dec AS (
      SELECT c.doc_id AS canon,
             CASE WHEN c.snap_canon IS NOT NULL THEN 'drop_exact'
                  WHEN c.anchor IS NOT NULL THEN 'drop_near_dup'
                  WHEN r.rep_doc != c.doc_id THEN 'drop_near_dup'
                  ELSE 'keep' END AS status,
             CASE WHEN c.snap_canon IS NOT NULL THEN sm1.ref_doc
                  WHEN c.anchor IS NOT NULL THEN sm2.ref_doc
                  WHEN r.rep_doc != c.doc_id THEN r.rep_doc
                  ELSE c.doc_id END AS ref_doc
      FROM canon_rows c
      LEFT JOIN comp_reps r ON r.comp = c.comp
      LEFT JOIN s_manifest sm1 ON sm1.doc_id = c.snap_canon
      LEFT JOIN s_manifest sm2 ON sm2.doc_id = c.anchor
    )
    SELECT doc_id, status, ref_doc FROM (
      SELECT canon AS doc_id, status, ref_doc FROM canon_dec
      UNION ALL
      SELECT b.doc_id, 'drop_exact' AS status, cd.ref_doc
      FROM n_base b
      JOIN n_exact e USING (fp)
      JOIN canon_dec cd ON cd.canon = e.batch_canon
      WHERE b.doc_id != e.batch_canon
    ) ORDER BY doc_id
    """


@register(
    "incremental_retention_manifest",
    oracle=_incremental_manifest_oracle_sql(),
    doc="Admission manifest for an arriving batch (doc_id >= 250) against "
    "the frozen snapshot corpus: keep / drop_exact / drop_near_dup with "
    "refs resolved through the snapshot's own manifest — cross-snapshot "
    "band joins + batch-only clustering, the corpus never re-clusters "
    "(incremental composition of cross_snapshot_dedup and "
    "dedup_retention_manifest).",
)
def incremental_retention_manifest_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    snapshot = docs.where(F.col("doc_id") < _INCR_SPLIT)
    new = docs.where(F.col("doc_id") >= _INCR_SPLIT)
    return incremental_retention_manifest(new, snapshot).orderBy("doc_id")

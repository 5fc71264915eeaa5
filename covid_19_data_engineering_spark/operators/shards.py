"""Training-shard manifest: the hand-off artifact from the curation
pipeline to the dataloader fleet.

After curation (quality gate -> dedup -> mixture), a pretraining run
consumes the corpus as N fixed shards with balanced token mass; every
dataloader worker owns shard ids, so the assignment must be stable
across runs and engines — a job for the engine-portable md5 fold
(operators/dedup.py) rather than any engine-native hash.

One map projection (shard id per doc) + one groupBy(shard): the manifest
itself is O(N_SHARDS) rows. At 100 TB the groupBy is the only shuffle
and the map-side combine crushes it to N_SHARDS rows per task. Balance
comes from md5 uniformity — the per-shard token stddev is a few percent
at realistic corpus sizes; the manifest reports per-shard mass precisely
so an unbalanced shard is visible BEFORE a 1000-GPU run starts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.dedup import (
    _HEX_FOLD8,
    _MERSENNE31,
)
from covid_19_data_engineering_spark.operators.textstats import token_count_col
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

N_SHARDS = 16


def shard_manifest(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Per-shard manifest: shard_id, n_docs, n_tokens, min/max doc_id."""
    sh = docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % _MERSENNE31 % n_shards
        ).alias("shard_id"),
    )
    return (
        sh.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


@register(
    "training_shard_manifest",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             {_HEX_FOLD8.format(v="CAST(doc_id AS VARCHAR)")}
               % {_MERSENNE31} % {N_SHARDS} AS shard_id
      FROM documents
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM sh GROUP BY shard_id ORDER BY shard_id
    """,
    doc=f"Dataloader shard manifest: {N_SHARDS} stable shards via the "
    "engine-portable md5 fold on doc_id, with per-shard doc/token mass — "
    "one map projection + one O(N_SHARDS)-row groupBy.",
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return shard_manifest(docs)


# ---------------------------------------------------------- leakage-safe split

# split fractions in integer percent — hashed on the CLUSTER id, so the
# arithmetic replays exactly on both engines
SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5


def leakage_safe_split(docs: DataFrame, threshold: float = 0.3,
                       train_pct: int = SPLIT_TRAIN_PCT,
                       val_pct: int = SPLIT_VAL_PCT) -> DataFrame:
    """(doc_id, cluster, split): train/val/test assignment hashed on the
    NEAR-DUP CLUSTER id, not the document id — every member of a
    duplicate cluster lands in the same split, so near-duplicates can
    never straddle the train/test boundary and leak evaluation data
    into training (the contamination mode a doc-hashed split silently
    allows). cluster = the connected-component label from the
    MinHash-LSH dedup graph (operators/clustering.py), own doc_id for
    singletons; the split hash is the engine-portable md5 fold. Scale
    shape: the component pass is the O(log n)-round label propagation
    already budgeted for dedup; the split itself is one map projection."""
    from covid_19_data_engineering_spark.operators.clustering import (
        duplicate_clusters,
    )

    clustered = duplicate_clusters(docs, threshold)
    bucket = (
        F.conv(F.substring(F.md5(F.col("cluster").cast("string")), 1, 8),
               16, 10).cast("long") % _MERSENNE31 % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return clustered.select("doc_id", "cluster", split.alias("split"))


def _leakage_safe_split_oracle_sql() -> str:
    """Recursive-CTE transitive closure over the minhash candidate edges
    (the components oracle's chain), per-doc cluster labels with
    singleton fallback, then the identical md5-fold split arithmetic."""
    from covid_19_data_engineering_spark.operators.dedup import (
        minhash_agree_sql,
        minhash_pipeline_ctes,
    )

    bucket = (_HEX_FOLD8.format(v="CAST(cluster AS VARCHAR)")
              + f" % {_MERSENNE31} % 100")
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
    doc_cluster AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, cluster,
           CASE WHEN {bucket} < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN {bucket} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM doc_cluster
    ORDER BY doc_id
    """


@register(
    "leakage_safe_split",
    oracle=_leakage_safe_split_oracle_sql(),
    doc=f"Leakage-safe train/val/test split "
    f"({SPLIT_TRAIN_PCT}/{SPLIT_VAL_PCT}/"
    f"{100 - SPLIT_TRAIN_PCT - SPLIT_VAL_PCT}): the split hash keys on "
    "the MinHash-LSH duplicate-cluster label, so near-duplicates never "
    "straddle the train/test boundary — the contamination mode a "
    "doc-hashed split allows. Components via the budgeted label "
    "propagation; the split is one map projection; oracle replays the "
    "closure plus the identical md5-fold arithmetic.",
)
def leakage_safe_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return leakage_safe_split(docs).orderBy("doc_id")

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

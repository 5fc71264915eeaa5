"""Corpus curation pipeline — the composite training-data query.

One declarative plan that chains the extension operators the way a real
pretraining-data pipeline does: quality-score -> language gate -> exact
dedup (keep lowest doc_id per fingerprint) -> per-source yield accounting.
Everything is a single Catalyst plan: the dedup window and the final agg
share the one shuffle family, and no Python runs anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.operators.textstats import (
    fingerprint_col,
    quality_score_col,
    token_count_col,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def curate(docs: DataFrame, min_quality: float = 0.5,
           langs: tuple[str, ...] = ("en", "de", "fr", "es")) -> DataFrame:
    """Filter + dedup a document corpus; returns surviving rows with their
    quality score and token count."""
    text = F.col("text")
    scored = docs.select(
        "doc_id", "lang", "source",
        quality_score_col(text).alias("quality"),
        token_count_col(text).alias("n_tokens"),
        fingerprint_col(text).alias("fp"),
    ).where((F.col("quality") >= min_quality) & F.col("lang").isin(*langs))
    # keep the lowest doc_id per normalized-content fingerprint
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "fp")
    )


@register(
    "corpus_curation_yield",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source,
             ROUND((
               least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
               + (1 - least(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 10, 1.0))
               + least(CAST(len(list_filter(string_split(lower(text), ' '),
                                            t -> t IN ('the','a','and','of','to'))) AS DOUBLE)
                       / greatest(len(string_split(lower(text), ' ')), 1) * 5, 1.0)
             ) / 3, 4) AS quality,
             len(string_split(text, ' ')) AS n_tokens,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored
      WHERE quality >= 0.5 AND lang IN ('en','de','fr','es')
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT source,
           COUNT(*) AS docs_kept,
           -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas renders
           -- as float — the driver would hash 674.0 vs Spark's long 674
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           -- exact integer units of 1e-4, then identical IEEE double ops on
           -- both engines (see streaming/events.py on why ROUND(AVG(..)) of
           -- doubles diverges at half boundaries)
           ROUND(SUM(CAST(round(quality * 10000) AS BIGINT)) * 1.0 / COUNT(*))
             / 10000.0 AS avg_quality
    FROM deduped
    GROUP BY source
    ORDER BY source
    """,
    doc="End-to-end corpus curation: quality gate -> lang gate -> exact "
    "dedup -> per-source token yield. One Catalyst plan, no Python.",
)
def corpus_curation_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    kept = curate(docs)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            (F.round(
                F.sum(F.round(F.col("quality") * 10000).cast("long"))
                / F.count(F.lit(1))
            ) / F.lit(10000.0)).alias("avg_quality"),
        )
        .orderBy("source")
    )


_BATCH_BUDGET_CHARS = 50_000


@register(
    "token_budget_batches",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_chars
      FROM documents
    )
    SELECT source,
           CAST((cum_chars - 1) // {_BATCH_BUDGET_CHARS} AS BIGINT) AS batch_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS batch_chars
    FROM c
    GROUP BY 1, 2
    ORDER BY source, batch_id
    """,
    doc="Training-batch packing manifest: documents packed into ~50k-char "
    "batches per source via a prefix-sum window (the deterministic "
    "streaming-bin-packing approximation). One shuffle on source serves both "
    "the window and the batch aggregate; integer arithmetic end-to-end.",
)
def token_budget_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chars").over(w)
    batch = F.expr(f"CAST((cum_chars - 1) DIV {_BATCH_BUDGET_CHARS} AS BIGINT)")
    return (
        docs.select("source", "doc_id", "n_chars", cum.alias("cum_chars"))
        .withColumn("batch_id", batch)
        .groupBy("source", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("batch_chars"),
        )
        .orderBy("source", "batch_id")
    )


@register(
    "stratified_hash_sample",
    oracle="""
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM (
      SELECT source, doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS bucket
      FROM documents
    )
    WHERE bucket = 0
    GROUP BY source
    ORDER BY source
    """,
    doc="Reproducible ~10% corpus sample: md5-derived bucket per doc_id, keep "
    "bucket 0, account per source. Hash-based (not row-position) sampling is "
    "stable across repartitions, re-runs, and engine versions — the property "
    "a training-data holdout needs; rand()/sample() give none of that. "
    "Embarrassingly parallel: no shuffle before the per-source rollup.",
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    )
    return (
        docs.select("source", "doc_id")
        .where(bucket == 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Per-source (domain) cap — the web-corpus "domain cap" curation standard.
# --------------------------------------------------------------------------

def source_cap(docs: DataFrame, cap: int = 100) -> DataFrame:
    """Keep at most ``cap`` documents per source, chosen by md5(doc_id) rank.

    The hash rank (not doc_id order, not arrival order) makes the kept set a
    uniform random-looking but fully deterministic subset per source —
    re-running on a repartitioned / re-sharded corpus keeps the SAME docs,
    which is what an incremental pretraining pipeline needs when it re-caps
    a domain after a crawl refresh. One shuffle on ``source``; at 100 TB the
    window never materializes more than a partition's rows, and a skewed
    mega-domain splits under AQE skew handling since rank-then-filter
    tolerates partial windows per task only via the shuffle — for truly
    pathological domains, pre-filter with an approximate per-source count.
    """
    rank_key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        docs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= cap)
        .drop("_r")
    )


@register(
    "source_cap_sample",
    oracle="""
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS r
      FROM documents
    )
    WHERE r <= 20
    GROUP BY source
    ORDER BY source
    """,
    doc="Domain-cap curation: keep at most 20 docs per source by "
    "deterministic md5(doc_id) rank, then account the kept set per source. "
    "The cap is the standard defense against a single crawled domain "
    "dominating a pretraining mix; hash-rank selection keeps the same "
    "survivors across re-runs and re-shardings (rand() would not).",
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("source", "doc_id")
    return (
        source_cap(docs, cap=20)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


def _scorecard_oracle_sql() -> str:
    from covid_19_data_engineering_spark.operators.textstats import quality_score_sql

    fp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT {fp}) AS BIGINT) AS distinct_fingerprints,
           ROUND(1.0 - CAST(COUNT(DISTINCT {fp}) AS DOUBLE) / COUNT(*), 4)
             AS exact_dup_rate,
           ROUND(AVG({quality_score_sql()}), 4) AS avg_quality,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """


@register(
    "source_quality_scorecard",
    oracle=_scorecard_oracle_sql(),
    doc="Per-source curation scorecard: volume, exact-dup rate (normalized "
    "fingerprints), mean heuristic quality, and char mass — the table a "
    "data lead reads before weighting sources in the mixture. One scan, "
    "one shuffle on source; the fingerprint distinct is per-group exact "
    "(swap to approx_count_distinct at extreme cardinality).",
)
def source_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_19_data_engineering_spark.operators.textstats import (
        fingerprint_col,
        quality_score_col,
    )

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "source", "n_chars",
            fingerprint_col(F.col("text")).alias("fp"),
            quality_score_col(F.col("text")).alias("q"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("distinct_fingerprints"),
            F.round(
                F.lit(1.0) - F.countDistinct("fp") / F.count(F.lit(1)), 4
            ).alias("exact_dup_rate"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES).
# --------------------------------------------------------------------------

_U_BITS = 52  # md5-derived uniform: 13 hex chars = 52 bits, exact in a double


def weighted_sample_wor(docs: DataFrame, k: int = 64,
                        weight: str = "n_chars") -> DataFrame:
    """Draw ``k`` documents without replacement with probability proportional
    to ``weight``, deterministically (Efraimidis & Spirakis 2006, A-ES).

    Each row gets an exponential key ``-ln(u) / w`` where ``u`` is a
    52-bit uniform derived from md5(doc_id); the k SMALLEST keys are the
    sample. This is the one-pass, merge-friendly formulation: at 100 TB
    every executor keeps a local top-k heap (Spark's TakeOrderedAndProject
    — map-side partial top-k, no global sort, no shuffle of the corpus)
    and only P*k candidate rows reach the driver-side final ordering.
    Hash-derived randomness (not rand()) makes the draw reproducible
    across re-runs, repartitions, and engines — the property a training
    mixture needs for auditability. The uniform is (v+1)/2^52 in (0,1]:
    exact in a double, so Spark and a replay in any IEEE-754 engine pick
    the identical sample.
    """
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(float(2 ** _U_BITS))
    key = -F.log(u) / F.col(weight).cast("double")
    return (
        docs.select(
            "doc_id", "source",
            F.col(weight).cast("long").alias("weight"),
            key.alias("_k"),
        )
        .orderBy("_k", "doc_id")
        .limit(k)
        .select(
            "doc_id", "source", "weight",
            F.round(F.col("_k"), 8).alias("sample_key"),
        )
    )


@register(
    "weighted_sample_wor",
    oracle=f"""
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           ROUND(k, 8) AS sample_key
    FROM (
      SELECT doc_id, source, n_chars,
             -LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
                 / {float(2 ** _U_BITS)!r}) / CAST(n_chars AS DOUBLE) AS k
      FROM documents
    )
    ORDER BY k, doc_id
    LIMIT 64
    """,
    doc="Weighted sampling WITHOUT replacement, probability proportional to "
    "document size (A-ES exponential-key top-k). The distributed form of "
    "'sample 64 docs by byte mass' that a mixture builder runs per source: "
    "deterministic md5-derived uniforms, one map-only key computation, and "
    "a TakeOrderedAndProject top-k instead of any global sort — the corpus "
    "is never shuffled. Oracle replays the identical IEEE key formula.",
)
def weighted_sample_wor_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample_wor(load_table(spark, "documents", sf_dir))

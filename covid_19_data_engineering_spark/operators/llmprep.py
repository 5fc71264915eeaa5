"""Training-data preparation operators over ``documents``: chunking,
benchmark-contamination checks, repetition profiling, cross-snapshot
incremental dedup, and quantile-based quality filtering.

These extend the reference's ETL surface (load_tables_daily.py's
validate-and-promote loop) to the LLM-corpus operations a 100 TB pipeline
needs. Design rules, same as operators/textstats.py:

- pure JVM column expressions wherever the semantics allow (split /
  higher-order array functions / regexp) — per-row work is a narrow map,
  zero shuffles, and scales embarrassingly;
- when a shuffle is required (contamination join, cross-snapshot band
  join), it is equi-keyed on a uniform hash-like key (n-gram text, band
  bucket), never all-pairs;
- every stage is deterministic and engine-portable so the DuckDB oracle
  replays it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.dedup import (
    minhash_agree_sql,
    minhash_agreement,
    minhash_bands,
    minhash_pipeline_ctes,
)
from covid_19_data_engineering_spark.operators.textstats import (
    quality_score_col,
    quality_score_sql,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

# --- fixed-window chunking ---------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(docs: DataFrame, chunk: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the standard pretraining sequence-prep step. One narrow projection +
    posexplode: no shuffle, no Python, output rows ~ n_tokens/stride per
    doc. At 100 TB this is a pure map stage that AQE never has to touch."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... (last window covers the tail)
    n_chunks = (F.floor((F.greatest(n - chunk, F.lit(0)) + stride - 1) / stride) + 1).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    exploded = docs.select(
        "doc_id", F.posexplode(starts).alias("chunk_id", "start"), toks.alias("toks")
    )
    ck = F.slice(F.col("toks"), F.col("start") + 1, chunk)
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(ck).alias("n_tokens"),
        F.array_join(ck, " ").alias("chunk_text"),
    )


@register(
    "doc_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
             list_slice(toks, i * {CHUNK_STRIDE} + 1,
                        i * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS ck
      FROM t, unnest(range(0,
        (greatest(len(toks) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1)
          // {CHUNK_STRIDE} + 1)) AS u(i)
    )
    SELECT doc_id, chunk_id, CAST(len(ck) AS INTEGER) AS n_tokens,
           array_to_string(ck, ' ') AS chunk_text
    FROM c ORDER BY doc_id, chunk_id
    """,
    doc=f"Fixed-window document chunking ({CHUNK_TOKENS}-token windows, "
    f"stride {CHUNK_STRIDE}): pretraining sequence prep as a pure map stage.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")


# --- benchmark contamination -------------------------------------------------

_EVAL_MOD = 50  # doc_id % 50 == 0 plays the held-out benchmark set


def _ngrams_distinct(text: Column, k: int = 3) -> Column:
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )


def contamination_report(corpus: DataFrame, eval_set: DataFrame,
                         k: int = 3) -> DataFrame:
    """Per-corpus-doc n-gram overlap against a benchmark set: the decontam
    step every training pipeline runs before a data release. The eval side
    (benchmarks are tiny) collapses to distinct n-grams and is broadcast;
    the corpus explodes its distinct n-grams once and semi-joins — one
    map-side join, one groupBy on doc_id. No corpus self-join anywhere."""
    eval_grams = (
        eval_set.select(F.explode(_ngrams_distinct(F.col("text"), k)).alias("gram"))
        .distinct()
    )
    corp = corpus.select(
        "doc_id",
        F.size(_ngrams_distinct(F.col("text"), k)).alias("total_ngrams"),
        F.explode(_ngrams_distinct(F.col("text"), k)).alias("gram"),
    )
    hits = (
        corp.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id", "total_ngrams")
        .agg(F.count("*").alias("matched_ngrams"))
    )
    return hits.select(
        "doc_id",
        "total_ngrams",
        "matched_ngrams",
        F.round(F.col("matched_ngrams") / F.col("total_ngrams"), 4).alias("overlap_frac"),
    )


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
             )) AS grams
      FROM documents
    ),
    eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {_EVAL_MOD} = 0),
    cg AS (SELECT doc_id, len(grams) AS total_ngrams, unnest(grams) AS gram
           FROM g WHERE doc_id % {_EVAL_MOD} != 0)
    SELECT doc_id, CAST(total_ngrams AS INTEGER) AS total_ngrams,
           count(*) AS matched_ngrams,
           ROUND(CAST(count(*) AS DOUBLE) / total_ngrams, 4) AS overlap_frac
    FROM cg JOIN eg USING (gram)
    GROUP BY doc_id, total_ngrams
    ORDER BY doc_id
    """,
    doc="Benchmark-contamination check: per-doc distinct 3-gram overlap "
    "fraction against a held-out eval set (doc_id % 50 == 0), eval n-grams "
    "broadcast.",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    eval_set = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    return contamination_report(corpus, eval_set).orderBy("doc_id")


# --- repetition profiling ----------------------------------------------------

_REP_TOP_BIGRAM = 0.10   # most-frequent bigram claims >=10% of all bigrams
_REP_DISTINCT = 0.45     # fewer than 45% of tokens are distinct


def repetition_profile(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals, computed entirely inside one row:
    distinct-token ratio and the mass of the single most frequent bigram.
    Nested higher-order functions keep it a narrow map (docs are bounded
    length; the d*n scan per row is cheap and shuffle-free)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    bg = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    top_count = F.array_max(
        F.transform(F.array_distinct(bg), lambda g: F.size(F.filter(bg, lambda x: x == g)))
    )
    distinct_ratio = F.round(F.size(F.array_distinct(toks)) / n, 4)
    top_frac = F.round(top_count / F.size(bg), 4)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        top_frac.alias("top_bigram_frac"),
        ((top_frac >= _REP_TOP_BIGRAM) | (distinct_ratio <= _REP_DISTINCT)).alias("is_repetitive"),
    )


@register(
    "doc_repetition_profile",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (
      SELECT doc_id, toks,
             list_transform(range(1, greatest(len(toks), 2)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bg
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS distinct_ratio,
           ROUND(CAST(list_max(list_transform(list_distinct(bg),
                   g -> len(list_filter(bg, x -> x = g)))) AS DOUBLE) / len(bg), 4)
             AS top_bigram_frac,
           (ROUND(CAST(list_max(list_transform(list_distinct(bg),
                   g -> len(list_filter(bg, x -> x = g)))) AS DOUBLE) / len(bg), 4)
              >= {_REP_TOP_BIGRAM}
            OR ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
              <= {_REP_DISTINCT}) AS is_repetitive
    FROM b ORDER BY doc_id
    """,
    doc="Gopher-style repetition profile: distinct-token ratio + top-bigram "
    "mass per document, flagged against fixed thresholds. Pure map stage.",
)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return repetition_profile(docs).orderBy("doc_id")


# --- cross-snapshot incremental dedup ----------------------------------------

_SNAPSHOT_SPLIT = 250   # doc_id < split plays the already-ingested snapshot
_XSNAP_THRESHOLD = 0.3


def cross_snapshot_near_dups(new: DataFrame, snapshot: DataFrame,
                             threshold: float = _XSNAP_THRESHOLD) -> DataFrame:
    """New-batch docs that near-duplicate an already-ingested snapshot doc:
    the incremental form of minhash dedup. Each side computes bands
    independently; the join is new-bands x snapshot-bands on (band, bucket)
    — the new batch (small) never self-joins and the historical corpus
    (huge) is touched once. This is the shape that keeps daily ingests
    O(new x collisions) instead of O(corpus^2)."""
    nb = minhash_bands(new).alias("n")
    sb = minhash_bands(snapshot).alias("s")
    return (
        nb.join(
            sb,
            (F.col("n.band") == F.col("s.band")) & (F.col("n.bucket") == F.col("s.bucket")),
        )
        .select(
            F.col("s.doc_id").alias("snapshot_doc_id"),
            F.col("n.doc_id").alias("new_doc_id"),
            minhash_agreement(F.col("n.sig"), F.col("s.sig")).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
    )


@register(
    "cross_snapshot_dedup",
    oracle=f"""
    WITH {minhash_pipeline_ctes()}
    SELECT DISTINCT a.doc_id AS snapshot_doc_id, b.doc_id AS new_doc_id,
           ROUND(CAST({minhash_agree_sql()} AS DOUBLE) / 32, 4) AS est_jaccard
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket
     AND a.doc_id < {_SNAPSHOT_SPLIT} AND b.doc_id >= {_SNAPSHOT_SPLIT}
    WHERE ROUND(CAST({minhash_agree_sql()} AS DOUBLE) / 32, 4) >= {_XSNAP_THRESHOLD}
    ORDER BY snapshot_doc_id, new_doc_id
    """,
    doc="Incremental dedup: new-batch docs (doc_id >= 250) near-duplicating "
    "an already-ingested snapshot doc, via two-sided minhash band join — "
    "the new batch never self-joins and the snapshot is scanned once.",
)
def cross_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    snapshot = docs.where(F.col("doc_id") < _SNAPSHOT_SPLIT)
    new = docs.where(F.col("doc_id") >= _SNAPSHOT_SPLIT)
    return cross_snapshot_near_dups(new, snapshot).orderBy(
        "snapshot_doc_id", "new_doc_id"
    )


# --- quantile quality filter -------------------------------------------------


def quality_quantile_keep(docs: DataFrame, q: float = 0.5) -> DataFrame:
    """Keep documents strictly above their language's quality quantile.
    The per-lang quantile is an exact interpolated percentile over the
    (already ROUNDed) composite score; the tiny per-lang threshold table is
    broadcast back, so the corpus is scanned twice but never shuffled.
    At 100 TB swap percentile for approx_percentile on a sample — the plan
    shape (aggregate to thresholds, broadcast, filter) is unchanged."""
    scored = docs.select("doc_id", "lang", quality_score_col(F.col("text")).alias("quality"))
    med = scored.groupBy("lang").agg(
        F.expr(f"percentile(quality, {q})").alias("q_threshold")
    )
    return (
        scored.join(F.broadcast(med), "lang")
        .where(F.col("quality") > F.col("q_threshold"))
        .select("doc_id", "lang", "quality")
    )


@register(
    "quality_quantile_filter",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang, {quality_score_sql()} AS quality FROM documents
    ),
    m AS (SELECT lang, quantile_cont(quality, 0.5) AS med FROM q GROUP BY lang)
    SELECT q.doc_id, q.lang, q.quality
    FROM q JOIN m USING (lang)
    WHERE q.quality > m.med
    ORDER BY doc_id
    """,
    doc="Per-language quality gate: keep docs strictly above their "
    "language's median composite quality score (exact interpolated "
    "percentile, thresholds broadcast).",
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return quality_quantile_keep(docs).orderBy("doc_id")

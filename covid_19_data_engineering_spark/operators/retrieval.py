"""BM25 full-text retrieval over the documents table.

The retrieval scorer every corpus-curation stack needs (rank documents
against a term query for eval-set mining, topic probes, quality audits).
The reference has no text-query surface at all (SURVEY §2 C-extensions).

Scale shape — two stages, both trivially cluster-parallel:

1. **Corpus statistics in ONE tiny aggregate**: N, total token mass, and
   per-term document frequencies come from a single pass producing ONE row
   (conditional sums), which is then broadcast. No shuffle of the corpus.
2. **Scoring is map-only**: each doc computes its own tf per query term
   (`filter` over its token array) and the BM25 formula against the
   broadcast stats; the only shuffle is the final top-k
   (TakeOrderedAndProject).

Determinism: the per-term contributions are summed in FIXED expression
order (c_t1 + c_t2 + c_t3 — not an unordered SUM over a term table), all
divisions are identically parenthesized in the Spark and DuckDB twins, and
the one transcendental (ln in the idf) matches the pattern already proven
hash-stable by lm_bigram_perplexity (llmprep.py). Final scores ROUND()ed
to 6.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

BM25_TERMS = ("spark", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def bm25_topk(docs: DataFrame, terms: tuple[str, ...] = BM25_TERMS,
              k: int = BM25_TOP) -> DataFrame:
    """Top-k docs by BM25 against a fixed term query."""
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("dl"))
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum(F.array_contains("toks", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    def contrib(i: int, t: str) -> Column:
        tf = F.size(F.filter(F.col("toks"), lambda x: x == F.lit(t))).cast("double")
        df = F.col(f"df_{i}").cast("double")
        n = F.col("n").cast("double")
        avgdl = F.col("sumdl").cast("double") / F.col("n")
        idf = F.log(F.lit(1.0) + (n - df + 0.5) / (df + 0.5))
        denom = tf + BM25_K1 * (1 - BM25_B + BM25_B * (F.col("dl") / avgdl))
        return idf * ((tf * (BM25_K1 + 1)) / denom)

    score = contrib(0, terms[0])
    for i, t in enumerate(terms[1:], start=1):
        score = score + contrib(i, t)
    return (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def _bm25_oracle_sql() -> str:
    dfs = ",\n             ".join(
        f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS df_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    contribs = []
    for i, t in enumerate(BM25_TERMS):
        tf = f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)"
        idf = (f"ln(1.0 + (CAST(n AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
               f" / (CAST(df_{i} AS DOUBLE) + 0.5))")
        denom = (f"({tf} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * "
                 f"(dl / (CAST(sumdl AS DOUBLE) / n))))")
        contribs.append(f"{idf} * (({tf} * ({BM25_K1} + 1)) / {denom})")
    score = " + ".join(contribs)
    return f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
             {dfs}
      FROM base
    )
    SELECT doc_id, dl, bm25 FROM (
      SELECT doc_id, dl, ROUND({score}, 6) AS bm25
      FROM base CROSS JOIN stats
    ) WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP}
    """


@register(
    "bm25_retrieval",
    oracle=_bm25_oracle_sql(),
    doc=f"BM25 top-{BM25_TOP} retrieval for the fixed term query "
    f"{BM25_TERMS}: one-row corpus-stats aggregate broadcast into a "
    "map-only scorer, fixed-order term summation for cross-engine hash "
    "stability, TakeOrderedAndProject top-k.",
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(docs)

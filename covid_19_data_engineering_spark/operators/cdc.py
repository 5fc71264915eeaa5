"""Content-defined chunking (CDC) — shift-resistant chunk-level dedup stats.

Exact dedup (`dedup_exact`) catches identical documents; the span scrubber
(`operators/spans.py`) profiles duplicated n-gram runs; CDC sits between:
split every document into variable-length chunks whose boundaries depend on
CONTENT (a word is a boundary iff its md5-derived hash ≡ 0 mod D), so an
insertion near the head of a document shifts no distant boundary — the
downstream chunks still hash identically and corpus-wide chunk dedup finds
the shared tails. This is the storage-dedup / long-doc-near-dup trick
(Rabin-style anchoring, word-granular) in its Spark-native form:

- chunking is a pure per-row array expression (filter/zip_with over the
  token array) — a MAP with zero Python and zero shuffle;
- the only shuffle is the chunk-hash groupBy, uniform by construction;
- output is an O(1) stats row: chunk dedup ratio and the byte mass a
  chunk-level store would save.

Everything md5-derived => the DuckDB oracle replays boundaries, chunks, and
stats exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.vectors import _spread
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

_ANCHOR_MOD = 8  # expected chunk length ~8 words


def _word_fold(tok: Column) -> Column:
    """32-bit integer from a token's md5 (engine-portable, same idiom as
    operators/dedup.py:_shingle_base_hash)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def cdc_chunks_col(text: Column) -> Column:
    """Array of content-defined chunks of ``text`` (single-space token
    model, matching the repo-wide tokenizer contract).

    ends   = token positions that close a chunk: anchor words
             (hash % D == 0) plus the final position;
    starts = 1, then each previous end + 1;
    chunk  = the tokens of [start..end] re-joined with spaces.
    All row-local array algebra — no explode, no state.
    """
    t = F.split(text, " ")
    ends = F.filter(
        F.sequence(F.lit(1), F.size(t)),
        lambda i: ((_word_fold(F.element_at(t, i)) % _ANCHOR_MOD) == 0)
        | (i == F.size(t)),
    )
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(F.slice(ends, 1, F.size(ends) - 1), lambda e: e + 1),
    )
    return F.zip_with(
        starts, ends, lambda s, e: F.concat_ws(" ", F.slice(t, s, e - s + 1))
    )


def cdc_chunk_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide chunk dedup accounting: how much of the corpus' byte
    mass is duplicated at CDC-chunk granularity, and how hot the hottest
    chunk is. One map (chunking) + one uniform shuffle (chunk groupBy) +
    an O(1) rollup."""
    # _spread: the chunker runs one md5 per TOKEN inside an interpreted
    # higher-order filter — by far the densest CPU-per-byte map in the
    # repo. A local corpus is one parquet split, so without the spread the
    # whole pass runs in a single task (measured ~10s -> ~1.5s at sf0.1);
    # at 100 TB the scan has thousands of splits and _spread no-ops.
    chunks = _spread(docs).select(
        F.explode(cdc_chunks_col(F.col(text_col))).alias("chunk")
    )
    per_chunk = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_chunk.agg(
            F.sum("cnt").alias("total_chunks"),
            F.count(F.lit(1)).alias("distinct_chunks"),
            F.round(
                F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("cnt"), 4
            ).alias("dup_chunk_rate"),
            F.max("cnt").alias("max_chunk_freq"),
            F.sum(F.length("chunk") * F.col("cnt")).alias("chars_total"),
            F.sum(F.length("chunk")).alias("chars_distinct"),
            F.round(
                F.lit(1.0)
                - F.sum(F.length("chunk")).cast("double")
                / F.sum(F.length("chunk") * F.col("cnt")),
                4,
            ).alias("savings_rate"),
        )
    )


@register(
    "cdc_chunk_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    marks AS (
      SELECT doc_id, t,
             list_filter(range(1, len(t) + 1),
               i -> (list_reduce(list_transform(range(1, 9),
                       c -> CAST(strpos('0123456789abcdef',
                                        substr(md5(t[i]), c, 1)) AS BIGINT) - 1),
                       (a, b) -> a * 16 + b) % {_ANCHOR_MOD} = 0)
                    OR i = len(t)) AS ends
      FROM toks
    ),
    spans AS (
      SELECT doc_id, t, ends,
             list_concat([1],
               list_transform(list_slice(ends, 1, len(ends) - 1),
                              e -> e + 1)) AS starts
      FROM marks
    ),
    chunks AS (
      SELECT unnest(list_transform(range(1, len(ends) + 1),
               k -> array_to_string(list_slice(t, starts[k], ends[k]), ' ')))
               AS chunk
      FROM spans
    ),
    per_chunk AS (
      SELECT chunk, COUNT(*) AS cnt FROM chunks GROUP BY chunk
    )
    SELECT CAST(SUM(cnt) AS BIGINT) AS total_chunks,
           CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
           ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 4)
             AS dup_chunk_rate,
           CAST(MAX(cnt) AS BIGINT) AS max_chunk_freq,
           CAST(SUM(len(chunk) * cnt) AS BIGINT) AS chars_total,
           CAST(SUM(len(chunk)) AS BIGINT) AS chars_distinct,
           ROUND(1.0 - CAST(SUM(len(chunk)) AS DOUBLE)
                 / SUM(len(chunk) * cnt), 4) AS savings_rate
    FROM per_chunk
    """,
    doc="Content-defined chunking dedup audit: word-anchored (md5 % 8) "
    "variable chunks, corpus-wide chunk-hash dedup, O(1) stats row "
    "(dedup ratio, hottest chunk, byte savings). Boundaries depend only "
    "on content, so edits shift no distant chunk — the cross-document "
    "shared-tail detector exact doc dedup misses. Map-only chunking, one "
    "uniform shuffle; oracle replays boundaries exactly.",
)
def cdc_chunk_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_chunk_stats(load_table(spark, "documents", sf_dir))

"""Training-sequence packing manifest — where each document lands when the
corpus is concatenated into fixed-length training sequences.

Every LLM training job packs tokenized documents into fixed context
windows (e.g. 2048 tokens), concatenating docs with an EOS separator and
splitting across window boundaries; the packing manifest (which sequences
hold which fragment of which document) is what shard builders, loss-mask
generators, and contamination tracers consume. The reference has no
analogue (SURVEY §2 C-extensions); this is the deterministic, exact
version of that bookkeeping.

Semantics: documents are laid out in doc_id order; each occupies
``n_tokens + 1`` slots (whitespace token count plus one EOS). A doc's
``start_offset`` is the sum of all earlier docs' slot counts; its
fragments span sequences ``start_offset div L`` through
``(start_offset + tok_len - 1) div L``.

Scale shape — the distributed prefix-sum, NOT a global window: a naive
cumulative sum over ``ORDER BY doc_id`` is a single-partition window (one
task sorts the corpus — the classic 100 TB faceplant). The engine instead
buckets docs by ``doc_id div PACK_BUCKET``, takes the within-bucket
cumulative sum under the bucket's own window partition (parallel across
buckets), and adds each bucket's base offset from the tiny per-bucket
totals table (O(n / PACK_BUCKET) rows; its own cumsum is a window over
that small table only, and the join back is a broadcast). Two levels
suffice up to ~10^11 docs; the construction nests for more. The DuckDB
oracle uses the plain single-window cumsum — algebraically identical
prefix sums, so the rows hash-match exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

SEQ_LEN = 2048
PACK_BUCKET = 4096  # docs per prefix-sum bucket


def sequence_packing_manifest(docs: DataFrame, seq_len: int = SEQ_LEN,
                              text_col: str = "text") -> DataFrame:
    """Per-document packing manifest: (doc_id, n_tokens, start_offset,
    seq_first, seq_last, n_fragments)."""
    tok = F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)
    toks = docs.select(
        "doc_id",
        F.size(tok).cast("long").alias("n_tokens"),
        (F.size(tok) + 1).cast("long").alias("tok_len"),
        F.expr(f"doc_id div {PACK_BUCKET}").alias("bkt"),
    )
    # level 1: within-bucket exclusive cumsum, parallel across buckets
    in_bkt = Window.partitionBy("bkt").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    local = toks.withColumn(
        "local_off", F.coalesce(F.sum("tok_len").over(in_bkt), F.lit(0))
    )
    # level 2: per-bucket totals (tiny) -> exclusive cumsum of bucket bases
    bkt_w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        toks.groupBy("bkt").agg(F.sum("tok_len").alias("bkt_total"))
        .withColumn("bkt_base",
                    F.coalesce(F.sum("bkt_total").over(bkt_w), F.lit(0)))
        .select("bkt", "bkt_base")
    )
    off = F.col("bkt_base") + F.col("local_off")
    last = off + F.col("tok_len") - 1
    return (
        local.join(F.broadcast(bases), "bkt")
        .select(
            "doc_id", "n_tokens",
            off.alias("start_offset"),
            last.alias("_last"),
        )
        .select(
            "doc_id", "n_tokens", "start_offset",
            F.expr(f"start_offset div {seq_len}").alias("seq_first"),
            F.expr(f"_last div {seq_len}").alias("seq_last"),
            (F.expr(f"_last div {seq_len}")
             - F.expr(f"start_offset div {seq_len}") + 1).alias("n_fragments"),
        )
    )


def _packing_oracle_sql(seq_len: int = SEQ_LEN) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
                  AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
                  + 1 AS BIGINT) AS tok_len
      FROM documents
    ),
    offs AS (
      SELECT doc_id, n_tokens, tok_len,
             CAST(COALESCE(SUM(tok_len) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_offset
      FROM toks
    )
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {seq_len} AS seq_first,
           (start_offset + tok_len - 1) // {seq_len} AS seq_last,
           (start_offset + tok_len - 1) // {seq_len}
             - start_offset // {seq_len} + 1 AS n_fragments
    FROM offs ORDER BY doc_id
    """


@register(
    "sequence_packing_manifest",
    oracle=_packing_oracle_sql(),
    doc=f"Training-sequence packing manifest: docs concatenated in doc_id "
    f"order (+1 EOS slot each) into {SEQ_LEN}-token windows; per doc the "
    "start offset, first/last sequence, and fragment count. Engine runs a "
    f"two-level distributed prefix-sum (buckets of {PACK_BUCKET} docs, "
    "within-bucket window + broadcast bucket bases) — no single-partition "
    "global window; the oracle's plain cumsum is algebraically identical.",
)
def sequence_packing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return sequence_packing_manifest(docs).orderBy("doc_id")

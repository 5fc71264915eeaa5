"""Rule-based document quality gate with per-rule reasons (Gopher-style,
Rae et al. 2021 §A1.1).

The continuous quality SCORE (textstats.py) ranks documents; production
pipelines additionally run hard RULES — absolute thresholds whose
failures are individually reported so corpus curators can see WHY mass
was dropped (the drop-reason histogram is the first debugging artifact of
any filtering run). Three representative rules, each a pure JVM
expression over the token array:

- ``min_tokens``:   at least MIN_TOKENS tokens;
- ``mean_tok_len``: mean token length inside [MEAN_LEN_LO, MEAN_LEN_HI]
  (garbage/binary spill shifts it out of the band);
- ``top_tok_frac``: the most frequent token may not exceed TOP_FRAC of
  the document (degenerate repetition — the Gopher "repetition" family's
  cheapest member; the windowed variants live in llmprep.py's
  doc_repetition_profile).

Determinism: both ratios are exact fixed-point integers (div, units of
1e-3) — no ROUND(), no decimal half-ties (PERF.md round-4b doctrine).
The top-token count folds over the distinct-token array
(O(distinct x tokens) per row, fine for documents; corpus-frequency
variants belong to the gram-keyed shuffle family). One scan, zero
shuffles for the gate itself; the registered query adds the per-source
drop-reason rollup — the curator's histogram — which shuffles O(sources
x reasons).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

MIN_TOKENS = 20
MEAN_LEN_LO_MILLI = 2000    # mean token length >= 2.0 chars
MEAN_LEN_HI_MILLI = 12000   # <= 12.0 chars
TOP_FRAC_MILLI = 250        # most frequent token <= 25% of the doc


def rule_gate(docs: DataFrame) -> DataFrame:
    """Per-doc rule evaluation. Columns: doc_id, n_tokens,
    mean_len_milli, top_frac_milli, failed (sorted array of rule names),
    keep."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sum_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"), lambda a, v: a + v.cast("long"),
    )
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    # _sumc/_topc computed in a pre-projection so each appears once
    base = (
        docs.select(
            "doc_id", "source", n.alias("n_tokens"),
            sum_chars.alias("_sumc"), top_cnt.cast("long").alias("_topc"),
        )
        .select(
            "doc_id", "source", "n_tokens",
            F.expr("(1000 * _sumc) div n_tokens").alias("mean_len_milli"),
            F.expr("(1000 * _topc) div n_tokens").alias("top_frac_milli"),
        )
    )
    failed = F.array_sort(
        F.filter(
            F.array(
                F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("min_tokens")),
                F.when(
                    (F.col("mean_len_milli") < MEAN_LEN_LO_MILLI)
                    | (F.col("mean_len_milli") > MEAN_LEN_HI_MILLI),
                    F.lit("mean_tok_len"),
                ),
                F.when(F.col("top_frac_milli") > TOP_FRAC_MILLI,
                       F.lit("top_tok_frac")),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return base.select(
        "doc_id", "source", "n_tokens", "mean_len_milli", "top_frac_milli",
        failed.alias("failed"),
        (F.size(failed) == 0).alias("keep"),
    )


@register(
    "gopher_rule_gate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    m AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
             (1000 * list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                                 (a, b) -> a + b)) // len(toks) AS mean_len_milli,
             (1000 * list_max(list_transform(
                list_distinct(toks),
                d -> CAST(len(list_filter(toks, x -> x = d)) AS BIGINT)
              ))) // len(toks) AS top_frac_milli
      FROM t
    ),
    gated AS (
      SELECT doc_id, source, n_tokens, mean_len_milli, top_frac_milli,
             list_sort(list_filter([
               CASE WHEN n_tokens < {MIN_TOKENS} THEN 'min_tokens' END,
               CASE WHEN mean_len_milli < {MEAN_LEN_LO_MILLI}
                      OR mean_len_milli > {MEAN_LEN_HI_MILLI}
                    THEN 'mean_tok_len' END,
               CASE WHEN top_frac_milli > {TOP_FRAC_MILLI}
                    THEN 'top_tok_frac' END
             ], x -> x IS NOT NULL)) AS failed
      FROM m
    )
    SELECT source,
           COALESCE(reason, 'PASS') AS reason,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM gated
    LEFT JOIN LATERAL (SELECT unnest(failed) AS reason) r ON TRUE
    GROUP BY source, COALESCE(reason, 'PASS')
    ORDER BY source, reason
    """,
    doc="Gopher-style hard-rule gate with per-rule drop reasons, rolled up "
    "as the curator's (source, reason) histogram — docs failing several "
    "rules count once per reason; passing docs count under 'PASS'. Exact "
    "fixed-point ratios, one scan, O(sources x reasons) output.",
)
def gopher_rule_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    gated = rule_gate(docs)
    exploded = gated.select(
        "source",
        F.explode(
            F.when(F.size("failed") == 0, F.array(F.lit("PASS")))
            .otherwise(F.col("failed"))
        ).alias("reason"),
    )
    return (
        exploded.groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "reason")
    )

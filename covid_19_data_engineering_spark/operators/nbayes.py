"""Multinomial Naive Bayes over token counts — train a text classifier
distributed, classify map-only, and report the confusion census. The
"can these classes be told apart from bag-of-words?" audit a curation
stack runs before investing in a learned quality/language classifier,
and the simplest member of the train-a-model-in-the-engine family
(beside the nearest-prototype classifier in operators/prototype.py).

Spark-first decomposition — three bounded tables, no iteration:

- the MODEL is two aggregates: per-(label, token) counts and per-label
  token totals, both map-side combined; the vocabulary size closes the
  add-1 smoothing. Model size is O(observed vocab x labels) — broadcast-
  able at any corpus size (vocab grows ~log corpus, Heaps' law).
- SCORING uses the identity
      score(d, l) = ln P(l) + sum_t [ ln(c(t,l)+1) ] - |d| * ln(N_l + V)
  (the -|d| ln(N_l+V) term factors out of the token sum), so UNSEEN
  (token, label) pairs contribute ln(0+1) = 0 and the token join needs
  only OBSERVED pairs — an inner join against the broadcast model,
  never a dense vocab x labels expansion.
- argmax by one max(struct(score, label)) per doc — no window.

Determinism: every ln is computed once, in a double both engines
produce bit-identically (correctly-rounded ln of an exact integer
ratio-free argument), then fixed-pointed to 1e-9 (floor(x*1e9+0.5) —
drift.py's shared-rounding rule) so all sums are exact BIGINT and
association-order-free. Ties in the argmax break to the LARGER label
string, stated identically in the oracle.

No reference analogue (SURVEY §2 C-extensions / text battery).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

NB_FX = 1_000_000_000


def _fx(expr: str) -> str:
    """Fixed-point ln: floor(ln(x) * 1e9 + 0.5) as BIGINT (ln >= 0 here)."""
    return f"CAST(FLOOR(ln({expr}) * {NB_FX} + 0.5) AS BIGINT)"


def nb_confusion(documents: DataFrame, label_col: str = "lang") -> DataFrame:
    """(label, predicted, n_docs) — the self-classification confusion
    census of multinomial add-1 Naive Bayes trained on token counts with
    ``label_col`` as the class."""
    toks = documents.select(
        "doc_id", F.col(label_col).alias("label"),
        F.explode(F.split("text", " ")).alias("tok"))
    # model: observed (label, token) counts, label totals, vocab size
    ct = toks.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = ct.groupBy("label").agg(F.sum("c").alias("n_l"))
    vocab = ct.select("tok").distinct().agg(F.count(F.lit(1)).alias("v"))
    priors = documents.groupBy(F.col(label_col).alias("label")) \
        .agg(F.count(F.lit(1)).alias("n_docs_l"))
    # per-label constants: ln prior (unnormalized) and ln(N_l + V)
    consts = (
        priors.join(totals, "label")
        .crossJoin(F.broadcast(vocab))
        .selectExpr(
            "label",
            _fx("CAST(n_docs_l AS DOUBLE)") + " AS prior_fx",
            _fx("CAST(n_l + v AS DOUBLE)") + " AS denom_fx",
        )
    )
    model = ct.selectExpr(
        "label AS m_label", "tok",
        _fx("CAST(c + 1 AS DOUBLE)") + " AS lnc_fx")
    doc_len = toks.groupBy("doc_id", "label") \
        .agg(F.count(F.lit(1)).alias("n_toks"))
    # observed-pair token sums per (doc, candidate label): inner join on
    # token against the broadcast model — unseen pairs add ln(1) = 0
    sums = (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id", F.col("label").alias("true_label"),
                 F.col("m_label").alias("cand"))
        .agg(F.sum("lnc_fx").alias("sum_fx"))
    )
    scored = (
        doc_len.select("doc_id", F.col("label").alias("true_label"),
                       "n_toks")
        .join(F.broadcast(consts.select(F.col("label").alias("cand"),
                                        "prior_fx", "denom_fx")))
        .join(sums, ["doc_id", "true_label", "cand"], "left")
        .select(
            "doc_id", "true_label", "cand",
            (F.col("prior_fx") + F.coalesce("sum_fx", F.lit(0))
             - F.col("n_toks") * F.col("denom_fx")).alias("score_fx"),
        )
    )
    pred = (
        scored.groupBy("doc_id", "true_label")
        .agg(F.max(F.struct("score_fx", "cand")).alias("best"))
        .select("true_label", F.col("best.cand").alias("predicted"))
    )
    return (
        pred.groupBy(F.col("true_label").alias("label"), "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("label", "predicted")
    )


@register(
    "nb_lang_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang AS label, UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ),
    ct AS (SELECT label, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY label, tok),
    totals AS (SELECT label, CAST(SUM(c) AS BIGINT) AS n_l
               FROM ct GROUP BY label),
    vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM ct),
    priors AS (SELECT lang AS label, CAST(COUNT(*) AS BIGINT) AS n_docs_l
               FROM documents GROUP BY lang),
    consts AS (
      SELECT p.label,
             CAST(FLOOR(ln(CAST(n_docs_l AS DOUBLE)) * {NB_FX} + 0.5)
                  AS BIGINT) AS prior_fx,
             CAST(FLOOR(ln(CAST(n_l + v AS DOUBLE)) * {NB_FX} + 0.5)
                  AS BIGINT) AS denom_fx
      FROM priors p JOIN totals t ON t.label = p.label, vocab
    ),
    model AS (
      SELECT label AS m_label, tok,
             CAST(FLOOR(ln(CAST(c + 1 AS DOUBLE)) * {NB_FX} + 0.5)
                  AS BIGINT) AS lnc_fx
      FROM ct
    ),
    doc_len AS (
      SELECT doc_id, label AS true_label,
             CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM toks GROUP BY doc_id, label
    ),
    sums AS (
      SELECT t.doc_id, t.label AS true_label, m.m_label AS cand,
             CAST(SUM(m.lnc_fx) AS BIGINT) AS sum_fx
      FROM toks t JOIN model m ON m.tok = t.tok
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT d.doc_id, d.true_label, c.label AS cand,
             c.prior_fx + COALESCE(s.sum_fx, 0)
               - d.n_toks * c.denom_fx AS score_fx
      FROM doc_len d CROSS JOIN consts c
      LEFT JOIN sums s ON s.doc_id = d.doc_id
        AND s.true_label = d.true_label AND s.cand = c.label
    ),
    pred AS (
      SELECT true_label,
             MAX({{'s': score_fx, 'c': cand}})['c'] AS predicted
      FROM scored GROUP BY doc_id, true_label
    )
    SELECT true_label AS label, predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY label, predicted
    """,
    doc="Multinomial add-1 Naive Bayes lang classifier trained on token "
    "counts, self-classification confusion census: the model is two "
    "map-side-combined aggregates broadcast back (O(vocab x labels)); "
    "scoring needs only OBSERVED (token, label) pairs because unseen "
    "pairs contribute ln(1) = 0 after factoring the smoothing "
    "denominator out by |doc|; every ln is fixed-pointed to exact "
    "BIGINT so sums are association-order-free; argmax via one "
    "max(struct) per doc, ties to the larger label — the separability "
    "audit before a learned classifier, trained and applied in-engine.",
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_confusion(load_table(spark, "documents", sf_dir))

"""Unigram-style tokenizer: substring vocabulary induction + optimal
(Viterbi) segmentation — the inference core of SentencePiece's unigram
LM (Kudo 2018), as a deterministic, oracle-replayable Spark plan.

BPE (operators/bpe.py) LEARNS merges greedily; the unigram family
instead scores a CANDIDATE VOCABULARY and segments each word OPTIMALLY
by dynamic programming. This operator keeps that structure exactly —
per word, Viterbi DP over all segmentations into vocabulary pieces —
and swaps the log-probability score for an INTEGER surrogate so both
engines are bit-identical (the same determinism tactic as the
kmeans/PQ fixed-point kernels): the objective is lexicographic
(fewest pieces, then highest total piece frequency, then leftmost-
longest tie-break). Kudo's EM re-estimation is score refinement on
top of this same DP; the DP is where all the algorithmic content (and
all the cross-engine hazard) lives.

Pipeline (every stage oracle-replayed CTE-for-CTE):
1. word-frequency table — the shared single-space tokenization
   (operators/bpe.py:word_frequencies), capped at MAX_WORD_LEN chars;
2. candidate pieces: every substring of length 2..MAX_PIECE_LEN,
   weighted by word frequency per OCCURRENCE; the vocabulary keeps the
   top N_MULTI by (weight DESC, piece ASC) plus every single character
   (segmentability guarantee — no word can fail to tokenize);
3. Viterbi: dp[i] = min over j of (dp[j].pieces + 1,
   dp[j].negweight - weight(word[j+1..i]), j) — a struct-min, so the
   tie order is (fewest pieces, highest weight, smallest j = longest
   last piece). The whole DP is ONE JVM fold (F.aggregate over
   positions) against the broadcast vocabulary map — per-row compute
   inside whole-stage codegen, NO shuffle, no Python;
4. backpointer walk folds the chosen pieces back out; piece usage
   aggregates weighted by word frequency; top TOPK_OUT reported.

Scale shape: stages 1-2 are one corpus shuffle + one piece shuffle over
the O(vocabulary) word table; the DP (the part that looks iterative) is
a bounded per-row expression — a 100 TB corpus pays the word-frequency
shuffle once and the vocabulary map broadcasts as ONE row. The oracle
replays the DP as a DuckDB recursive CTE carrying the dp vector as a
LIST<STRUCT> per word (depth = MAX_WORD_LEN, bounded).

No reference analogue (SURVEY §2 C-extensions; the tokenizer-training
family beside bpe_merge_table / token_count_bpe).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from covid_19_data_engineering_spark.operators.bpe import word_frequencies
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

MAX_PIECE_LEN = 4    # candidate substring cap (chars)
N_MULTI = 48         # multi-char vocabulary size (singles always added)
MAX_WORD_LEN = 24    # DP depth bound (longer words are rare noise)
TOPK_OUT = 30        # reported most-used pieces


def _candidate_vocab(words: DataFrame) -> DataFrame:
    """(p, wt): top N_MULTI substrings of length 2..MAX_PIECE_LEN by
    occurrence-weighted frequency, plus every single character."""
    def pieces_of_len(k: int) -> Column:
        return F.filter(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.when(
                    i + F.lit(k) - 1 <= F.length("w"),
                    F.substring(F.col("w"), i.cast("int"), k)),
            ),
            lambda x: x.isNotNull(),
        )

    subs = words.select(
        "cnt",
        F.explode(F.flatten(F.array(*[
            pieces_of_len(k) for k in range(2, MAX_PIECE_LEN + 1)
        ]))).alias("p"),
    )
    multi = (
        subs.groupBy("p").agg(F.sum("cnt").alias("wt"))
        .orderBy(F.col("wt").desc(), F.col("p"))
        .limit(N_MULTI)
    )
    singles = (
        words.select(
            "cnt", F.explode(pieces_of_len(1)).alias("p"))
        .groupBy("p").agg(F.sum("cnt").alias("wt"))
    )
    return singles.unionByName(multi)


def unigram_piece_usage(docs: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """(rank, piece, used_total) — the TOPK_OUT most-used vocabulary
    pieces under optimal Viterbi segmentation of the whole corpus,
    usage weighted by word frequency."""
    words = (word_frequencies(docs, text_col)
             .where(F.length("w") <= MAX_WORD_LEN))
    vm = _candidate_vocab(words).agg(
        F.map_from_entries(F.collect_list(F.struct("p", "wt"))).alias("m"))

    df = words.crossJoin(F.broadcast(vm))
    n = F.length("w")

    def cell(acc: Column, i: Column) -> Column:
        js = F.sequence(F.greatest(i - F.lit(MAX_PIECE_LEN), F.lit(0)),
                        i - 1)
        cands = F.filter(
            F.transform(js, lambda j: F.struct(
                (F.element_at(acc, (j + 1).cast("int"))["n"] + 1)
                .alias("n"),
                (F.element_at(acc, (j + 1).cast("int"))["negw"]
                 - F.element_at(
                     F.col("m"),
                     F.substring(F.col("w"), (j + 1).cast("int"),
                                 (i - j).cast("int")))).alias("negw"),
                j.cast("int").alias("j"),
            )),
            # a substring absent from the vocabulary lookups to NULL and
            # is dropped; single-char pieces guarantee non-emptiness
            lambda c: c["negw"].isNotNull(),
        )
        return F.array_append(acc, F.array_min(cands))

    init = F.array(F.struct(
        F.lit(0).alias("n"), F.lit(0).cast("long").alias("negw"),
        F.lit(-1).alias("j")))
    dp = F.aggregate(F.sequence(F.lit(1), n), init, cell)

    # backpointer walk: fold n steps; once pos hits 0 the step no-ops
    def back(acc: Column, _: Column) -> Column:
        cur = F.element_at(F.col("cells"), acc["pos"] + 1)
        piece = F.substring(
            F.col("w"), (cur["j"] + 1).cast("int"),
            (acc["pos"] - cur["j"]).cast("int"))
        return F.when(acc["pos"] <= 0, acc).otherwise(F.struct(
            cur["j"].alias("pos"),
            F.array_append(acc["ps"], piece).alias("ps")))

    walk_init = F.struct(
        n.cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"))
    segmented = (
        df.select("w", "cnt", dp.alias("cells"))
        .select("cnt",
                F.aggregate(F.sequence(F.lit(1), F.size("cells") - 1),
                            walk_init, back)["ps"].alias("ps"))
    )
    usage = (
        segmented.select("cnt", F.explode("ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("used_total"))
        .orderBy(F.col("used_total").desc(), F.col("piece"))
        .limit(TOPK_OUT)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("used_total").desc(), F.col("piece"))
    return usage.withColumn("rank", F.row_number().over(w)).select(
        "rank", "piece", "used_total").orderBy("rank")


def _unigram_oracle_sql() -> str:
    k_subs = "\n        UNION ALL\n        ".join(
        f"SELECT cnt, substr(w, i, {k}) AS p "
        f"FROM words, (SELECT unnest(range(1, {MAX_WORD_LEN} + 1)) AS i) "
        f"WHERE i + {k} - 1 <= length(w)"
        for k in range(2, MAX_PIECE_LEN + 1))
    return f"""
    WITH RECURSIVE
    words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE len(w) > 0 AND NOT contains(w, chr(31))
            AND NOT contains(w, chr(30)) AND len(w) <= {MAX_WORD_LEN}
      GROUP BY w
    ),
    multi AS (
      SELECT p, wt FROM (
        SELECT p, CAST(SUM(cnt) AS BIGINT) AS wt,
               ROW_NUMBER() OVER (ORDER BY SUM(cnt) DESC, p) AS rn
        FROM (
        {k_subs}
        ) GROUP BY p
      ) WHERE rn <= {N_MULTI}
    ),
    singles AS (
      SELECT p, CAST(SUM(cnt) AS BIGINT) AS wt FROM (
        SELECT substr(w, i, 1) AS p, cnt
        FROM words, (SELECT unnest(range(1, {MAX_WORD_LEN} + 1)) AS i)
        WHERE i <= length(w)
      ) GROUP BY p
    ),
    vm AS (
      SELECT map_from_entries(list(struct_pack(k := p, v := wt))) AS m
      FROM (SELECT * FROM singles UNION ALL SELECT * FROM multi)
    ),
    dp(w, cnt, i, cells) AS (
      SELECT w, cnt, 0,
             [struct_pack(n := 0, negw := CAST(0 AS BIGINT),
                          j := CAST(-1 AS INTEGER))]
      FROM words
      UNION ALL
      SELECT w, cnt, i + 1,
             list_append(cells, (
               SELECT min(c) FROM (
                 SELECT struct_pack(
                   n := cells[j + 1].n + 1,
                   negw := cells[j + 1].negw
                           - m[substr(w, j + 1, (i + 1) - j)][1],
                   j := CAST(j AS INTEGER)) AS c
                 FROM (SELECT unnest(range(
                          greatest(i + 1 - {MAX_PIECE_LEN}, 0),
                          i + 1)) AS j),
                      vm
                 WHERE len(m[substr(w, j + 1, (i + 1) - j)]) > 0
               )
             ))
      FROM dp WHERE i < length(w)
    ),
    dpf AS (SELECT w, cnt, cells FROM dp WHERE i = length(w)),
    walk(w, cnt, pos, piece) AS (
      SELECT w, cnt, CAST(length(w) AS INTEGER), CAST(NULL AS VARCHAR)
      FROM dpf
      UNION ALL
      SELECT wk.w, wk.cnt, d.cells[wk.pos + 1].j,
             substr(wk.w, d.cells[wk.pos + 1].j + 1,
                    wk.pos - d.cells[wk.pos + 1].j)
      FROM walk wk JOIN dpf d ON d.w = wk.w
      WHERE wk.pos > 0
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY used_total DESC, piece)
             AS INTEGER) AS rank,
           piece, used_total
    FROM (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS used_total
      FROM walk WHERE piece IS NOT NULL
      GROUP BY piece
    )
    QUALIFY rank <= {TOPK_OUT}
    ORDER BY rank
    """


@register(
    "unigram_viterbi_tokens",
    oracle=_unigram_oracle_sql(),
    doc="Unigram-style tokenizer (Kudo 2018's inference core): induce a "
    f"substring vocabulary (top {N_MULTI} pieces of length 2-"
    f"{MAX_PIECE_LEN} by occurrence-weighted frequency + all single "
    "chars), then segment every corpus word OPTIMALLY by Viterbi DP "
    "under a deterministic integer objective (fewest pieces, then "
    "highest total piece frequency, then leftmost-longest) and report "
    f"the {TOPK_OUT} most-used pieces. The DP is ONE JVM fold against "
    "the broadcast vocabulary map — per-row whole-stage-codegen "
    "compute, zero shuffles beyond the word/piece aggregations, no "
    "Python — and the oracle replays it as a recursive CTE carrying "
    "the dp vector as a LIST<STRUCT> per word. The integer surrogate "
    "score replaces log-probs so both engines are bit-identical (the "
    "kmeans/PQ fixed-point tactic); EM re-estimation is score "
    "refinement over this same DP.",
)
def unigram_viterbi_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return unigram_piece_usage(docs)

"""BPE merge induction — the core loop of tokenizer training, as a
deterministic, oracle-replayable Spark plan.

The engine already counts tokens with a fixed BPE-ish regex
(``token_count_bpe``); this operator LEARNS the merges: the classic
byte-pair-encoding procedure (Sennrich et al. 2016) over the corpus's
word-frequency table. Each round counts adjacent symbol pairs (weighted
by word frequency), merges the most frequent pair corpus-wide, and
repeats — exactly what a tokenizer-training job runs before any LLM
pipeline can tokenize consistently.

Determinism across engines:
- words come from the shared single-space split; symbols start as
  characters joined by an ASCII unit separator (0x1F — absent from the
  corpus by construction, asserted cheaply);
- the per-round merge is applied with plain LITERAL string replace
  (``F.replace`` / DuckDB ``replace``), whose leftmost-non-overlapping
  semantics are identical on both engines AND are precisely BPE's greedy
  left-to-right merge order;
- the argmax pair is tie-broken (count DESC, left ASC, right ASC) —
  binary string comparison on both engines.

Scale shape (why this is cluster-sane): all rounds operate on the
WORD-FREQUENCY table, O(vocabulary) — orders of magnitude smaller than
the corpus — produced by one corpus-wide shuffle up front. Each round is
one explode + one (pair)-keyed partial-agg shuffle + a TakeOrdered of 1
+ a broadcast of that single row into a map-side replace. The round
count is the contract (real tokenizers run 10^4-10^5 merges; the
registered query unrolls 8 so the DuckDB oracle can replay the full
pipeline CTE-for-CTE — the pagerank fixed-iteration precedent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

N_MERGES = 8
SEP = "\x1f"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the single-space tokenization — the O(vocabulary)
    working set every BPE round operates on."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where((F.length("w") > 0) & ~F.col("w").contains(SEP))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _seed_symbols(words: DataFrame) -> DataFrame:
    """Char-level seed: 'abc' -> 'a<SEP>b<SEP>c'."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    return words.select(
        F.array_join(chars, SEP).alias("ws"), F.col("cnt")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    sym = F.split(F.col("ws"), SEP)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(sym) - 1),
        lambda i: F.struct(
            F.element_at(sym, i).alias("l"),
            F.element_at(sym, i + F.lit(1)).alias("r"),
        ),
    )
    return (
        words.where(F.size(sym) >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("total"))
    )


def bpe_merge_table(docs: DataFrame, n_merges: int = N_MERGES,
                    text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns one row per merge:
    (merge_rank, left_sym, right_sym, merged, pair_count)."""
    merges, _ = bpe_train(docs, n_merges, text_col)
    return merges


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES,
              text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Full BPE training state: ``(merge_table, final_words)`` where
    final_words is the word-frequency table with all learned merges
    applied (ws = SEP-joined symbols, cnt) — what tokenization with the
    learned vocabulary produces."""
    words = _seed_symbols(word_frequencies(docs, text_col))
    # every round reads the previous round's words twice (pair counts +
    # replace) — checkpoint per round, the iterative-operator rule
    words = words.localCheckpoint(eager=True)
    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("total").desc(), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merges.append(
            best.select(
                F.lit(rank).alias("merge_rank"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged"),
                F.col("total").alias("pair_count"),
            )
        )
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                F.replace(
                    F.col("ws"),
                    F.concat(F.col("l"), F.lit(SEP), F.col("r")),
                    F.concat(F.col("l"), F.col("r")),
                ).alias("ws"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out, words


def bpe_vocab_topk(docs: DataFrame, n_merges: int = N_MERGES, k: int = 20,
                   text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with the learned merges and report the top-k
    resulting subword tokens: (token, token_count) — the sanity readout a
    tokenizer-training run ships (which subwords the merges produced and
    how much corpus mass they carry). Deterministic order: count DESC,
    token ASC."""
    _, words = bpe_train(docs, n_merges, text_col)
    sym = F.split(F.col("ws"), SEP)
    return (
        words.select(F.explode(sym).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("token_count"))
        .orderBy(F.col("token_count").desc(), "token")
        .limit(k)
    )


def _bpe_oracle_sql(n_merges: int = N_MERGES) -> str:
    """Unrolled CTE replay: words0 -> (best1, words1) -> ... The merge
    uses the same literal replace; chr(31) is the separator."""
    ctes = ["""words0 AS (
      SELECT array_to_string(
               list_transform(range(1, len(w) + 1), i -> w[i]), chr(31)
             ) AS ws, cnt
      FROM (
        SELECT w, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE len(w) > 0 AND NOT contains(w, chr(31))
        GROUP BY w
      )
    )"""]
    for r in range(1, n_merges + 1):
        prev = f"words{r - 1}"
        ctes.append(f"""best{r} AS (
      SELECT l, r, total FROM (
        SELECT s[i] AS l, s[i + 1] AS r,
               CAST(SUM(cnt) AS BIGINT) AS total FROM (
          SELECT unnest(range(1, len(s))) AS i, s, cnt FROM (
            SELECT string_split(ws, chr(31)) AS s, cnt FROM {prev}
          ) WHERE len(s) >= 2
        ) GROUP BY s[i], s[i + 1]
      ) ORDER BY total DESC, l, r LIMIT 1
    )""")
        ctes.append(f"""words{r} AS (
      SELECT replace(ws, b.l || chr(31) || b.r, b.l || b.r) AS ws, cnt
      FROM {prev} CROSS JOIN best{r} b
    )""")
    union = "\n      UNION ALL\n      ".join(
        f"SELECT {r} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, total AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return "\n    WITH " + ",\n    ".join(ctes) + f"""
    SELECT * FROM (
      {union}
    ) ORDER BY merge_rank
    """


def _bpe_vocab_oracle_sql(n_merges: int = N_MERGES, k: int = 20) -> str:
    """Reuses the full unrolled training chain — words{n_merges} IS the
    tokenized corpus — then one split + rollup."""
    base = _bpe_oracle_sql(n_merges)
    # keep the WITH chain, swap the final select
    chain_end = base.index("SELECT * FROM (")
    return base[:chain_end] + f"""SELECT token, token_count FROM (
      SELECT token, CAST(SUM(cnt) AS BIGINT) AS token_count FROM (
        SELECT unnest(string_split(ws, chr(31))) AS token, cnt
        FROM words{n_merges}
      ) GROUP BY token
    ) ORDER BY token_count DESC, token LIMIT {k}
    """


@register(
    "bpe_vocab_tokens",
    oracle=_bpe_vocab_oracle_sql(),
    doc=f"Corpus tokenized with the {N_MERGES} learned BPE merges: top-20 "
    "subword tokens by corpus mass — the tokenizer-training sanity "
    "readout. Oracle replays training AND tokenization (the unrolled "
    "words chain's final state IS the tokenized corpus).",
)
def bpe_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return bpe_vocab_topk(docs)


@register(
    "bpe_merge_induction",
    oracle=_bpe_oracle_sql(),
    doc=f"Byte-pair-encoding merge induction (Sennrich et al. 2016): "
    f"{N_MERGES} rounds of count-adjacent-pairs -> merge-the-max over the "
    "O(vocabulary) word-frequency table — the tokenizer-training core "
    "loop. Greedy left-to-right merges via literal string replace "
    "(identical semantics on both engines); deterministic tie-breaks; the "
    "oracle replays every round CTE-for-CTE.",
)
def bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return bpe_merge_table(docs).orderBy("merge_rank")

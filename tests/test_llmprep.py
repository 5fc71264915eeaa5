"""Semantics tests for the LLM-corpus prep operators (operators/llmprep.py)
on planted documents: chunk coverage/overlap, contamination detection,
repetition flags, cross-snapshot incremental dedup, quantile gating.
Oracle value-parity runs separately through tools/driver_gate.py."""

from __future__ import annotations

import pytest

from covid_19_data_engineering_spark.operators.llmprep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
    contamination_report,
    cross_snapshot_near_dups,
    quality_quantile_keep,
    repetition_profile,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and dreams of chasing mice through green fields"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en", "src0"),
        (2, " ".join(f"tok{i}" for i in range(80)), "en", "src0"),   # 80 distinct tokens
        (3, "spam spam " * 30 + "spam", "en", "src1"),               # 61 tokens, 1 distinct
        (4, "short text only", "en", "src1"),
        (5, BASE.replace("green fields", "golden fields"), "en", "src2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_chunking_covers_and_overlaps(docs):
    chunks = chunk_documents(docs).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 4 (3 tokens) -> exactly one chunk, the whole doc
    assert len(by_doc[4]) == 1 and by_doc[4][0]["chunk_text"] == "short text only"
    # doc 2 (80 tokens): starts at 0, 24, 48 -> 3 chunks, last covers to 80
    two = sorted(by_doc[2], key=lambda r: r["chunk_id"])
    assert len(two) == 3
    assert two[0]["n_tokens"] == CHUNK_TOKENS
    assert two[-1]["n_tokens"] == 80 - 2 * CHUNK_STRIDE
    # consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens
    t0, t1 = two[0]["chunk_text"].split(" "), two[1]["chunk_text"].split(" ")
    assert t0[CHUNK_STRIDE:] == t1[: CHUNK_TOKENS - CHUNK_STRIDE]
    # every token of the doc appears in some chunk, in order
    reconstructed = t0 + [t for c in two[1:] for t in c["chunk_text"].split(" ")[CHUNK_TOKENS - CHUNK_STRIDE:]]
    assert reconstructed == [f"tok{i}" for i in range(80)]


def test_contamination_flags_eval_overlap(spark, docs):
    eval_set = docs.where("doc_id = 1")           # BASE is the benchmark
    corpus = docs.where("doc_id != 1")
    rep = {r["doc_id"]: r for r in contamination_report(corpus, eval_set).collect()}
    # doc 5 is a one-word edit of the benchmark doc -> heavy 3-gram overlap
    assert 5 in rep and rep[5]["overlap_frac"] > 0.5
    # doc 2 (tokN soup) shares nothing
    assert 2 not in rep


def test_repetition_flags(docs):
    prof = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
    assert prof[3]["is_repetitive"]               # spam spam spam ...
    assert prof[3]["distinct_ratio"] < 0.05
    assert not prof[2]["is_repetitive"]           # all-distinct tokens
    assert prof[2]["distinct_ratio"] == 1.0
    assert prof[2]["top_bigram_frac"] < 0.10


def test_cross_snapshot_dedup_only_straddles(spark, docs):
    snapshot = docs.where("doc_id <= 2")          # BASE lives in the snapshot
    new = docs.where("doc_id >= 3")               # near-dup 5 arrives later
    pairs = {(r["snapshot_doc_id"], r["new_doc_id"]): r["est_jaccard"]
             for r in cross_snapshot_near_dups(new, snapshot).collect()}
    assert (1, 5) in pairs and pairs[(1, 5)] >= 0.3
    # within-batch pairs are out of scope for the incremental operator
    assert all(s <= 2 and n >= 3 for s, n in pairs)


def test_quality_quantile_strictly_above_median(spark, docs):
    kept = quality_quantile_keep(docs).collect()
    scored = {r["doc_id"]: r["quality"] for r in kept}
    # strictly-above-median keeps under half of each language bucket
    assert 0 < len(kept) <= 2
    # the repetitive spam doc has low stopword mass -> never the top scorer
    assert 3 not in scored

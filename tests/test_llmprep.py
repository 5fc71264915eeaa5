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


def test_pii_scrub_redacts_and_counts(spark):
    from covid_19_data_engineering_spark.operators.llmprep import scrub_pii

    rows = [
        (1, "contact alice@example.com or +555-123-4567 now"),
        (2, "ssn 123-45-6789 on file, ref 99821"),
        (3, "clean text with one 7 digit"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")
    out = {r["id"]: r for r in scrub_pii(df, "body").collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "<EMAIL>" in out[1]["scrubbed"] and "<PHONE>" in out[1]["scrubbed"]
    assert "alice" not in out[1]["scrubbed"].split("@")[0] or "@" not in out[1]["scrubbed"].replace("<EMAIL>", "")
    assert out[2]["n_ssn"] == 1 and out[2]["n_digits"] == 1  # 99821 is the leftover run
    assert "<SSN>" in out[2]["scrubbed"] and "<DIGITS>" in out[2]["scrubbed"]
    assert "123-45-6789" not in out[2]["scrubbed"]
    # single digits are not redacted; clean text passes through unchanged
    assert out[3]["scrubbed"] == "clean text with one 7 digit"
    assert out[3]["n_email"] == out[3]["n_ssn"] == out[3]["n_phone"] == out[3]["n_digits"] == 0


def test_boilerplate_profile_flags_template_docs(spark):
    from covid_19_data_engineering_spark.operators.llmprep import boilerplate_profile

    template = "copyright acme corp all rights reserved"
    rows = (
        # 4 docs sharing the template prefix -> its 4-grams hit df >= 3
        [(i, template + f" unique{i} body{i} words{i} here{i}", "en", "s") for i in range(4)]
        # 2 docs with fully unique text -> no boilerplate grams
        + [(10 + i, " ".join(f"w{i}_{j}" for j in range(12)), "en", "s") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in boilerplate_profile(df).collect()}
    for i in range(4):
        assert out[i]["boiler_grams"] >= 3, out[i]  # the shared template 4-grams
        assert out[i]["boiler_frac"] > 0
    for i in (10, 11):
        assert out[i]["boiler_grams"] == 0 and out[i]["boiler_frac"] == 0.0
        assert not out[i]["is_boilerplate_heavy"]


def test_mixture_plan_invariants(spark):
    from covid_19_data_engineering_spark.operators.llmprep import mixture_plan

    rows = (
        [(i, " ".join(["tok"] * 400), "en", "big") for i in range(10)]      # 4000 tokens
        + [(100 + i, " ".join(["tok"] * 40), "en", "small") for i in range(5)]  # 200 tokens
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r for r in mixture_plan(df).collect()}
    assert out["big"]["n_tokens"] == 4000 and out["small"]["n_tokens"] == 200
    # temperature flattening: small source's share rises vs raw, big's falls
    assert out["small"]["temp_share"] > out["small"]["raw_share"]
    assert out["big"]["temp_share"] < out["big"]["raw_share"]
    for r in out.values():
        assert 0.0 < r["sampling_rate"] <= 1.0
        assert r["target_tokens"] <= r["n_tokens"]
    # the small source is fully consumed (its temp-share allocation exceeds
    # its size, so the rate caps at 1.0); the big source gets its exact
    # temp-share slice of the 2100-token budget
    assert out["small"]["sampling_rate"] == 1.0
    assert out["small"]["target_tokens"] == 200
    big_expected = out["big"]["temp_share"] * 2100
    assert abs(out["big"]["target_tokens"] - big_expected) / big_expected < 0.01


def test_lm_bigram_perplexity_semantics(spark):
    """Templated docs (bigrams common across the corpus) must score lower
    avg_nll than a doc whose bigrams appear nowhere else; unseen-heavy docs
    lean on the +1 smoothing floor and rank worst."""
    from covid_19_data_engineering_spark.operators.llmprep import lm_bigram_scores

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template, "en", "web") for i in range(8)] + [
        (100, "zyx wvu tsr qpo nml kji hgf edc ba", "en", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in lm_bigram_scores(df).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7, 100}
    # every templated copy has identical bigram multiset -> identical score
    assert len({out[i]["avg_nll"] for i in range(8)}) == 1
    assert out[100]["avg_nll"] > out[0]["avg_nll"]
    assert out[100]["n_bigrams"] == 8
    for r in out.values():
        assert r["avg_nll"] > 0.0

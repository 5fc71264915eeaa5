#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}
followed by two tail-safe lines (the driver captures only the last ~2000
bytes of stdout): a compact positional per-query record covering EVERY timed
query (integer centiseconds, sorted-name order) and, as the LAST line, a
short summary carrying the headline total plus the 12 headline per-query
medians under "queries".

Each query is collected (not just planned) so the number is end-to-end
executor time. Each reported number is the PER-QUERY MEDIAN OF 3
INTERLEAVED TIMED PASSES (round-5 verdict #5: the single-pass protocol
let one noisy run swing the round-over-round record by ~20% with zero
plan changes). No separate warmup pass: the first pass pays
whole-stage-codegen + JIT, and the MEDIAN discards it automatically —
one cold among three passes never lands in the middle — so the steady-
state number survives at 3/4 the wall cost of warm+3. "queries_spread"
reports each query's max-min across the passes (cold-start inflation
included, by design — it IS part of the noise band);
SPARK_GRAFT_BENCH_PASSES overrides the pass count.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family — scan+agg, star join, window,
# rollup, semi-structured, set-op, plus the extension operators.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "customer_running_spend",
    "rollup_returns",
    "events_json_extract",
    "distinct_counts",
    "order_fill_outer",
    "dedup_exact",
    "corpus_curation_yield",
    "ann_cosine_topk",
    "events_asof_click_before_purchase",
]

# Queries deliberately NOT timed, each with a reason. This list must stay
# short and every entry must carry a reason string — round-9 verdict #1:
# the pinned EXTRA list had silently drifted to cover only 136 of 221
# registered queries (the whole TPC-H battery among the untimed), so a perf
# regression there was invisible to BENCH_r{N}. The extras list is now
# DERIVED from the registry (all_queries() - HEADLINE - EXCLUDED) so every
# new registered query is timed by construction.
EXCLUDED: dict[str, str] = {
    # (none currently: every registered query is a batch DataFrame build
    #  that .collect()s at sf0.1 — streaming semantics are benched through
    #  their batch twins, which ARE registered queries and hence timed)
}

# Former pinned extras list (rounds 2-9), kept for reference in git history;
# the derived list below supersedes it.
_LEGACY_EXTRA = [
    "order_price_ranks_scalable",
    "dedup_minhash_lsh",
    "cross_snapshot_dedup",
    "doc_chunking",
    "benchmark_contamination",
    "tpch_q7_volume_shipping",
    "tpch_q18_large_volume_customers",
    "boilerplate_ngram_profile",
    "pii_scrub_events",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "part_copurchase_pairs",
    "source_cap_sample",
    # round-3 additions
    "lm_bigram_perplexity",
    "embedding_quantize_int8",
    "dedup_retention_manifest",
    "grouped_map_source_zscore",
    "events_heavy_hitters_cms",
    "event_transition_matrix",
    "ann_cosine_topk_int8",
    "vocab_growth_curve",
    "source_quality_scorecard",
    # round-4 additions
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "incremental_retention_manifest",
    "dup_span_profile",
    "pagerank_copurchase",
    "kmeans_embedding_clusters",
    "ann_range_search",
    "bm25_retrieval",
    "copurchase_triangles",
    "hybrid_rrf_retrieval",
    "events_value_interpolation",
    "shuffle_skew_report",
    "fuzzy_part_name_matches",
    "ab_conversion_ztest",
    "dup_span_scrub",
    "training_shard_manifest",
    "ivf_incremental_assign",
    "referential_integrity_report",
    "ann_lsh_range_search",
    "gopher_rule_gate",
    # round-5 additions
    "dedup_embedding_cosine",
    # renamed in round 12 (the stored-state variant became the primary
    # incremental_retention_manifest; the old in-query primary became
    # _inquery) — keep the slot so round-over-round ordering is stable
    "incremental_retention_manifest_inquery",
    "semantic_dedup",
    "bpe_merge_induction",
    "bpe_vocab_tokens",
    "dsir_importance_selection",
    # round-6 additions
    "bpe_merge_induction_batched",
    "sequence_packing_manifest",
    "zorder_file_layout",
    "exact_price_quantiles",
    "semantic_dedup_ivf",
    "retrieval_quality_eval",
    # round-8 additions
    "embedding_random_projection",
    "ann_projected_topk",
    "ann_projected_recall",
    "leakage_safe_split",
    # round-8 continuation
    "tpch_q6_forecast_revenue",
    "tpch_q12_priority_lines",
    "weighted_sample_wor",
    "bloom_semi_join_stats",
    "minhash_lsh_accuracy",
    "cdc_chunk_stats",
    "events_interval_coverage",
    "embedding_class_separation",
    "setsim_prefix_join",
    "multimodal_audio_features",
    "token_keyness_g2",
    "pareto_frontier_parts",
    "events_drift_js",
    "events_rolling_anomalies",
    "robust_price_outliers",
    "source_overlap_matrix",
    "ngram_novelty_profile",
    "events_lateness_profile",
    "events_error_control_chart",
    "functional_dependency_profile",
    "embedding_covariance_profile",
    "copurchase_association_rules",
    "orders_open_backlog_curve",
    "session_duration_quantiles",
    "supplier_concentration_hhi",
    "embedding_quantile_calibration",
    "events_ewma_smoothing",
    "source_token_entropy",
    "price_quantity_spearman",
    "source_zipf_fit",
    # round-9 additions
    "incremental_sum_aggregate",
    "incremental_minmax_aggregate",
    "incremental_distinct_aggregate",
    "incremental_join_view",
    "events_user_hll",
    "events_value_bootstrap_ci",
    "events_hll_overlap",
    "embedding_pca_power",
    "multimodal_video_features",
    "events_cusum_changepoint",
    "events_ks_drift",
    "events_acf_daily",
    "cohort_retention_matrix",
    "order_status_priority_independence",
    "events_value_auc",
    "customer_revenue_gini",
    "customer_lifetime_km",
    "contrastive_pair_mining",
    "kcore_copurchase",
    "tfidf_doc_neighbors",
    "price_quantity_ols",
    "events_daily_trend",
    "purchase_attribution_linear",
    "error_value_split_gain",
    "events_dow_seasonality",
    "revenue_weighted_price_quantiles",
    "orders_benford_audit",
    "token_pmi_collocations",
    "rfm_customer_segments",
    "event_markov_stationary",
    "events_sprt_conversion",
    "event_top_paths",
    "embedding_prototype_accuracy",
    "conversion_latency_quantiles",
    "monthly_revenue_growth",
]


def _run_headline_isolated(n_passes: int) -> tuple[dict, dict]:
    """Time the headline batch in a FRESH subprocess (its own JVM/session).

    Round-10 verdict #2: the driver's headline total moved +12% r9->r10
    while a same-protocol run recorded the best number ever — the headline
    is the round-over-round gate metric and must not inherit heap/JIT/GC
    state from however many extras the growing registry times in the same
    process. Process isolation makes it mix-stable by construction: the
    headline JVM never sees an extra query. Cost: one extra ~15s session
    startup per bench run (the median-of-3 discards nothing here — the
    child pays codegen on pass 1 exactly as the old in-process phase did).
    """
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_CHILD"] = "headline"
    env["SPARK_GRAFT_BENCH_PASSES"] = str(n_passes)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=1800)
    if proc.returncode != 0:
        raise RuntimeError(
            f"isolated headline pass failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}")
    # the child prints the full record then the short tail-safe summary;
    # take the line that carries the per-query map
    for line in proc.stdout.strip().splitlines():
        try:
            payload = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in payload and "queries_spread" in payload:
            return payload["queries"], payload["queries_spread"]
    raise RuntimeError("isolated headline pass printed no per-query record")


def main() -> None:
    from covid_19_data_engineering_spark.plans.registry import all_queries
    from covid_19_data_engineering_spark.session import get_spark

    child_mode = os.environ.get("SPARK_GRAFT_BENCH_CHILD", "")

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    # extras DERIVED from the registry: every registered query outside the
    # headline is timed unless explicitly excluded with a logged reason.
    # _LEGACY_EXTRA's round order is kept as a stable prefix (round-over-
    # round per-query comparability); queries never before timed append in
    # sorted order after it.
    legacy = [n for n in _LEGACY_EXTRA
              if n in queries and n not in HEADLINE and n not in EXCLUDED]
    newly = sorted(n for n in queries
                   if n not in HEADLINE and n not in EXCLUDED
                   and n not in legacy)
    extra_names = legacy + newly
    for name, reason in EXCLUDED.items():
        print(f"# bench: excluded {name}: {reason}", file=sys.stderr)
    override = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if override:
        names = [n for n in override.split(",") if n in queries]
        extra_names = []
    if child_mode == "headline":
        extra_names = []  # the child times ONLY the headline batch

    # gc.collect() between queries releases the Python references to each
    # query's localCheckpoint()ed RDDs so Spark's ContextCleaner can drop
    # their storage blocks — otherwise 45+ queries' checkpoint blocks pile
    # up in the one executor heap and late queries pay 2-3x in GC pressure
    # (observed: dedup_ngram_jaccard 5s isolated vs 15s late in the run).
    # The JVM System.gc() matters too: ContextCleaner discovers dead RDDs
    # through WEAK references, which only clear on a JVM collection —
    # without forcing one, cleanup timing is arbitrary and late queries
    # still measured 2x their isolated cost (round-5: ngram 3.7s isolated
    # vs 7.9s as extra #25 of 51).
    import gc

    def _reclaim() -> None:
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass  # bench must never fail on a cleanup hint

    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    def timed(batch: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        """Median-of-n per query over INTERLEAVED passes (pass 1 runs every
        query, then pass 2, ...) so slow environmental drift — GC pressure,
        page cache, CPU thermal state — lands on all queries alike instead
        of biasing whichever query a back-to-back triple happened to hit."""
        per: dict[str, list[float]] = {name: [] for name in batch}
        for _ in range(n_passes):
            for name in batch:
                start = time.perf_counter()
                queries[name](spark, SF_DIR).collect()
                per[name].append(time.perf_counter() - start)
                _reclaim()
        medians = {n: round(sorted(v)[len(v) // 2], 3) for n, v in per.items()}
        spreads = {n: round(max(v) - min(v), 3) for n, v in per.items()}
        return medians, spreads

    # phase per batch (time headline fully, then extras): the headline
    # total stays comparable round-over-round even as the extras list
    # grows — timing it after the extras inherited their heap churn and
    # drifted ~15% in round 2's layout. Since round 11 the headline batch
    # runs in a FRESH subprocess (own JVM) unless this IS the child or an
    # explicit query override is active — see _run_headline_isolated.
    headline_isolated = False
    if child_mode != "headline" and not override and extra_names:
        try:
            timings, spreads = _run_headline_isolated(n_passes)
            headline_isolated = True
        except Exception as exc:  # never lose the bench to the child
            print(f"# bench: isolated headline failed, timing in-process: "
                  f"{exc}", file=sys.stderr)
            timings, spreads = timed(names)
    else:
        timings, spreads = timed(names)
    extra_timings, extra_spreads = timed(extra_names)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_extra": extra_timings,
        "queries_spread": spreads,
        "queries_extra_spread": extra_spreads,
        "passes": n_passes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # bench-coverage accounting (round-9 verdict #1: no silent caps) —
        # timed must equal registered minus named exclusions
        "queries_registered": len(queries),
        "queries_timed": len(names) + len(extra_names),
        "excluded": sorted(EXCLUDED),
        "headline_isolated": headline_isolated,
    }
    print(json.dumps(out))
    # the full record above can exceed the driver's captured stdout tail
    # (measured: the driver keeps the LAST 2000 BYTES and json-parses the
    # last complete line) once 60+ per-query maps are included — r05/r06/
    # r07 all lost the headline "value" to truncation, and r13's 300-entry
    # map left PERF_r13 with per_query {} / geomean null (round-13 verdict
    # #3). The tail now carries, in order (newest last, everything within
    # the 2000-byte window):
    #   1. "per_query_centisec": the FULL per-query medians as a positional
    #      array of integer centiseconds in sorted-name order. The name
    #      list is deterministic — sorted(timed queries) — so any reader
    #      with the registry (or the full first-line record from a local
    #      log) can re-attach names; 10 ms quantization is well inside the
    #      sub-second noise band the per-query comparison tolerates.
    #   2. the final summary line: headline total + the 12 headline
    #      per-query medians under "queries" (full names — the round-over-
    #      round gate set) + as many slowest-extras as the byte budget
    #      allows (auto-trimmed so lines 1+2 stay under ~1900 bytes).
    all_timings = {**timings, **extra_timings}
    order = sorted(all_timings)
    pq_line = json.dumps({
        "metric": "per_query_centisec",
        "n": len(order),
        "order": "sorted_names",
        "v": [int(round(all_timings[n] * 100)) for n in order],
    }, separators=(",", ":"))
    summary = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "passes": out["passes"],
        "extra_total": round(sum(extra_timings.values()), 3),
        "headline_isolated": headline_isolated,
        "queries": timings,
    }
    slowest = sorted(extra_timings.items(), key=lambda kv: kv[1], reverse=True)
    for k in range(12, -1, -1):
        summary["slowest_extras"] = dict(slowest[:k])
        tail_line = json.dumps(summary, separators=(",", ":"))
        if len(pq_line) + len(tail_line) + 2 <= 1900:
            break
    print(pq_line)
    print(tail_line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

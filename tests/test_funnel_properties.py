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


def _score_sets():
    rnd = random.Random(20260814)
    cases = []
    # heavy ties (few distinct scores), uniform spread, one giant tie
    cases.append([rnd.randint(0, 5) * 100 for _ in range(300)])
    cases.append([rnd.randint(0, 1000) for _ in range(400)])
    cases.append([7] * 123 + [900] * 4)
    return cases


@pytest.mark.parametrize(
    "sks", _score_sets(), ids=["ties", "uniform", "giant-tie"]
)
def test_curriculum_tiers_partition_and_order(spark, sks):
    """Equal-frequency tier invariants under tie-heavy synthetic score
    distributions the fixture never produces: tiers partition the docs
    exactly, tier ids are in [0, B), tier score ranges are disjoint and
    ordered (higher tier ⇒ strictly higher scores), and every tier's
    doc count stays within the tie-spill bound (a tier can only exceed
    the ideal n/B share because one quantized score's whole tie block
    lands in it)."""
    from collections import Counter

    from parallelutilities_jl_spark.operators.pipeline import (
        _CURRICULUM_BUCKETS,
        curriculum_tiers,
    )

    rnd = random.Random(sum(sks))
    rows = [(sk, rnd.randint(1, 50)) for sk in sks]
    per_doc = spark.createDataFrame(rows, "sk long, toks long")
    out = curriculum_tiers(per_doc).collect()
    n = len(sks)
    assert sum(r["n_docs"] for r in out) == n
    assert sum(r["est_tokens"] for r in out) == sum(t for _, t in rows)
    tiers = sorted(out, key=lambda r: r["tier"])
    for r in tiers:
        assert 0 <= r["tier"] < _CURRICULUM_BUCKETS
        assert r["min_score_k"] <= r["max_score_k"]
    for lo, hi in zip(tiers, tiers[1:]):
        assert lo["max_score_k"] < hi["min_score_k"]
    # tie-spill bound: tier size <= ideal share + (largest tie block - 1)
    biggest_tie = max(Counter(sks).values())
    ideal = -(-n // _CURRICULUM_BUCKETS)
    for r in tiers:
        assert r["n_docs"] <= ideal + biggest_tie - 1

"""The round-13 cosine τ-pushdown's proof obligation, executed: the
int16-grid upper bound evaluated by the REAL Spark expressions must
dominate the quantized cosine the exact filter runs on, for every pair
— including adversarial near-boundary and degenerate shapes. If the
bound ever fell below the exact score, the pushdown would silently
drop a true survivor (an output bug the oracle only catches when the
fixture happens to exercise the losing pair); this pins the invariant
on randomized + adversarial vectors directly.

Derivation under test (similarity.py COS_PRESCALE):
    Dq = Σ floor(ea·eb·S)  ≤  S/P² · (Σ ta·tb + l1a + l1b + D)
with t = floor(e·P), P = 2^10, S = DOT_SCALE."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.similarity import (
    COS_PRESCALE,
    COSINE_DUP_THRESHOLD,
    _PRE_TO_DOT,
    _prequant,
    _preq_dot,
    dot,
    norm,
)

D = 64


def _pairs():
    rng = random.Random(1337)
    pairs = []
    # random fixture-like pairs
    for _ in range(120):
        a = [rng.uniform(-0.6, 0.6) for _ in range(D)]
        b = [rng.uniform(-0.6, 0.6) for _ in range(D)]
        pairs.append((a, b))
    # adversarial: b = a + tiny noise → cosine hugs 1.0, every floor
    # boundary in both quantizers is in play
    for _ in range(40):
        a = [rng.uniform(-0.6, 0.6) for _ in range(D)]
        b = [v + rng.uniform(-1e-4, 1e-4) for v in a]
        pairs.append((a, b))
    # adversarial: values sitting ON the 2^-10 grid (floor ties)
    for _ in range(20):
        a = [rng.randrange(-614, 615) / COS_PRESCALE for _ in range(D)]
        b = [rng.randrange(-614, 615) / COS_PRESCALE for _ in range(D)]
        pairs.append((a, b))
    # near-threshold: scaled so true cosine lands around τ
    for _ in range(20):
        a = [rng.uniform(-0.6, 0.6) for _ in range(D)]
        na = math.sqrt(sum(v * v for v in a))
        mix = [
            COSINE_DUP_THRESHOLD * v / na
            + math.sqrt(1 - COSINE_DUP_THRESHOLD**2)
            * rng.uniform(-0.1, 0.1)
            for v in a
        ]
        pairs.append((a, mix))
    return pairs


def test_bound_dominates_quantized_cosine_everywhere(spark):
    rows = [(i, a, b) for i, (a, b) in enumerate(_pairs())]
    df = spark.createDataFrame(
        rows, "pid long, ea array<double>, eb array<double>"
    )
    qa, qb = _prequant(F.col("ea")), _prequant(F.col("eb"))
    l1 = lambda q: F.aggregate(  # noqa: E731
        F.transform(q, lambda v: F.abs(v.cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = df.select(
        "pid",
        (
            (_preq_dot(qa, qb) + l1(qa) + l1(qb)
             + F.size(F.col("ea")).cast("long")).cast(
                "double"
            )
            * F.lit(_PRE_TO_DOT * (1.0 + 1e-12))
        ).alias("ub"),
        dot(F.col("ea"), F.col("eb")).cast("double").alias("dq"),
        (norm(F.col("ea")) * norm(F.col("eb"))).alias("nn"),
    ).collect()
    assert len(out) == 200
    for r in out:
        # the pushdown keeps a pair iff ub >= τ'·na·nb; a true survivor
        # has dq >= τ·na·nb — domination ub >= dq makes over-pruning
        # impossible regardless of τ
        assert r["ub"] >= r["dq"], (
            f"pair {r['pid']}: bound {r['ub']} < quantized dot {r['dq']}"
            f" (cos={r['dq'] / r['nn'] if r['nn'] else float('nan')})"
        )

"""Semantic pins for the three round-13-continuation config planners
(quality_threshold_plan, vocab_coverage_plan, session_gap_plan) beyond
the oracle's engine-parity check: on hand-crafted corpora the emitted
plan values must match the hand-derived configuration intent."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from parallelutilities_jl_spark.operators.pipeline import (
    QUALITY_KEEP_PPM,
    q_quality_threshold_plan,
)
from parallelutilities_jl_spark.operators.relational import (
    q_session_gap_plan,
)
from parallelutilities_jl_spark.operators.text import (
    q_vocab_coverage_plan,
)

assert QUALITY_KEEP_PPM == 300_000  # targets below are derived from 30%

# a doc that maxes the quality score: >=100 words, stopword-heavy, no
# punctuation -> len_score 1, stop term saturates, punct term 1 ->
# score 1.0 -> milli bucket 1000
_HI = "the a of and in " * 20
# a doc that scores low: one non-stopword word, no punctuation ->
# 0.5*0.01 + 0 + 0.2 = 0.205 -> milli bucket 205
_LO = "zzz"


def _docs(spark, tmp_path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).pipe(spark.createDataFrame).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_quality_threshold_meets_budget_and_keeps_ties(spark, tmp_path):
    rows = []
    # srcA: 3 high + 7 low, target ceil(0.3*10)=3 -> the high bucket
    # alone meets the budget: threshold 1000, n_keep 3
    for i in range(3):
        rows.append((i, _HI, "en", "srcA", len(_HI)))
    for i in range(3, 10):
        rows.append((i, _LO, "en", "srcA", len(_LO)))
    # srcB: 2 high + 8 low, target 3 -> the high bucket undershoots, so
    # the threshold falls to the low bucket and ALL its ties are kept
    for i in range(10, 12):
        rows.append((i, _HI, "en", "srcB", len(_HI)))
    for i in range(12, 20):
        rows.append((i, _LO, "en", "srcB", len(_LO)))
    sf = _docs(spark, tmp_path, rows)
    got = {r["source"]: r for r in q_quality_threshold_plan(spark, sf).collect()}
    a, b = got["srcA"], got["srcB"]
    assert (a["n_docs"], a["target_keep"]) == (10, 3)
    assert (a["threshold_milli"], a["n_keep"], a["keep_ppm"]) == (
        1000, 3, 300_000,
    )
    assert (b["n_docs"], b["target_keep"]) == (10, 3)
    assert (b["threshold_milli"], b["n_keep"], b["keep_ppm"]) == (
        205, 10, 1_000_000,
    )


def test_vocab_coverage_counts_partial_tier_exactly(spark, tmp_path):
    # srcT counts: a=40 b=30 c=10 d=10 e=10 (total 100): the p95 target
    # 95 lands INSIDE the 3-word count-10 tier -> 2 full-tier words +
    # ceil((95-70)/10)=3 -> vocab 5; p99 the same tier -> 5
    words = ["a"] * 40 + ["b"] * 30 + ["c"] * 10 + ["d"] * 10 + ["e"] * 10
    t1 = " ".join(words)
    # srcU counts: x=50 y=30 z=15 w=4 v=1 (total 100): p95 target 95 is
    # met exactly at rank 3 (50+30+15); p99 needs w too -> 4
    t2 = " ".join(["x"] * 50 + ["y"] * 30 + ["z"] * 15 + ["w"] * 4 + ["v"])
    sf = _docs(
        spark,
        tmp_path,
        [(0, t1, "en", "srcT", len(t1)), (1, t2, "en", "srcU", len(t2))],
    )
    got = {r["source"]: r for r in q_vocab_coverage_plan(spark, sf).collect()}
    t, u = got["srcT"], got["srcU"]
    assert (t["total_tokens"], t["distinct_words"]) == (100, 5)
    assert (t["vocab_p95"], t["vocab_p99"]) == (5, 5)
    assert (u["total_tokens"], u["distinct_words"]) == (100, 5)
    assert (u["vocab_p95"], u["vocab_p99"]) == (3, 4)


def test_session_gap_quantiles_hand_derived(spark, tmp_path):
    # one user, gaps of [1, 1, 1, 2, 5, 30] minutes: n=6, p50 target 3
    # -> bucket 1; p90/p95/p99 targets 6 -> bucket 30; the
    # recommendation is the p95
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    offsets_min = [0, 1, 2, 3, 5, 10, 40]
    rows = [
        (i, base + dt.timedelta(minutes=m), 7, "click", 1.0, "{}")
        for i, m in enumerate(offsets_min)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).pipe(spark.createDataFrame).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    [r] = q_session_gap_plan(spark, str(tmp_path)).collect()
    assert r["n_gaps"] == 6
    assert r["p50_gap_min"] == 1
    assert r["p90_gap_min"] == 30
    assert r["p95_gap_min"] == 30
    assert r["p99_gap_min"] == 30
    assert r["recommended_timeout_min"] == 30


def test_threshold_sensitivity_hand_derived(spark, tmp_path):
    # 3-shingles: A {123, 234}; B {123, 23x}; C == A.
    # jac(A,B) = jac(B,C) = 1/3 -> decile 3; jac(A,C) = 1 -> decile 9.
    # So taus 1-3 see 3 pairs / 3 docs, taus 4-9 see 1 pair / 2 docs.
    from parallelutilities_jl_spark.operators.dedup import (
        q_dedup_threshold_sensitivity,
    )

    a = "w1 w2 w3 w4"
    b = "w1 w2 w3 x"
    rows = [
        (0, a, "en", "src", len(a)),
        (1, b, "en", "src", len(b)),
        (2, a, "en", "src", len(a)),
    ]
    sf = _docs(spark, tmp_path, rows)
    got = {
        r["tau_e1"]: (r["n_pairs"], r["n_docs_affected"])
        for r in q_dedup_threshold_sensitivity(spark, sf).collect()
    }
    assert set(got) == set(range(1, 10))
    for t in (1, 2, 3):
        assert got[t] == (3, 3)
    for t in range(4, 10):
        assert got[t] == (1, 2)


def test_lsh_banding_plan_monotone_and_exact_recall(spark, tmp_path):
    # Aligned band grids nest: an 8-row band match implies both its
    # 4-row halves match, etc. — so the candidate set can only GROW as
    # the signature is cut into more bands. And two identical docs
    # share all 16 hashes, so they are a candidate under every cut.
    from fractions import Fraction

    from parallelutilities_jl_spark.operators.dedup import (
        _BANDING_CONFIGS,
        q_lsh_banding_plan,
    )

    a = "w1 w2 w3 w4 w5 w6"
    b = "q1 q2 q3 q4 q5 q6"
    rows = [
        (0, a, "en", "src", len(a)),
        (1, a, "en", "src", len(a)),
        (2, b, "en", "src", len(b)),
    ]
    sf = _docs(spark, tmp_path, rows)
    got = {
        (r["bands"], r["rows_per_band"]): r
        for r in q_lsh_banding_plan(spark, sf).collect()
    }
    assert set(got) == set(_BANDING_CONFIGS)
    cands = [got[c]["n_candidate_pairs"] for c in _BANDING_CONFIGS]
    assert cands == sorted(cands, reverse=True)  # monotone in bands
    assert all(c >= 1 for c in cands)  # the identical pair, every cut
    for bands, rows_pb in _BANDING_CONFIGS:
        t = Fraction(3, 10)
        want = int((1 - (1 - t**rows_pb) ** bands) * 1_000_000)
        assert got[(bands, rows_pb)]["est_recall_tau03_e6"] == want
    assert got[(16, 1)]["est_recall_tau03_e6"] == 996_676
    assert got[(2, 8)]["est_recall_tau03_e6"] == 131


def test_packing_capacity_hand_derived(spark, tmp_path):
    # two docs of 100 and 300 whitespace tokens: at C=128 the long doc
    # truncates 172 of 400 tokens (430000 ppm) and the windows carry
    # 28/256 padding (109375 ppm); at C=512 nothing truncates and
    # padding is 624/1024 (609375 ppm)
    from parallelutilities_jl_spark.operators.pipeline import (
        q_packing_capacity_plan,
    )

    t100 = " ".join(["w"] * 100)
    t300 = " ".join(["w"] * 300)
    sf = _docs(
        spark,
        tmp_path,
        [(0, t100, "en", "src", len(t100)), (1, t300, "en", "src", len(t300))],
    )
    got = {
        r["capacity"]: r for r in q_packing_capacity_plan(spark, sf).collect()
    }
    assert set(got) == {128, 256, 512, 1024}
    for c in got:
        assert (got[c]["n_docs"], got[c]["real_tokens"]) == (2, 400)
    assert got[128]["kept_tokens"] == 228
    assert got[128]["truncated_ppm"] == 430_000
    assert got[128]["pad_waste_ppm"] == 109_375
    assert got[256]["kept_tokens"] == 356
    assert got[256]["truncated_ppm"] == 110_000
    assert got[256]["pad_waste_ppm"] == 304_687
    assert got[512]["kept_tokens"] == 400
    assert got[512]["truncated_ppm"] == 0
    assert got[512]["pad_waste_ppm"] == 609_375
    assert got[1024]["pad_waste_ppm"] == 804_687


def test_embedding_dim_plan_dominant_coordinate(spark, tmp_path):
    # dim 0 alternates 0/1 (the only variance); dims 1-3 constant ->
    # one coordinate carries ALL the energy
    from parallelutilities_jl_spark.operators.similarity import (
        q_embedding_dim_plan,
    )

    rows = [
        (0, [0.0, 0.5, 0.5, 0.5], 0),
        (1, [1.0, 0.5, 0.5, 0.5], 0),
        (2, [0.0, 0.5, 0.5, 0.5], 1),
        (3, [1.0, 0.5, 0.5, 0.5], 1),
    ]
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    [r] = q_embedding_dim_plan(spark, str(tmp_path)).collect()
    assert (r["n_vecs"], r["n_dims"]) == (4, 4)
    assert r["top_dim"] == 0
    assert r["top_share_ppm"] == 1_000_000
    assert (r["dims_p90"], r["dims_p99"]) == (1, 1)


def test_ann_nprobe_plan_monotone(spark, sf_dir):
    # probing more cells can only add candidates, and recall against
    # the fixed exact top-3 can only grow with the candidate set
    from parallelutilities_jl_spark.operators.clustering import (
        NPROBE_PLAN_MAX,
        q_ann_nprobe_plan,
    )

    rows = {r["nprobe"]: r for r in q_ann_nprobe_plan(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, NPROBE_PLAN_MAX + 1))
    cands = [rows[np]["n_candidates"] for np in sorted(rows)]
    hits = [rows[np]["topk_hits"] for np in sorted(rows)]
    assert cands == sorted(cands)
    assert hits == sorted(hits)
    n_exact = {rows[np]["n_exact"] for np in rows}
    assert len(n_exact) == 1  # one shared exact baseline
    for np, r in rows.items():
        assert 0 <= r["topk_hits"] <= r["n_exact"]
        assert r["recall_e6"] == (r["topk_hits"] * 1_000_000) // r["n_exact"]

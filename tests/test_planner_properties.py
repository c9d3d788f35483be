"""Randomized property checks for the round-13-continuation planners
over corpora the fixtures never exercise (skewed word distributions,
sub-second timestamp jitter, token-count extremes). The oracle is pure
Python recomputing each plan from first principles — independent of
both engines' SQL."""

from __future__ import annotations

import datetime as dt

import random

import pandas as pd
import pytest

from parallelutilities_jl_spark.operators.pipeline import (
    _PACK_CAPACITIES,
    q_packing_capacity_plan,
)
from parallelutilities_jl_spark.operators.relational import (
    _GAP_CAP_MIN,
    _GAP_QUANTILES_PPM,
    q_session_gap_plan,
)
from parallelutilities_jl_spark.operators.text import (
    COV95_PPM,
    COV99_PPM,
    q_vocab_coverage_plan,
)


def _write_docs(spark, path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).pipe(spark.createDataFrame).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )
    return str(path)


def _ceil_ppm(total: int, ppm: int) -> int:
    return (total * ppm + 999_999) // 1_000_000


SEEDS = [3, 1411, 90210]


@pytest.mark.parametrize("seed", SEEDS)
def test_vocab_coverage_matches_python_oracle(spark, tmp_path, seed):
    rnd = random.Random(seed)
    # Zipf-ish skew: word w{k} drawn with weight ~ 1/(k+1)
    vocab = [f"w{k}" for k in range(rnd.randint(5, 60))]
    weights = [1.0 / (k + 1) for k in range(len(vocab))]
    rows, counts = [], {}
    for i in range(rnd.randint(3, 25)):
        words = rnd.choices(vocab, weights=weights, k=rnd.randint(1, 120))
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        rows.append((i, " ".join(words), "en", "src", 0))
    sf = _write_docs(spark, tmp_path / str(seed), rows)
    [r] = q_vocab_coverage_plan(spark, sf).collect()

    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert r["total_tokens"] == total
    assert r["distinct_words"] == len(counts)
    for ppm, col in ((COV95_PPM, "vocab_p95"), (COV99_PPM, "vocab_p99")):
        target, cum, want = _ceil_ppm(total, ppm), 0, None
        for rank, (_, c) in enumerate(ranked, start=1):
            cum += c
            if cum >= target:
                want = rank
                break
        assert r[col] == want, (ppm, target, ranked)


@pytest.mark.parametrize("seed", SEEDS)
def test_packing_capacity_matches_python_oracle(spark, tmp_path, seed):
    rnd = random.Random(seed)
    lens = [rnd.randint(1, 2000) for _ in range(rnd.randint(1, 40))]
    rows = [
        (i, " ".join(["t"] * n), "en", "src", 0) for i, n in enumerate(lens)
    ]
    sf = _write_docs(spark, tmp_path / str(seed), rows)
    got = {
        r["capacity"]: r for r in q_packing_capacity_plan(spark, sf).collect()
    }
    assert set(got) == set(_PACK_CAPACITIES)
    total = sum(lens)
    for c in _PACK_CAPACITIES:
        kept = sum(min(n, c) for n in lens)
        r = got[c]
        assert (r["n_docs"], r["real_tokens"], r["kept_tokens"]) == (
            len(lens), total, kept,
        )
        assert r["truncated_ppm"] == (total - kept) * 1_000_000 // total
        assert (
            r["pad_waste_ppm"]
            == (len(lens) * c - kept) * 1_000_000 // (len(lens) * c)
        )


@pytest.mark.parametrize("seed", SEEDS)
def test_session_gap_matches_python_oracle(spark, tmp_path, seed):
    rnd = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows, per_user = [], {}
    eid = 0
    for u in range(rnd.randint(1, 6)):
        t_us = rnd.randint(0, 10**6)
        for _ in range(rnd.randint(2, 40)):
            # sub-second jitter ON PURPOSE: the gap must be the whole-
            # second boundary-crossing diff, not a float subtraction
            t_us += rnd.randint(1, 90 * 60 * 10**6)
            rows.append(
                (eid, base + dt.timedelta(microseconds=t_us), u, "e", 1.0, "{}")
            )
            per_user.setdefault(u, []).append(t_us)
            eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).pipe(spark.createDataFrame).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    [r] = q_session_gap_plan(spark, str(tmp_path)).collect()

    buckets = []
    for ts_list in per_user.values():
        ts_list.sort()
        for a, b in zip(ts_list, ts_list[1:]):
            gap_s = b // 10**6 - a // 10**6  # second-boundary crossings
            buckets.append(min(_GAP_CAP_MIN, gap_s // 60))
    buckets.sort()
    assert r["n_gaps"] == len(buckets)
    for ppm in _GAP_QUANTILES_PPM:
        want = buckets[_ceil_ppm(len(buckets), ppm) - 1]
        assert r[f"p{ppm // 10000}_gap_min"] == want, ppm
    assert r["recommended_timeout_min"] == r["p95_gap_min"]


@pytest.mark.parametrize("seed", SEEDS)
def test_threshold_sensitivity_matches_python_oracle(spark, tmp_path, seed):
    from parallelutilities_jl_spark.operators.dedup import (
        SHINGLE_K,
        q_dedup_threshold_sensitivity,
    )

    rnd = random.Random(seed)
    vocab = [f"w{k}" for k in range(12)]
    # near-dup-heavy corpus: a few base docs, each emitted several
    # times with light point mutations — guarantees pairs across the
    # whole decile range
    bases = [
        [rnd.choice(vocab) for _ in range(rnd.randint(6, 30))]
        for _ in range(rnd.randint(2, 4))
    ]
    docs, i = {}, 0
    for base in bases:
        for _ in range(rnd.randint(2, 4)):
            ws = list(base)
            for _ in range(rnd.randint(0, 3)):
                ws[rnd.randrange(len(ws))] = rnd.choice(vocab)
            docs[i] = ws
            i += 1
    rows = [(i, " ".join(ws), "en", "src", 0) for i, ws in docs.items()]
    sf = _write_docs(spark, tmp_path / str(seed), rows)
    got = {
        r["tau_e1"]: (r["n_pairs"], r["n_docs_affected"])
        for r in q_dedup_threshold_sensitivity(spark, sf).collect()
    }

    shs = {
        i: {
            " ".join(ws[j : j + SHINGLE_K])
            for j in range(len(ws) - SHINGLE_K + 1)
        }
        for i, ws in docs.items()
        if len(ws) >= SHINGLE_K
    }
    deciles, dmax = [], {}
    ids = sorted(shs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = shs[ids[x]], shs[ids[y]]
            ni = len(a & b)
            if ni == 0:
                continue  # no shared shingle -> never a candidate
            un = len(a | b)
            if ni * 10 < un:
                continue  # below the lowest studied decile
            d = min(9, (ni * 10) // un)
            deciles.append(d)
            for doc in (ids[x], ids[y]):
                dmax[doc] = max(dmax.get(doc, 0), d)
    for t in range(1, 10):
        want_pairs = sum(1 for d in deciles if d >= t)
        want_docs = sum(1 for d in dmax.values() if d >= t)
        assert got[t] == (want_pairs, want_docs), t
    # sanity on the randomized draw: the tiny vocab must actually
    # produce qualifying pairs, or the test proved nothing
    assert deciles, "randomized corpus produced no qualifying pairs"

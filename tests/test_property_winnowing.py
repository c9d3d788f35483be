"""Hypothesis property sweep over the winnowing key algebra — the
int64 encoding (key = h*C - pos; decode by ceil-div) that lets both
engines run the (min hash, rightmost pos) argmin as a plain integer
MIN. Checked against a direct reference implementation of the SIGMOD
2003 selection rule on random hash sequences (no Spark needed: the
algebra is engine-independent; the engines' agreement on it is what
the oracle checks)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parallelutilities_jl_spark.operators.text import (
    WINNOW_C,
    WINNOW_W,
)


def _reference_select(hs: list[int], w: int) -> set[tuple[int, int]]:
    """Directly apply the winnowing rule: per window, the minimum hash,
    rightmost position on ties. Returns {(pos_1based, hash)}."""
    out = set()
    for s in range(len(hs) - w + 1):
        win = hs[s : s + w]
        m = min(win)
        rightmost = max(i for i, h in enumerate(win) if h == m)
        out.add((s + rightmost + 1, m))
    return out


@given(
    hs=st.lists(
        st.integers(0, 2**32 - 1), min_size=WINNOW_W, max_size=200
    )
)
@settings(max_examples=300)
def test_key_algebra_matches_reference_selection(hs):
    c = WINNOW_C
    keys = {
        min(hs[p - 1] * c - p for p in range(s + 1, s + WINNOW_W + 1))
        for s in range(len(hs) - WINNOW_W + 1)
    }
    decoded = {
        (((k + c - 1) // c) * c - k, (k + c - 1) // c) for k in keys
    }
    assert decoded == _reference_select(hs, WINNOW_W)


@given(
    h=st.integers(0, 2**32 - 1), pos=st.integers(1, WINNOW_C - 1)
)
@settings(max_examples=300)
def test_key_roundtrip_and_int64_bound(h, pos):
    c = WINNOW_C
    k = h * c - pos
    assert (k + c - 1) // c == h
    assert ((k + c - 1) // c) * c - k == pos
    assert -(2**63) <= k < 2**63  # int64-safe for the full hash range


@given(
    data=st.data(),
    h=st.integers(0, 2**32 - 1),
)
@settings(max_examples=200)
def test_ordering_min_hash_then_rightmost(data, h):
    """key order == (hash asc, pos desc): same hash -> larger pos wins
    the MIN; smaller hash always wins regardless of pos."""
    c = WINNOW_C
    p1 = data.draw(st.integers(1, c - 1))
    p2 = data.draw(st.integers(1, c - 1))
    if p1 != p2:
        lo, hi = sorted((p1, p2))
        assert h * c - hi < h * c - lo  # rightmost wins ties
    h2 = data.draw(st.integers(0, 2**32 - 1))
    if h2 > h:
        assert h * c - p1 < h2 * c - p2  # smaller hash dominates

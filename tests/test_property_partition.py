"""Hypothesis property sweeps over the partition math — the randomized
extension of the reference's exhaustive small-grid oracle checks
(reference test/productsplit.jl:24-57): the exhaustive (np ≤ 10) sweeps
live in test_productsplit.py; these push the same invariants into large
random parameter spaces pure-Python-side (no Spark session needed)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parallelutilities_jl_spark.plans.productsplit import (
    ProductSpec,
    nelementsdroptake,
    partition_of_index,
    whichproc,
)
from parallelutilities_jl_spark.sources.ranges import RangeSpec


@given(total=st.integers(0, 10**12), np=st.integers(1, 10**6))
@settings(max_examples=200)
def test_blocks_partition_the_range(total, np):
    # contiguous, exhaustive, balanced: the reference's load invariant
    pos = 0
    d, r = divmod(total, np)
    seen_takes = set()
    for p in range(1, min(np, 50) + 1):  # prefix…
        drop, take = nelementsdroptake(total, np, p)
        assert drop == pos
        assert take in (d, d + 1)
        pos += take
        seen_takes.add(take)
    # …and the closing block must land exactly at `total`
    drop, take = nelementsdroptake(total, np, np)
    assert drop + take == total


@given(
    total=st.integers(1, 10**12),
    np=st.integers(1, 10**6),
    data=st.data(),
)
@settings(max_examples=200)
def test_partition_of_index_inverts_block_rule(total, np, data):
    i0 = data.draw(st.integers(0, total - 1))
    p = partition_of_index(total, np, i0)
    drop, take = nelementsdroptake(total, np, p)
    assert drop <= i0 < drop + take


def _spec(data) -> ProductSpec:
    ndims = data.draw(st.integers(1, 4))
    ranges = tuple(
        RangeSpec(
            start=data.draw(st.integers(-50, 50)),
            step=data.draw(st.integers(1, 7)),
            length=data.draw(st.integers(1, 9)),
        )
        for _ in range(ndims)
    )
    return ProductSpec(ranges)


@given(data=st.data())
@settings(max_examples=200)
def test_encode_decode_roundtrip(data):
    spec = _spec(data)
    i0 = data.draw(st.integers(0, spec.total - 1))
    val = spec.decode(i0)
    assert spec.encode(val) == i0


@given(data=st.data())
@settings(max_examples=200)
def test_whichproc_owns_value(data):
    spec = _spec(data)
    np = data.draw(st.integers(1, 2 * spec.total))
    i0 = data.draw(st.integers(0, spec.total - 1))
    val = spec.decode(i0)
    p = whichproc(spec, val, np)
    ps = spec.split(np, p)
    assert val in ps


@given(data=st.data())
@settings(max_examples=100)
def test_split_metadata_matches_enumeration(data):
    spec = _spec(data)
    np = data.draw(st.integers(1, spec.total + 2))
    p = data.draw(st.integers(1, np))
    ps = spec.split(np, p)
    rows = list(ps)
    assert len(rows) == len(ps)
    if rows:
        for dim in range(spec.ndims):
            vals = {r[dim] for r in rows}
            assert ps.nelements(dim) == len(vals)
            assert ps.minimumelement(dim) == min(vals)
            assert ps.maximumelement(dim) == max(vals)
        assert ps.first_el == rows[0]
        assert ps.last_el == rows[-1]

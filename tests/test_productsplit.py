"""Exhaustive small-grid sweeps of the split descriptors against a
brute-force oracle — the reference's own test strategy
(reference test/productsplit.jl:19-57: all np in 1:10, p in 1:np, over a
matrix of range shapes, with an independent take/drop reimplementation).
"""

from __future__ import annotations

import itertools
import math

import pytest

from parallelutilities_jl_spark.plans.productsplit import (
    ProductSection,
    ProductSpec,
    ProductSplit,
    ZipSplit,
    nelementsdroptake,
    partition_of_index,
    procrange_recast,
    whichproc,
    whichproc_localindex,
)
from parallelutilities_jl_spark.sources.ranges import RangeSpec, rng

# the reference's iterator matrix (test/productsplit.jl:19-20 / FIXTURES.md §A)
SPECS = {
    "prod_1d": ProductSpec((rng(1, 10),)),
    "prod_1d_step": ProductSpec((rng(1, 9, 2),)),
    "prod_2d": ProductSpec((rng(1, 10), rng(4, 6))),
    "prod_2d_step": ProductSpec((rng(1, 9, 2), rng(4, 6))),
    "prod_3d": ProductSpec((rng(1, 10), rng(4, 6), rng(1, 4))),
    "prod_mixed": ProductSpec((rng(1, 2), rng(1, 4), rng(1, 10, 3))),
    "prod_float": ProductSpec((rng(1.0, 3.0, 0.5), rng(2, 4))),
}


def brute_elements(spec: ProductSpec) -> list[tuple]:
    """Reverse-lexicographic enumeration: first range varies fastest."""
    rev = itertools.product(*[r.values() for r in reversed(spec.ranges)])
    return [tuple(reversed(t)) for t in rev]


def brute_split(spec: ProductSpec, np: int, p: int) -> list[tuple]:
    """Independent take/drop oracle (mirrors reference
    test/productsplit.jl:24-38)."""
    els = brute_elements(spec)
    total = len(els)
    d, r = divmod(total, np)
    sizes = [d + 1 if k < r else d for k in range(np)]
    start = sum(sizes[: p - 1])
    return els[start : start + sizes[p - 1]]


@pytest.mark.parametrize("name", sorted(SPECS))
def test_enumeration_matches_bruteforce(name):
    spec = SPECS[name]
    els = brute_elements(spec)
    assert spec.total == len(els)
    assert [spec.decode(i) for i in range(spec.total)] == els
    # encode is the inverse
    for i, el in enumerate(els):
        assert spec.encode(el) == i


@pytest.mark.parametrize("name", sorted(SPECS))
def test_split_sweep(name):
    spec = SPECS[name]
    for np in range(1, 11):
        seen = []
        for p in range(1, np + 1):
            ps = spec.split(np, p)
            expected = brute_split(spec, np, p)
            assert list(ps) == expected
            assert len(ps) == len(expected)
            if expected:
                assert ps.first_el == expected[0]
                assert ps.last_el == expected[-1]
                assert ps[0] == expected[0]
                assert ps[len(ps) - 1] == expected[-1]
            seen.extend(expected)
        assert seen == brute_elements(spec)  # partition = cover, no overlap


def test_empty_splits_when_np_exceeds_total():
    spec = ProductSpec((rng(1, 1),))
    for np in (2, 5, 10):
        for p in range(2, np + 1):
            assert spec.split(np, p).is_empty
        assert not spec.split(np, 1).is_empty


@pytest.mark.parametrize("name", sorted(SPECS))
def test_metadata_o1_vs_bruteforce(name):
    spec = SPECS[name]
    for np in (1, 2, 3, 5, 7, 10):
        for p in range(1, np + 1):
            ps = spec.split(np, p)
            els = list(ps)
            if not els:
                continue
            for d in range(spec.ndims):
                vals = [e[d] for e in els]
                assert ps.nelements(d) == len(set(vals)), (name, np, p, d)
                assert ps.minimumelement(d) == min(vals)
                assert ps.maximumelement(d) == max(vals)
                assert ps.extremaelement(d) == (min(vals), max(vals))
            assert ps.extremadims() == tuple(
                (min(e[d] for e in els), max(e[d] for e in els))
                for d in range(spec.ndims)
            )


@pytest.mark.parametrize("name", sorted(SPECS))
def test_membership_and_lookup(name):
    spec = SPECS[name]
    els = brute_elements(spec)
    for np in (1, 3, 7):
        for p in range(1, np + 1):
            ps = spec.split(np, p)
            mine = set(list(ps))
            for i, el in enumerate(els):
                assert (el in ps) == (el in mine)
                li = ps.localindex(el)
                if el in mine:
                    assert ps[li - 1] == el
                else:
                    assert li is None
        # ownership
        for i, el in enumerate(els):
            p = whichproc(spec, el, np)
            assert p == partition_of_index(spec.total, np, i)
            assert el in spec.split(np, p)
            rank, li = whichproc_localindex(spec, el, np)
            assert rank == p and spec.split(np, p)[li - 1] == el
    # off-grid probes
    off = tuple(r.start - r.step for r in spec.ranges)
    assert whichproc(spec, off, 3) is None
    assert off not in spec.split(3, 1)


def test_extrema_commonlastdim_matches_reference_docstring():
    # reference src/productsplit.jl:664-691 doctest
    spec = ProductSpec((rng(1, 3), rng(4, 7), rng(2, 7)))
    ps = spec.split(10, 2)
    mins, maxs = ps.extrema_commonlastdim()
    assert mins == [(1, 2), (6, 2)]
    assert maxs == [(3, 3), (5, 3)]


def test_extrema_commonlastdim_bruteforce_sweep():
    spec = SPECS["prod_3d"]
    for np in (1, 2, 5, 7):
        for p in range(1, np + 1):
            ps = spec.split(np, p)
            if ps.is_empty:
                continue
            els = list(ps)
            lastmin = min(e[-1] for e in els)
            lastmax = max(e[-1] for e in els)
            mins, maxs = ps.extrema_commonlastdim()
            for d in range(spec.ndims - 1):
                assert mins[d] == (
                    min(e[d] for e in els if e[-1] == lastmin),
                    lastmin,
                )
                assert maxs[d] == (
                    max(e[d] for e in els if e[-1] == lastmax),
                    lastmax,
                )


def test_nelements_reference_docstring():
    # reference src/productsplit.jl:380-405 doctest
    spec = ProductSpec((rng(1, 5), rng(2, 4), rng(1, 3)))
    ps = spec.split(7, 3)
    assert list(ps) == [
        (5, 4, 1), (1, 2, 2), (2, 2, 2), (3, 2, 2), (4, 2, 2), (5, 2, 2), (1, 3, 2),
    ]
    assert ps.nelements(0) == 5
    assert ps.nelements(1) == 3
    assert ps.nelements(2) == 2


def test_dropleading_reference_docstring():
    # reference src/productsplit.jl:940-968 doctest
    spec = ProductSpec((rng(1, 5), rng(2, 4), rng(1, 3)))
    ps = spec.split(7, 3)
    sec = ps.dropleading()
    assert list(sec) == [(4, 1), (2, 2), (3, 2)]


def test_procrange_recast_reference_docstring():
    # reference src/productsplit.jl:820-868 doctest
    spec = ProductSpec((rng(1, 10), rng(4, 6), rng(1, 4)))
    ps = spec.split(5, 2)
    assert procrange_recast(ps, 10) == range(3, 5)  # Julia 3:4


@pytest.mark.parametrize("name", sorted(SPECS))
def test_procrange_recast_sweep(name):
    spec = SPECS[name]
    for np_old, np_new in [(3, 7), (5, 2), (4, 10)]:
        for p in range(1, np_old + 1):
            ps = spec.split(np_old, p)
            if ps.is_empty:
                continue
            rg = procrange_recast(ps, np_new)
            owners = sorted({whichproc(spec, el, np_new) for el in ps})
            assert rg == range(min(owners), max(owners) + 1)


def test_localindex_reference_docstring():
    # reference src/productsplit.jl:891-896 doctest
    spec = ProductSpec((rng(1, 3), rng(4, 20, 5)))
    ps = spec.split(3, 2)
    assert list(ps) == [(2, 9), (3, 9), (1, 14), (2, 14)]
    assert ps.localindex((3, 9)) == 2


def test_halve():
    spec = SPECS["prod_3d"]
    ps = spec.split(3, 1)
    left, right = ps.halve()
    assert list(left) + list(right) == list(ps)


def test_zipsplit_sweep():
    ranges = (rng(1, 12), rng(5, 16), rng(0, 11))
    zipped = list(zip(*[r.values() for r in ranges]))
    for np in range(1, 8):
        seen = []
        for p in range(1, np + 1):
            zs = ZipSplit(ranges, np, p)
            seen.extend(list(zs))
        assert seen == zipped


def test_nelementsdroptake_properties():
    for total in (1, 7, 10, 120):
        for np in range(1, 15):
            takes = []
            pos = 0
            for p in range(1, np + 1):
                drop, take = nelementsdroptake(total, np, p)
                assert drop == pos
                pos += take
                takes.append(take)
            assert sum(takes) == total
            assert max(takes) - min(takes) <= 1
            assert sorted(takes, reverse=True) == takes


@pytest.mark.parametrize("name", sorted(SPECS))
def test_halve_descriptor_sweep(name):
    """`halve` (reference src/productsplit.jl:221-233): the two halves
    partition the section's elements in order, first half gets the
    midpoint; swept over every (np, p) like the split sweep."""
    spec = SPECS[name]
    for np in range(1, 11):
        for p in range(1, np + 1):
            sec = spec.split(np, p)
            want = brute_split(spec, np, p)
            if not want:
                continue  # empty splits raise on element access
            h1, h2 = sec.halve()
            n1 = h1.last0 - h1.first0 + 1
            got = want[:n1]
            assert h1.first0 == sec.first0 and h2.last0 == sec.last0
            assert h1.last0 + 1 == h2.first0
            # first half is the larger on odd lengths (mid rounds down
            # from (first0+last0)/2 -> ceil(n/2) elements)
            assert n1 == (len(want) + 1) // 2
            assert list(h1) == got
            assert list(h2) == want[n1:]

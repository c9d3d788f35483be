"""Randomized edge-shape checks for the round-6 relational ops, run on
SYNTHETIC parquet fixtures the real corpus never exercises: exact-touch
interval boundaries, duplicate timestamps, single-event users, duplicate
(price, size) skyline points, all-equal-price columns. The op under test
is the real distributed query (reading a temp fixture dir through
load_table); the oracle is definitional pure Python."""

from __future__ import annotations

import datetime
import os
import random
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parallelutilities_jl_spark.operators.relational import (
    ISLAND_GAP_SECS,
    q_interval_islands,
    q_skyline_parts,
)

EPOCH0 = int(
    datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
)


def _island_cases():
    rnd = random.Random(20260814)
    cases = []
    # random spread with collisions and exact-touch gaps
    times = []
    for u in range(6):
        t = EPOCH0
        for _ in range(rnd.randint(1, 40)):
            step = rnd.choice(
                [0, 1, ISLAND_GAP_SECS, ISLAND_GAP_SECS + 1, 7200]
            )
            t += step
            times.append((u, t))
    cases.append(("touchy", times))
    # single-event users + duplicate timestamps
    cases.append(
        ("dupes", [(0, EPOCH0), (0, EPOCH0), (1, EPOCH0 + 5), (2, EPOCH0)])
    )
    return cases


@pytest.mark.parametrize(
    "label,times", _island_cases(), ids=[c[0] for c in _island_cases()]
)
def test_interval_islands_on_synthetic_shapes(spark, label, times):
    stage = tempfile.mkdtemp(prefix="pu_prop_events_")
    try:
        n = len(times)
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [t * 1_000_000 for _, t in times],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _ in times], pa.int64()),
                "event_type": pa.array(["x"] * n),
                "value": pa.array([1.0] * n),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(tbl, os.path.join(stage, "events.parquet"))
        got = {
            r.user_id: (r.n_islands, r.covered_secs, r.longest_secs)
            for r in q_interval_islands(spark, stage).collect()
        }
        # definitional sweep-merge per user ("touching merges": an event
        # at exactly prev_end extends the island)
        by_user: dict[int, list[int]] = {}
        for u, t in times:
            by_user.setdefault(u, []).append(t)
        for u, ts in by_user.items():
            isl: list[tuple[int, int]] = []
            for t in sorted(ts):
                e = t + ISLAND_GAP_SECS
                if isl and t <= isl[-1][1]:
                    isl[-1] = (isl[-1][0], max(isl[-1][1], e))
                else:
                    isl.append((t, e))
            want = (
                len(isl),
                sum(e - s for s, e in isl),
                max(e - s for s, e in isl),
            )
            assert got[u] == want, f"{label} user {u}"
        assert set(got) == set(by_user)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _skyline_cases():
    rnd = random.Random(20260815)
    pts = [
        (i, rnd.randint(1, 8), round(rnd.randint(100, 120) / 4, 2))
        for i in range(120)
    ]
    return [
        ("ties", pts),  # heavy duplicate (price, size) mass
        ("flat", [(i, i % 5 + 1, 9.99) for i in range(30)]),  # one price
        (
            "chain",
            [(i, i + 1, float(i + 1)) for i in range(25)],
        ),  # all points on the frontier
    ]


@pytest.mark.parametrize(
    "label,pts", _skyline_cases(), ids=[c[0] for c in _skyline_cases()]
)
def test_skyline_on_synthetic_shapes(spark, label, pts):
    stage = tempfile.mkdtemp(prefix="pu_prop_part_")
    try:
        tbl = pa.table(
            {
                "p_partkey": pa.array([k for k, _, _ in pts], pa.int64()),
                "p_name": pa.array(["x y"] * len(pts)),
                "p_brand": pa.array(["b"] * len(pts)),
                "p_type": pa.array(["t"] * len(pts)),
                "p_size": pa.array([s for _, s, _ in pts], pa.int32()),
                "p_retailprice": pa.array(
                    [p for _, _, p in pts], pa.float64()
                ),
            }
        )
        pq.write_table(tbl, os.path.join(stage, "part.parquet"))
        got = {
            r.p_partkey for r in q_skyline_parts(spark, stage).collect()
        }
        want = set()
        for k, s, p in pts:
            pc = round(p * 100)
            dominated = any(
                (pc2 <= pc and s2 >= s and (pc2 < pc or s2 > s))
                for k2, s2, p2 in pts
                if (pc2 := round(p2 * 100)) is not None and k2 != k
            )
            if not dominated:
                want.add(k)
        assert got == want, label
        assert want  # non-vacuous
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_fk_orphan_census_counts_deliberate_violations(spark):
    """The fixture schema has referential integrity, so every fixture
    n_orphans is 0 — this synthetic star schema has DELIBERATE orphans
    and null keys on every edge, pinning the count logic (orphan =
    non-null child key with no parent; nulls excluded)."""
    from parallelutilities_jl_spark.operators.relational import (
        q_fk_orphan_census,
    )

    stage = tempfile.mkdtemp(prefix="pu_prop_fk_")
    try:
        def w(name, cols):
            pq.write_table(
                pa.table(cols), os.path.join(stage, f"{name}.parquet")
            )

        w("nation", {"n_nationkey": pa.array([0, 1], pa.int64())})
        w(
            "customer",
            {
                "c_custkey": pa.array([10, 11, 12, 13], pa.int64()),
                "c_nationkey": pa.array([0, 1, 7, None], pa.int64()),
            },
        )
        w(
            "supplier",
            {
                "s_suppkey": pa.array([20, 21], pa.int64()),
                "s_nationkey": pa.array([0, 9], pa.int64()),
            },
        )
        w("part", {"p_partkey": pa.array([100, 101], pa.int64())})
        w(
            "orders",
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([10, 11, 99, None, 12], pa.int64()),
            },
        )
        w(
            "lineitem",
            {
                "l_orderkey": pa.array(
                    [1, 1, 2, 77, None, 5], pa.int64()
                ),
                "l_partkey": pa.array(
                    [100, 555, 101, 100, 101, None], pa.int64()
                ),
            },
        )
        got = {
            r.fk_edge: (r.n_rows, r.n_keys, r.n_orphans)
            for r in q_fk_orphan_census(spark, stage).collect()
        }
        assert got == {
            # 6 rows; distinct non-null orderkeys {1,2,77,5}; orphan: 77
            "lineitem.orderkey->orders": (6, 4, 1),
            # distinct non-null partkeys {100,555,101}; orphan: 555
            "lineitem.partkey->part": (6, 3, 1),
            # custkeys {10,11,99,12}; orphan: 99
            "orders.custkey->customer": (5, 4, 1),
            # nationkeys {0,1,7}; orphan: 7
            "customer.nationkey->nation": (4, 3, 1),
            # nationkeys {0,9}; orphan: 9
            "supplier.nationkey->nation": (2, 2, 1),
        }
    finally:
        shutil.rmtree(stage, ignore_errors=True)

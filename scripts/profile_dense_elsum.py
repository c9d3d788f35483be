#!/usr/bin/env python
"""Micro-bench for pmapreduce_dense_elsum tuning: sweeps
(num_partitions, n_chunks) at the reference's published shape
(10_000x1_000 doubles x 32 tasks, docs/src/index.md:22-46) and prints
median-of-3 wall per variant. Run on an otherwise idle box."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from parallelutilities_jl_spark.operators.mapreduce import (  # noqa: E402
    pmapreduce_dense_elsum,
)
from parallelutilities_jl_spark.session import get_spark  # noqa: E402

SHAPE = (10_000, 1_000)
N_TASKS = 32
VARIANTS = [
    (8, 16),   # round-5 winner so far
    (8, 8),
    (4, 16),
    (16, 16),
    (4, 8),
    (8, 12),
    (8, 16),   # repeat winner to gauge run-to-run noise
]


def main() -> None:
    spark = get_spark(app_name="pu_prof_elsum")
    for np_, nc in VARIANTS:
        # warm
        pmapreduce_dense_elsum(
            spark, N_TASKS, lambda i: np.ones(SHAPE),
            num_partitions=np_, n_chunks=nc,
        )
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = pmapreduce_dense_elsum(
                spark, N_TASKS, lambda i: np.ones(SHAPE),
                num_partitions=np_, n_chunks=nc,
            )
            reps.append(time.perf_counter() - t0)
            assert out[0, 0] == N_TASKS
        print(
            f"parts={np_:2d} chunks={nc:2d} "
            f"median={statistics.median(reps):.3f}s "
            f"min={min(reps):.3f} max={max(reps):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

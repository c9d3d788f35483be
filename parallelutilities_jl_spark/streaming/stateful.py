"""Custom stateful streaming operators via `applyInPandasWithState` —
the extension point for semantics Structured Streaming's built-ins can't
express (the Spark analog of the reference's bring-your-own-`op`
reduction surface, reference src/mapreduce.jl:104-124, generalized to
unbounded streams).

State lives in the state store (checkpointed, per-key, executor-local);
the user function sees Arrow batches per key per trigger. At scale the
cardinality of the key column bounds state size — pair with watermark
timeouts (`GroupStateTimeout.EventTimeTimeout`) to expire idle keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def running_count_per_key(grouped_stream, key_col: str = "user_id") -> DataFrame:
    """Per-key running event count: the minimal custom stateful operator
    (state = one counter per key, output = updated totals each trigger).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        count = state.getOption[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({key_col: [key[0]], "n": [count]})

    return grouped_stream.applyInPandasWithState(
        fn,
        f"{key_col} long, n long",
        "n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def running_topk_per_key(
    grouped_stream,
    k: int = 3,
    key_col: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key running top-k: state is the bounded k-item leaderboard
    (two parallel arrays in the state store), merged with each trigger's
    batch and re-emitted — the template for any bounded-sketch state
    (heaps, HLL registers, CMS rows). Ties break on the lower event id,
    so the leaderboard is deterministic regardless of batch split.
    State per key is O(k) forever — safe at any stream length."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            vals, ids = state.get
            items = list(zip(list(vals), list(ids)))
        else:
            items = []
        for pdf in pdfs:
            items.extend(
                zip(pdf[val_col].astype(float), pdf[id_col].astype(int))
            )
        # top-k by (value desc, id asc) — deterministic under any
        # batch boundary placement
        items.sort(key=lambda t: (-t[0], t[1]))
        items = items[:k]
        state.update(([v for v, _ in items], [i for _, i in items]))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(items),
                "rnk": list(range(1, len(items) + 1)),
                id_col: [i for _, i in items],
                val_col: [v for v, _ in items],
            }
        )

    return grouped_stream.applyInPandasWithState(
        fn,
        f"{key_col} long, rnk long, {id_col} long, {val_col} double",
        "vals array<double>, ids array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def running_sum_per_key(
    grouped_stream, key_col: str = "user_id", val_col: str = "value"
) -> DataFrame:
    """Per-key running sum with count — a two-field state tuple; the
    template for richer accumulators (sketches, top-k heaps, model
    partials)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            total, n = state.get
        else:
            total, n = 0.0, 0
        for pdf in pdfs:
            total += float(pdf[val_col].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {key_col: [key[0]], "total": [total], "n": [n]}
        )

    return grouped_stream.applyInPandasWithState(
        fn,
        f"{key_col} long, total double, n long",
        "total double, n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )


EWMA_ALPHA_DEN = 8  # α = 1/8: a' = (x + (den-1)·a) div den, exact int64


def running_ewma_per_key(
    grouped_stream,
    key_col: str = "user_id",
    val_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key integer fixed-point EWMA — the recursive per-element fold
    a' = (x + {EWMA_ALPHA_DEN-1}·a) div {EWMA_ALPHA_DEN} that batch SQL
    cannot express without recursion (no window frame computes a value
    that depends on its own previous OUTPUT), and the metric every
    monitoring pipeline smooths with. Values quantize to int64 e6 units
    (floor(v·10⁶) — bit-deterministic), so the fold is exact integer
    arithmetic: the result is a pure function of the per-key event
    sequence, independent of where trigger boundaries fall.

    State per key is O(1) forever: the current accumulator + count.
    Rows are folded in (ts, event_id) order WITHIN each trigger;
    cross-trigger order is arrival order, so the operator assumes an
    in-order-per-key stream (pair with watermark-driven reordering
    upstream for out-of-order sources) — the pinned invariant is
    batch-boundary independence, tested by feeding the same in-order
    stream in 1 vs N micro-batches."""
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            acc, n = state.get
            acc = int(acc)
            n = int(n)
        else:
            acc, n = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            for v in pdf[val_col]:
                x = math.floor(float(v) * 1_000_000)
                acc = (
                    x
                    if acc is None
                    else (x + (EWMA_ALPHA_DEN - 1) * acc)
                    // EWMA_ALPHA_DEN
                )
                n += 1
        if acc is not None:
            state.update((acc, n))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "ewma_e6": [acc]}
            )

    return grouped_stream.applyInPandasWithState(
        fn,
        f"{key_col} long, n long, ewma_e6 long",
        "acc long, n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )

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

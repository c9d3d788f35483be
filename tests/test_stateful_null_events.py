"""NULL `value` events must not break engine parity for the stateful
batch-parity queries: without the shared NOT-NULL filter, Spark's
CASE-seeded aggregate fold RESETS its accumulator on the element after
a NULL while DuckDB's list_reduce stays NULL (and DESC NULL placement
differs in window ordering). Both sides now exclude NULL-value rows;
this pins parity on a corpus that actually contains them."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@pytest.fixture(scope="module")
def null_events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_events")
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        # every 3rd event has a NULL value; two users
        val = None if i % 3 == 0 else float(i) + 0.25
        rows.append(
            (i, t0 + dt.timedelta(minutes=i), i % 2, "click", val, "{}")
        )
    # NULL-ts rows (value also NULL so the four value-keyed queries'
    # row censuses are unchanged): the sessionizer class — a NULL ts
    # has no position in time, so batch (`ts IS NOT NULL`), oracle,
    # AND the streaming state fold (pd.isna skip — without it
    # pd.Timestamp(NaT).value is the int64-min sentinel and corrupts
    # every subsequent gap) must all drop it identically.
    for i in range(20, 24):
        rows.append((i, None, i % 2, "click", None, "{}"))
    spark.createDataFrame(rows, EV_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname",
    [
        "stateful_running_count",
        "stateful_running_sum",
        "stateful_topk",
        "stateful_ewma",
        "stateful_sessions",
    ],
)
def test_null_values_keep_engine_parity(spark, null_events, qname):
    from parallelutilities_jl_spark.streaming import stateful as ST

    sdf = ST.QUERIES[qname](spark, null_events)
    cols = sorted(sdf.columns)
    s_rows = sorted(
        tuple(r[c] for c in cols) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{null_events}/events.parquet/*.parquet'"
    )
    res = con.execute(ST.ORACLES[qname])
    d_cols = [d[0] for d in res.description]
    d_rows = sorted(
        tuple(row[d_cols.index(c)] for c in cols)
        for row in res.fetchall()
    )
    con.close()
    assert s_rows == d_rows and s_rows
    # non-vacuous: NULL rows exist and are excluded from the fold
    if qname == "stateful_running_count":
        # 20 events, 7 NULL -> 13 per-event rows
        assert len(s_rows) == 13


def test_sessions_streaming_skips_null_ts(spark, null_events):
    """The STREAMING sessionizer must drop NULL-ts events exactly as
    its batch twin's `ts IS NOT NULL` filter does — final streamed
    state ≡ registered batch query on a corpus where the class is
    reachable."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parallelutilities_jl_spark.streaming import stateful as ST
    from test_stateful_parity import _run_stream

    t = pq.read_table(f"{null_events}/events.parquet")
    # Spark wrote ts as INT96 → arrow ns; the stream reader wants the
    # driver fixture's timestamp[us] physical type
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("us")),
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    rows = _run_stream(
        spark, t, ST.running_sessions_per_key, "sp_sess_nullts"
    )
    got = {r["user_id"]: (r["n_sessions"], r["last_n"]) for r in rows}
    want = {
        r["user_id"]: (r["n_sessions"], r["last_n"])
        for r in ST.q_stateful_sessions(spark, null_events).collect()
    }
    assert got == want and got

"""The int64-quantized money fast path (relational._e2/_two_tier_sums)
rests on one data invariant — every money column is a 2-decimal-exact
double — and one algebraic one — two-tier integer totals equal a direct
exact sum. Pin both so fixture drift or a helper regression fails here
before the driver's correctness gate sees it."""

import math
from decimal import Decimal

import duckdb
import pytest
from hypothesis import given, strategies as st
from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.relational import (
    _e2,
    _two_tier_sums,
)

MONEY_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    # c_acctbal/s_acctbal include negatives: FLOOR(x*100 + 0.5) is still
    # the exact representation (inputs are never near a .5 boundary)
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "events": ["value"],
}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
@pytest.mark.parametrize(
    "table,cols", MONEY_COLS.items(), ids=list(MONEY_COLS)
)
def test_fixture_money_columns_are_2dp_exact(sf, table, cols):
    con = duckdb.connect()
    path = f"/root/testdata/{sf}/{table}.parquet"
    for c in cols:
        bad = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            f"WHERE {c} <> FLOOR({c} * 100 + 0.5) / 100"
        ).fetchone()[0]
        assert bad == 0, (
            f"{table}.{c} at {sf} has {bad} non-2dp values: the "
            f"_e2 int64 quantization in relational.py is no longer exact"
        )


@given(
    st.decimals(
        min_value=Decimal("-99999999.99"),
        max_value=Decimal("99999999.99"),
        places=2,
        allow_nan=False,
        allow_infinity=False,
    )
)
def test_floor_quantization_exact_for_all_2dp_values(d):
    """The numeric core of _e2: for ANY 2-dp decimal value (negatives and
    the full money magnitude range included), FLOOR(double(x)*100 + 0.5)
    recovers the exact integer hundredths — the double representation
    error can never reach the 0.5 offset at these magnitudes."""
    assert math.floor(float(d) * 100 + 0.5) == int(d.scaleb(2))


def test_two_tier_matches_direct_decimal_sum(spark):
    df = (
        spark.range(0, 10_000, 1, 8)
        .select(
            (F.col("id") % 7).alias("k"),
            ((F.col("id") % 997) / 100.0).alias("x"),
        )
    )
    got = (
        _two_tier_sums(df, ["k"], {"t": _e2(F.col("x"))}, {"n": None})
        .orderBy("k")
        .collect()
    )
    want = (
        df.groupBy("k")
        .agg(
            F.sum(F.col("x").cast("decimal(28,6)")).alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("k")
        .collect()
    )
    assert len(got) == len(want) == 7
    for g, w in zip(got, want):
        assert g["k"] == w["k"] and g["n"] == w["n"]
        # exact: int64 cents total == decimal total * 100
        assert int(g["t"]) == int(w["t"] * 100)


def test_two_tier_empty_global_input_matches_sql_semantics(spark):
    """Global agg over zero rows: SUM -> NULL, COUNT(*) -> 0 (one row),
    exactly what the DuckDB oracle produces for the same shape."""
    df = spark.range(0, 100, 1, 4).select(
        (F.col("id") / 10.0).alias("x")
    ).filter(F.col("id") < -1)
    rows = _two_tier_sums(
        df, [], {"t": _e2(F.col("x"))}, {"n": None}
    ).collect()
    assert len(rows) == 1
    assert rows[0]["t"] is None and rows[0]["n"] == 0


def test_two_tier_exact_under_10x_replication(spark):
    """Volume-growth exactness: replicating the fact table 10x must give
    EXACTLY 10x each integer total (decimal merge never rounds), the
    property that makes the two-tier path safe to extrapolate to 100 TB."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

    def totals(df):
        rows = _two_tier_sums(
            df,
            ["l_returnflag"],
            {"t": _e2(F.col("l_extendedprice"))},
            {"n": None},
        ).collect()
        return {r["l_returnflag"]: (int(r["t"]), r["n"]) for r in rows}

    base = totals(li)
    rep = li.crossJoin(F.broadcast(spark.range(10)))
    big = totals(rep)
    assert set(base) == set(big)
    for k, (t, n) in base.items():
        assert big[k] == (10 * t, 10 * n)


def test_two_tier_cube_matches_raw_cube(spark):
    df = spark.range(0, 5_000, 1, 8).select(
        (F.col("id") % 3).alias("a"),
        (F.col("id") % 2).alias("b"),
        ((F.col("id") % 101) / 100.0).alias("x"),
    )
    got = {
        (r["a"], r["b"]): int(r["t"])
        for r in _two_tier_sums(
            df, ["a", "b"], {"t": _e2(F.col("x"))}, cube=True
        ).collect()
    }
    want = {
        (r["a"], r["b"]): int(r["t"] * 100)
        for r in df.cube("a", "b")
        .agg(F.sum(F.col("x").cast("decimal(28,6)")).alias("t"))
        .collect()
    }
    assert got == want

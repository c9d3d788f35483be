"""Three-way equivalence: Spark closed-form expressions ≡ DuckDB oracle
SQL ≡ pure-Python descriptors, over the reference's fixture matrix."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.plans import dataframe as pdf
from parallelutilities_jl_spark.plans import oracle as orc
from parallelutilities_jl_spark.plans.productsplit import ProductSpec
from parallelutilities_jl_spark.sources.ranges import rng
from tests.test_productsplit import SPECS, brute_elements


@pytest.mark.parametrize("name", ["prod_3d", "prod_float", "prod_mixed"])
def test_product_df_matches_python_and_duckdb(spark, name):
    spec = SPECS[name]
    np_parts = 5
    rows = (
        pdf.product_df(spark, spec, np=np_parts)
        .orderBy("i")
        .collect()
    )
    els = brute_elements(spec)
    assert len(rows) == spec.total
    for r in rows:
        assert spec.decode(r["i"]) == tuple(
            r[f"c{k + 1}"] for k in range(spec.ndims)
        )
        assert tuple(r[f"c{k + 1}"] for k in range(spec.ndims)) == els[r["i"]]
        drop_take_p = r["p"]
        assert els[r["i"]] in spec.split(np_parts, drop_take_p)
    duck = duckdb.sql(orc.product_cte(spec, np=np_parts) + " ORDER BY i").fetchall()
    spark_tuples = [tuple(r) for r in rows]
    assert spark_tuples == duck


def test_partition_expr_dynamic_np(spark):
    spec = SPECS["prod_3d"]
    base = pdf.product_df(spark, spec)
    nps = spark.range(1, 9).select(F.col("id").alias("np"))
    got = (
        base.crossJoin(nps)
        .select(
            "i",
            "np",
            pdf.partition_expr(spec.total, F.col("np"), F.col("i")).alias("p"),
        )
        .collect()
    )
    from parallelutilities_jl_spark.plans.productsplit import partition_of_index

    for r in got:
        assert r["p"] == partition_of_index(spec.total, r["np"], r["i"])


def test_droptake_exprs_match_python(spark):
    spec = SPECS["prod_3d"]
    grid = pdf.np_p_grid(spark, 10, spec.total).collect()
    from parallelutilities_jl_spark.plans.productsplit import nelementsdroptake

    seen = set()
    for r in grid:
        drop, take = nelementsdroptake(spec.total, r["np"], r["p"])
        assert (r["drop"], r["take"]) == (drop, take)
        seen.add((r["np"], r["p"]))
    # every non-empty (np, p) present
    for np in range(1, 11):
        for p in range(1, np + 1):
            _, take = nelementsdroptake(spec.total, np, p)
            assert ((np, p) in seen) == (take > 0)


@pytest.mark.parametrize("name", ["prod_3d", "prod_float"])
def test_window_metadata_exprs(spark, name):
    spec = SPECS[name]
    grid = pdf.np_p_grid(spark, 8, spec.total)
    f0 = F.col("drop")
    l0 = F.col("drop") + F.col("take") - 1
    cols = ["np", "p"]
    sel = [F.col("np"), F.col("p")]
    for d in range(spec.ndims):
        mn, mx = pdf.window_extrema_exprs(spec, d, f0, l0)
        sel += [
            pdf.window_nelements_expr(spec, d, f0, l0).alias(f"nel{d}"),
            mn.alias(f"mn{d}"),
            mx.alias(f"mx{d}"),
        ]
    rows = grid.select(*sel).collect()
    for r in rows:
        ps = spec.split(r["np"], r["p"])
        for d in range(spec.ndims):
            assert r[f"nel{d}"] == ps.nelements(d), (name, r)
            assert r[f"mn{d}"] == ps.minimumelement(d)
            assert r[f"mx{d}"] == ps.maximumelement(d)


@pytest.mark.parametrize("name", ["prod_3d", "prod_float", "prod_1d_step"])
def test_encode_exprs(spark, name):
    spec = SPECS[name]
    base = pdf.product_df(spark, spec)
    idx, valid = pdf.encode_exprs(
        spec, [F.col(c) for c in spec.colnames]
    )
    rows = base.select("i", idx.alias("enc"), valid.alias("ok")).collect()
    for r in rows:
        assert r["ok"] and r["enc"] == r["i"]
    # off-grid probe: shift first coordinate off the grid
    shifted = base.select(
        (F.col("c1") + F.lit(0.25 if spec.ranges[0].is_float else 1000)).alias("c1"),
        *[F.col(c) for c in spec.colnames[1:]],
    )
    idx2, valid2 = pdf.encode_exprs(spec, [F.col(c) for c in spec.colnames])
    assert shifted.select(valid2.alias("ok")).filter(F.col("ok")).count() == 0


def test_zip_df(spark):
    ranges = (rng(1, 12), rng(5, 16), rng(0.0, 5.5, 0.5))
    rows = pdf.zip_df(spark, ranges, np=4).orderBy("i").collect()
    expected = list(zip(*[r.values() for r in ranges]))
    assert [(r["z1"], r["z2"], r["z3"]) for r in rows] == expected
    duck = duckdb.sql(orc.zip_cte(ranges, np=4) + " ORDER BY i").fetchall()
    assert [tuple(r) for r in rows] == duck


def test_grid_cte_matches(spark):
    duck = duckdb.sql(
        f"SELECT np, p FROM ({orc.grid_cte(6)}) ORDER BY np, p"
    ).fetchall()
    expected = [(np, p) for np in range(1, 7) for p in range(1, np + 1)]
    assert duck == expected

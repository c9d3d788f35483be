"""Z-order layout: the tile-locality guarantee and the pruning it buys."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators import layout as L
from parallelutilities_jl_spark.sources.fixtures import load_table

TILE = 1 << (L.CELL_SHIFT // 2)  # 1024: per-dimension span of one z-cell


def test_zcell_tiles_bound_both_dimensions(spark, sf_dir):
    """Dropping 20 low Morton bits must leave 1024x1024 tiles: within
    any cell, neither dimension can span more than the tile width.
    This is the property that keeps per-file min/max tight on BOTH
    columns after a z-sorted write."""
    rows = L.q_zorder_cell_stats(spark, sf_dir).collect()
    assert rows, "no cells produced"
    for r in rows:
        assert r["max_x"] - r["min_x"] < TILE
        assert r["max_y"] - r["min_y"] < TILE
        # and tiles are aligned, not merely narrow
        assert r["min_x"] // TILE == r["max_x"] // TILE
        assert r["min_y"] // TILE == r["max_y"] // TILE


def test_zkey_roundtrip_bits(spark):
    """morton_key interleaves exactly: x occupies even bits, y odd."""
    df = spark.range(1).select(
        L.Z.morton_key(F.lit(0b1011), F.lit(0b0110)).alias("z")
    )
    z = df.collect()[0]["z"]
    # pairs (y_i, x_i) for i=3..0: (0,1)(1,0)(1,1)(0,1) -> 01 10 11 01
    assert z == 0b01101101


def test_zcell_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioning the write by z-cell turns a 2-D box predicate into
    directory-level partition pruning — the scan must carry a zcell
    PartitionFilter, not read all cells."""
    out = str(tmp_path / "orders_z")
    cells = L.with_zkey(L.order_dims(load_table(spark, sf_dir, "orders")))
    cells.write.mode("overwrite").partitionBy("zcell").parquet(out)

    target = cells.limit(1).collect()[0]["zcell"]
    scan = spark.read.parquet(out).where(F.col("zcell") == target)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zcell" in plan.split(
        "PartitionFilters"
    )[1][:200]
    assert scan.count() > 0

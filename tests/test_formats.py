"""Round-trip fidelity for the format connectors: every supported format
must reproduce rows exactly (values AND types) when its contract is
followed — schema pinned for text formats, carried by the file for
columnar ones."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.sources.fixtures import load_table
from parallelutilities_jl_spark.sources.formats import (
    FORMATS,
    convert,
    read_table,
    write_table,
)


@pytest.fixture(scope="module")
def outdir():
    d = tempfile.mkdtemp(prefix="pu_formats_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sorted_rows(df):
    return df.orderBy(*df.columns).collect()


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_typed_table(spark, sf_dir, outdir, fmt):
    # orders: longs, doubles, strings, timestamps — the fixture types
    src = load_table(spark, sf_dir, "orders")
    path = f"{outdir}/orders_{fmt}"
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_free_text(spark, sf_dir, outdir, fmt):
    # documents.text is free text — the field that breaks naive csv
    src = load_table(spark, sf_dir, "documents")
    path = f"{outdir}/docs_{fmt}"
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_text_read_requires_schema(spark, outdir):
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, f"{outdir}/x", "csv")


def test_convert_json_to_parquet(spark, sf_dir, outdir):
    src = load_table(spark, sf_dir, "nation")
    jpath, ppath = f"{outdir}/nation_json", f"{outdir}/nation_pq"
    write_table(src, jpath, "json")
    convert(spark, jpath, "json", ppath, "parquet", schema=src.schema)
    back = read_table(spark, ppath, "parquet")
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_columnar_scan_prunes_and_pushes(spark, sf_dir, outdir):
    """The reason parquet/orc are the data path: a filtered 2-column
    projection must reach the scan as PushedFilters + a pruned
    ReadSchema."""
    src = load_table(spark, sf_dir, "orders")
    for fmt in ("parquet", "orc"):
        path = f"{outdir}/orders_scan_{fmt}"
        write_table(src, path, fmt)
        q = (
            read_table(spark, path, fmt)
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_totalprice")
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(o_orderstatus)" in plan, plan
        assert "o_custkey" not in plan.split("ReadSchema")[1][:200], plan

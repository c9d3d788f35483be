"""Round-6 advice regression: a document LONGER than the top
2^PAD_BUCKET_MAX_EXP padding bucket used to make real_tokens exceed
padded_tokens, and the resulting negative waste_e6 diverged between
Spark `div` (truncates toward zero) and DuckDB `//` (floors). The fix
clamps token counts to the bucket ceiling in BOTH engines; this test
pins engine parity on exactly that previously-unreachable input."""

from __future__ import annotations

import duckdb
import pytest

from tests.test_messy_corpus import DOC_SCHEMA


@pytest.fixture(scope="module")
def longdoc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("longdoc")
    long_text = " ".join(f"w{i}" for i in range(5000))  # > 2^12 tokens
    rows = [
        (0, long_text, "en", "src0", len(long_text)),
        (1, "a short document", "en", "src0", 16),
        (2, " ".join(["tok"] * 4096), "en", "src1", 4 * 4096),  # exactly 2^12
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_padding_waste_parity_on_overlong_doc(spark, longdoc_dir):
    from parallelutilities_jl_spark.operators import text as T

    sdf = T.q_padding_waste_buckets(spark, longdoc_dir)
    s_rows = {
        r["bucket"]: (
            r["n_docs"],
            r["real_tokens"],
            r["padded_tokens"],
            r["waste_e6"],
        )
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{longdoc_dir}/documents.parquet/*.parquet'"
    )
    d_rows = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            "SELECT bucket, n_docs, real_tokens, padded_tokens, waste_e6 "
            "FROM (" + T._oracle_padding_waste() + ")"
        ).fetchall()
    }
    con.close()
    assert s_rows == d_rows
    # the invariant the fix establishes: waste is never negative
    for _, (_, real, padded, waste) in s_rows.items():
        assert padded >= real and waste >= 0
    # the overlong doc landed in (and was clamped to) the top bucket
    assert 4096 in s_rows and s_rows[4096][0] == 2

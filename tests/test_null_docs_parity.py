"""NULL-docs PARITY gate — completes the dirty-data trilogy (events:
test_null_events_corpus, embeddings: test_null_embeddings_corpus).
The messy-corpus suite asserts no-crash; this asserts full DuckDB
hash parity for every documents-only query on a corpus containing
NULL/empty/whitespace/unicode text alongside normal docs. Found round
7: the multimodal codec UDFs crashed on NULL content and the dedup
census diverged on NULL payload hashes — both closed by excluding
NULL-text docs from the asset synthesis (mirrored in every multimodal
oracle)."""

from __future__ import annotations

import duckdb
import pytest

from tests.harness_util import _norm
from tests.test_messy_corpus import DOC_SCHEMA, MESSY


def _doc_tier():
    from parallelutilities_jl_spark.operators import (
        dedup,
        multimodal,
        pipeline,
        retrieval,
        text,
    )

    return sorted(
        set(text.QUERIES)
        | set(pipeline.QUERIES)
        | set(dedup.QUERIES)
        | set(retrieval.QUERIES)
        | set(multimodal.QUERIES)
    )


@pytest.fixture(scope="module")
def mixed_docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_docs_parity")
    rows = list(MESSY) + [
        (
            10 + i,
            f"the quick brown fox number {i} jumps over lazy dogs {i} "
            "and runs",
            "en",
            f"s{i % 3}",
            60,
        )
        for i in range(12)
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", _doc_tier())
def test_null_docs_parity(spark, mixed_docs, qname):
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[qname](spark, mixed_docs)
    s_cols = list(sdf.columns)
    s_rows = sdf.collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{mixed_docs}/documents.parquet/*.parquet'"
    )
    arr = con.execute(osql[qname]).fetch_arrow_table()
    d_cols = arr.schema.names
    d_rows = [tuple(r[c] for c in d_cols) for r in arr.to_pylist()]
    con.close()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows), (len(s_rows), len(d_rows))
    order = sorted(s_cols)
    si = [s_cols.index(c) for c in order]
    di = [d_cols.index(c) for c in order]
    a = sorted((tuple(_norm(r[i]) for i in si) for r in s_rows), key=repr)
    b = sorted((tuple(_norm(r[i]) for i in di) for r in d_rows), key=repr)
    assert a == b

"""Regression gate for oracle result typing (no Spark needed).

The driver hashes typed values, so a DuckDB oracle whose final output
column materializes as HUGEINT (``decimal128(38,0)`` over Arrow — the
result type of ``SUM(BIGINT)``) hash-mismatches against the Spark side's
``bigint`` even when every value is numerically equal.  This bit
q12_priority_lines (round 4), then bm25_topk and json_props_stats
(round 5).  Running every registered oracle through DuckDB and asserting
no decimal128(38,0) output column closes the class for good: any future
un-cast SUM fails here, locally, before the driver sees it.
"""

from __future__ import annotations

import sys

import duckdb
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def oracles() -> dict[str, str]:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def test_no_oracle_output_is_hugeint(oracles, con) -> None:
    offenders: list[tuple[str, str, str]] = []
    for name, sql in oracles.items():
        schema = con.execute(sql).fetch_arrow_table().schema
        for field in schema:
            t = field.type
            if pa.types.is_decimal(t) and t.precision == 38 and t.scale == 0:
                offenders.append((name, field.name, str(t)))
    assert not offenders, (
        "oracle output columns materialize as DuckDB HUGEINT "
        "(decimal128(38,0)) — wrap the aggregate in CAST(... AS BIGINT) "
        f"or the driver's typed hash will fail: {offenders}"
    )

"""Format connectors: CSV / JSON-lines / ORC / Parquet ingest and
egress with schema fidelity (engine-extension surface — the reference
returns results in-process only, reference src/mapreduce.jl:253).

The portability rules encoded here (what a 100 TB pipeline needs to not
learn the hard way):

* **Parquet/ORC are the data-path formats**: columnar, typed, splittable,
  predicate-pushdown-capable. CSV/JSON are interchange edges only —
  row-oriented text, no pushdown beyond partition pruning, and
  type-lossy unless a schema is pinned.
* **Never schema-infer in production.** Inference is a full extra pass
  over text data and infers per-run (a column of "01" becomes int today,
  string tomorrow). `read_table` therefore *requires* a schema for
  csv/json.
* **Timestamps**: written as ISO-8601 text in csv/json; round-trip
  exactness requires session timeZone pinned (UTC here) — parquet/orc
  store micros and don't care.
* **Compression**: snappy for the columnar pair (splittable at the
  row-group/stripe level), gzip acceptable for cold json/csv edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# formats whose files carry their own schema + stats (the data path)
COLUMNAR = ("parquet", "orc")
# text edges: schema must be supplied on read
TEXT = ("csv", "json")
FORMATS = COLUMNAR + TEXT

_CSV_OPTS = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    # RFC-4180 quoting so free text with commas/newlines survives
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
}
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


def write_table(
    df: DataFrame, path: str, fmt: str, mode: str = "overwrite"
) -> None:
    """Write `df` at `path` in `fmt` (one of FORMATS)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.options(**_CSV_OPTS)
    elif fmt == "json":
        w = w.options(**_JSON_OPTS)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read `path` as `fmt`. Columnar formats carry their schema; csv and
    json require one (schema inference is a production anti-pattern —
    see module docstring)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read
    if fmt in TEXT:
        if schema is None:
            raise ValueError(
                f"{fmt} read requires an explicit schema "
                "(inference is per-run and type-lossy)"
            )
        r = r.schema(schema)
        r = r.options(**(_CSV_OPTS if fmt == "csv" else _JSON_OPTS))
    elif schema is not None:
        r = r.schema(schema)
    return r.format(fmt).load(path)


def convert(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dst_path: str,
    dst_fmt: str,
    schema: StructType | None = None,
) -> None:
    """Format migration (e.g. landing-zone json → warehouse parquet):
    a single distributed read→write, no driver materialization."""
    write_table(
        read_table(spark, src_path, src_fmt, schema), dst_path, dst_fmt
    )

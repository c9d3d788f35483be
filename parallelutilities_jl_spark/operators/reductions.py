"""Reduction-operator algebra (reference src/reductionfunctions.jl).

The reference ships first-class binary reduction operators with algebraic
tags; our Spark rendering keeps the algebra but maps each operator to the
shuffle-friendly primitive:

* `Commutative(f)` tag → plain shuffle aggregation (Spark's default
  assumption); untagged ops go through the *ordered* fold in
  operators/mapreduce.py (reference src/mapreduce.jl:138-146).
* `BroadcastFunction(f)` (elementwise combine of equal-shape arrays,
  reference src/reductionfunctions.jl:31-41) → `zip_with` on ArrayType
  for pairs, long-format `(idx, val)` GROUP BY for N-way reduction —
  the layout that scales to arrays wider than executor memory.
* `elementwisesum!`/`product!`/`min!`/`max!` (reference
  src/reductionfunctions.jl:84-123) → per-index SUM/any-product/MIN/MAX.
* `BroadcastStack(f, dims)` (ragged stacking of offset-axis arrays,
  reference src/reductionfunctions.jl:173-230) → full-outer join on the
  index: overlap combined by `f`, non-overlap copied — long format
  sidesteps Spark's lack of offset axes (SURVEY §7).
* `Flip(f)` (reference src/reductionfunctions.jl:258-269) → argument swap,
  commutativity preserved.

In-place variants (`broadcastinplace`, reference
src/reductionfunctions.jl:69-71) have no Spark analog to expose: Tungsten
aggregate buffers already mutate in place.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# tags & wrappers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Commutative:
    """Marks a binary op commutative (unchecked, like the reference) —
    enables unordered shuffle combines (reference src/reductionfunctions.jl:7-11)."""

    op: "ReduceOp"


@dataclass(frozen=True)
class ReduceOp:
    """A binary reduction operator usable both as a Spark aggregate and as
    a SQL fold lambda (for the ordered non-commutative path).

    ``agg`` builds the whole-column aggregate; ``merge_sql`` is the binary
    combine as a Spark SQL lambda body over ``acc`` and ``x`` (used inside
    higher-order `aggregate()` for rank-ordered folds); ``zero_sql`` its
    identity literal.
    """

    name: str
    agg: Callable[[Column], Column]
    merge_sql: str
    zero_sql: str


def _sub_word(sql: str, word: str, repl: str) -> str:
    """Replace `word` only where it stands alone — a bare str.replace
    would corrupt identifiers containing the letter (max/xor)."""
    import re

    return re.sub(rf"\b{word}\b", repl, sql)


def flip(op: ReduceOp) -> ReduceOp:
    """Flip(f)(x, y) = f(y, x) (reference src/reductionfunctions.jl:258-269)."""
    merged = _sub_word(
        _sub_word(_sub_word(op.merge_sql, "acc", "__tmp__"), "x", "acc"),
        "__tmp__",
        "x",
    )
    return ReduceOp(f"flip({op.name})", op.agg, merged, op.zero_sql)


def signed_product_agg(c: Column) -> Column:
    """Multiplicative aggregate for ANY sign (reference
    `elementwiseproduct!`, src/reductionfunctions.jl:97): magnitude via
    exp∘sum∘ln over the nonzero values, sign from the parity of the
    negative count, zero short-circuit when any factor is 0. All three
    pieces are partial-aggregable columns, so the whole product stays a
    single map-side-combinable hash aggregate."""
    n_neg = F.sum(F.when(c < 0, F.lit(1)).otherwise(F.lit(0)))
    any_zero = F.max(F.when(c == 0, F.lit(1)).otherwise(F.lit(0)))
    mag = F.exp(F.sum(F.when(c != 0, F.log(F.abs(c)))))
    sign = F.when(n_neg % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(any_zero == 1, F.lit(0.0)).otherwise(sign * mag)


def _dsum18(c: Column) -> Column:
    """Float-parity sum for small-magnitude doubles (embeddings): exact,
    combine-order-independent decimal(38,18) accumulation — never ROUND
    a double sum in an oracle-checked path."""
    return F.sum(c.cast("decimal(38,18)")).cast("double")


_DD_DSUM18 = "CAST(SUM(CAST({e} AS DECIMAL(38,18))) AS DOUBLE)"

SUM = ReduceOp("sum", F.sum, "acc + x", "0")
DSUM = ReduceOp("dsum", _dsum18, "acc + x", "0")
MIN = ReduceOp("min", F.min, "least(acc, x)", "NULL")
MAX = ReduceOp("max", F.max, "greatest(acc, x)", "NULL")
PROD = ReduceOp("prod", signed_product_agg, "acc * x", "1")

COMMUTATIVE_OPS = {"sum", "dsum", "min", "max", "prod"}


def is_commutative(op) -> bool:
    if isinstance(op, Commutative):
        return True
    return isinstance(op, ReduceOp) and op.name in COMMUTATIVE_OPS


def unwrap(op):
    return op.op if isinstance(op, Commutative) else op


# ---------------------------------------------------------------------------
# elementwise array combiners
# ---------------------------------------------------------------------------


def zip_with_combine(a: Column, b: Column, f_sql: str = "x + y") -> Column:
    """BroadcastFunction(f) for a *pair* of equal-length arrays: the
    `zip_with` fast path (reference src/reductionfunctions.jl:31-41)."""
    return F.zip_with(a, b, lambda x, y: _apply2(f_sql, x, y))


def _apply2(f_sql: str, x: Column, y: Column) -> Column:
    if f_sql == "x + y":
        return x + y
    if f_sql == "x * y":
        return x * y
    if f_sql == "least(x, y)":
        return F.least(x, y)
    if f_sql == "greatest(x, y)":
        return F.greatest(x, y)
    raise ValueError(f"unsupported combine {f_sql!r}")


def explode_long(df: DataFrame, arr: str, keys: list[str]) -> DataFrame:
    """Array column → long format (idx 1-based, val) — the scalable layout
    for N-way elementwise reduction."""
    return df.select(
        *keys, F.posexplode(arr).alias("pos0", "val")
    ).select(*keys, (F.col("pos0") + 1).cast("long").alias("idx"), "val")


def elementwise_reduce(
    long_df: DataFrame, op: ReduceOp, idx: str = "idx", val: str = "val"
) -> DataFrame:
    """N-way elementwise reduction over long-format rows: GROUP BY idx —
    one shuffle, arbitrary width/count (reference elementwisesum! etc.,
    src/reductionfunctions.jl:84-123, generalized)."""
    return long_df.groupBy(idx).agg(op.agg(F.col(val)).alias("val"))


def broadcast_stack(
    a: DataFrame,
    b: DataFrame,
    f_sql: str = "x + y",
    idx: str = "idx",
    val: str = "val",
    fill: float = 0.0,
) -> DataFrame:
    """BroadcastStack(f): combine two long-format arrays with (possibly)
    offset index ranges — overlap combined by f, non-overlap copied
    (reference src/reductionfunctions.jl:173-230; OffsetArrays test
    misctests_singleprocess.jl:55-63). Full-outer join on the index."""
    av = a.select(F.col(idx).alias("idx"), F.col(val).alias("va"))
    bv = b.select(F.col(idx).alias("idx"), F.col(val).alias("vb"))
    joined = av.join(bv, "idx", "full_outer")
    x = F.coalesce(F.col("va"), F.lit(fill))
    y = F.coalesce(F.col("vb"), F.lit(fill))
    combined = F.when(
        F.col("va").isNotNull() & F.col("vb").isNotNull(), _apply2(f_sql, x, y)
    ).otherwise(F.coalesce(F.col("va"), F.col("vb")))
    return joined.select("idx", combined.alias("val"))


# ---------------------------------------------------------------------------
# oracle-checked queries (SURVEY §2.5 qnames) over the embeddings fixture
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from parallelutilities_jl_spark.sources.fixtures import load_table  # noqa: E402


def _emb_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return explode_long(emb, "embedding", ["vec_id"]).select(
        "vec_id", "idx", F.col("val").cast("double").alias("val")
    )


_DD_EMB_LONG = (
    "SELECT vec_id, UNNEST(generate_series(1, len(embedding))) AS idx, "
    "UNNEST(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val "
    "FROM embeddings"
)


def q_elementwise_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """elementwisesum! as an N-way per-index reduction (reference
    src/reductionfunctions.jl:84): long-format GROUP BY idx — one shuffle
    regardless of array count or width."""
    out = elementwise_reduce(_emb_long(spark, sf_dir), DSUM)
    return out.select("idx", "val")


def q_elementwise_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = elementwise_reduce(_emb_long(spark, sf_dir), MIN)
    return out.select("idx", "val")


def q_elementwise_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = elementwise_reduce(_emb_long(spark, sf_dir), MAX)
    return out.select("idx", "val")


def q_elementwise_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """elementwiseproduct! (reference src/reductionfunctions.jl:97): the
    TRUE signed per-index product — sign from negative-count parity,
    magnitude via exp∘sum∘ln, zero short-circuit — as one hash aggregate
    (signed_product_agg). Restricted to 20 vectors to stay comfortably in
    double range; value left unrounded (the harness compares floats at 9
    significant digits, the repo's float-parity policy)."""
    long_df = _emb_long(spark, sf_dir).filter(F.col("vec_id") < 20)
    return (
        long_df.groupBy("idx")
        .agg(PROD.agg(F.col("val")).alias("val"))
        .select("idx", "val")
    )


def q_elementwise_zip_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BroadcastFunction(+) pairwise fast path: zip_with on ArrayType
    (reference src/reductionfunctions.jl:31-41), consecutive-vector pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("emb"),
    )
    a = dbl.filter(F.col("vec_id") % 2 == 0).alias("a")
    b = dbl.alias("b")
    joined = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
    summed = joined.select(
        F.col("a.vec_id").alias("vec_id"),
        zip_with_combine(F.col("a.emb"), F.col("b.emb"), "x + y").alias("s"),
    )
    return explode_long(summed, "s", ["vec_id"])


def q_broadcast_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BroadcastStack(+): ragged offset-axis combine — even-vector sums at
    idx, odd-vector sums at idx+2; overlap added, flanks copied (reference
    src/reductionfunctions.jl:173-230)."""
    long_df = _emb_long(spark, sf_dir)
    a = elementwise_reduce(long_df.filter(F.col("vec_id") % 2 == 0), DSUM)
    b = elementwise_reduce(
        long_df.filter(F.col("vec_id") % 2 == 1).select(
            (F.col("idx") + 2).alias("idx"), "val"
        ),
        DSUM,
    )
    # the overlap combine is ONE add of two already-exact doubles —
    # deterministic, no decimal needed at the edge
    out = broadcast_stack(a, b, "x + y")
    return out.select("idx", "val")


ORACLES = {
    "elementwise_sum_arrays": (
        f"SELECT idx, {_DD_DSUM18.format(e='val')} AS val "
        f"FROM ({_DD_EMB_LONG}) GROUP BY idx"
    ),
    "elementwise_min_arrays": (
        f"SELECT idx, MIN(val) AS val FROM ({_DD_EMB_LONG}) GROUP BY idx"
    ),
    "elementwise_max_arrays": (
        f"SELECT idx, MAX(val) AS val FROM ({_DD_EMB_LONG}) GROUP BY idx"
    ),
    "elementwise_product_arrays": (
        "SELECT idx, "
        "CASE WHEN SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) > 0 THEN 0.0 "
        "ELSE (CASE WHEN SUM(CASE WHEN val < 0 THEN 1 ELSE 0 END) % 2 = 1 "
        "THEN -1.0 ELSE 1.0 END) "
        "* EXP(SUM(CASE WHEN val <> 0 THEN LN(ABS(val)) END)) END AS val "
        f"FROM ({_DD_EMB_LONG}) WHERE vec_id < 20 GROUP BY idx"
    ),
    "elementwise_zip_add": (
        "SELECT vec_id, idx, va + vb AS val FROM ("
        "SELECT a.vec_id AS vec_id, "
        "UNNEST(generate_series(1, len(a.embedding))) AS idx, "
        "UNNEST(list_transform(a.embedding, v -> CAST(v AS DOUBLE))) AS va, "
        "UNNEST(list_transform(b.embedding, v -> CAST(v AS DOUBLE))) AS vb "
        "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1 "
        "WHERE a.vec_id % 2 = 0)"
    ),
    "broadcast_stack_overlap": (
        f"WITH lf AS ({_DD_EMB_LONG}), "
        f"a AS (SELECT idx, {_DD_DSUM18.format(e='val')} AS va "
        "FROM lf WHERE vec_id % 2 = 0 GROUP BY idx), "
        f"b AS (SELECT idx + 2 AS idx, {_DD_DSUM18.format(e='val')} AS vb "
        "FROM lf WHERE vec_id % 2 = 1 GROUP BY idx) "
        "SELECT COALESCE(a.idx, b.idx) AS idx, "
        "CASE WHEN va IS NOT NULL AND vb IS NOT NULL THEN va + vb "
        "ELSE COALESCE(va, vb) END AS val "
        "FROM a FULL OUTER JOIN b ON a.idx = b.idx"
    ),
}

QUERIES = {
    "elementwise_sum_arrays": q_elementwise_sum,
    "elementwise_min_arrays": q_elementwise_min,
    "elementwise_max_arrays": q_elementwise_max,
    "elementwise_product_arrays": q_elementwise_product,
    "elementwise_zip_add": q_elementwise_zip_add,
    "broadcast_stack_overlap": q_broadcast_stack,
}

"""Z-order (Morton) keys as portable integer expressions.

Interleaving the bits of two bounded dimensions gives a 1-D sort key
whose contiguous ranges are 2-D tiles: sorting (or range-partitioning) a
table by the key keeps BOTH dimensions' min/max tight within every file
and row group, so box predicates on either or both dimensions prune —
the standard multi-dimensional data-skipping layout (used by e.g. Delta
Lake OPTIMIZE ZORDER; here as a plain column expression any writer can
sort by).

Like functions/texthash.py, every builder exists in a Spark-Column and a
DuckDB-SQL form built from the same bit arithmetic (shifts/AND/OR on
BIGINT are exact and identical in both engines), so z-keys are
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# spread masks: 16 data bits end up in the even bit positions of 32
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]

BITS = 16  # per-dimension key width; inputs must be in [0, 2^16)
MAX_DIM = 1 << BITS


def _spread16(v: Column) -> Column:
    for shift, mask in _SPREAD:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def morton_key(x: Column, y: Column) -> Column:
    """Interleave two 16-bit non-negative ints: x in even bits, y odd."""
    return _spread16(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(y.cast("long")), 1)
    )


def dd_spread16(expr: str) -> str:
    e = f"CAST({expr} AS BIGINT)"
    for shift, mask in _SPREAD:
        e = f"(({e}) | (({e}) << {shift})) & {mask}"
    return e


def dd_morton_key(x: str, y: str) -> str:
    return f"({dd_spread16(x)}) | (({dd_spread16(y)}) << 1)"

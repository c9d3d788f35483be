"""Integer arithmetic Column helpers.

The product codec (mixed-radix encode/decode, balanced block rule) is pure
integer arithmetic; these helpers keep it exact on LongType columns.
All callers guarantee non-negative operands and |a| < 2^53 (products larger
than that overflow the reference's Int64 math too).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def imod(a: Column, b) -> Column:
    """a % b for non-negative a."""
    return a % b


def idiv(a: Column, b) -> Column:
    """Exact integer division for non-negative longs: (a - a%b)/b is an
    exact double division because the quotient is an integer < 2^53."""
    return ((a - (a % b)) / b).cast("long")

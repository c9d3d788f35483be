"""Range specifications — the leaf iterators of product/zip task sets.

The reference's iterators are Julia `AbstractRange`s: unit (`1:10`),
stepped (`1:2:9`), `Base.OneTo`, and float-stepped (`1:0.5:3`) — the test
matrix at reference test/productsplit.jl:19-20. We model a range as
(start, step, length) and always *index* it (value = start + step*i,
0-based i) instead of accumulating the step, so float ranges are exact and
reproducible on both the Spark side and the DuckDB oracle (SURVEY §7
"float-stepped ranges").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

Number = Union[int, float]


@dataclass(frozen=True)
class RangeSpec:
    """`start:step:...` with `length` elements; value(i) = start + step*i."""

    start: Number
    step: Number
    length: int

    def __post_init__(self) -> None:
        if self.length < 0:
            raise ValueError("length must be >= 0")
        if self.step == 0:
            raise ValueError("step must be nonzero")

    @property
    def is_float(self) -> bool:
        return isinstance(self.start, float) or isinstance(self.step, float)

    @property
    def stop(self) -> Number:
        return self.start + self.step * (self.length - 1)

    def value(self, i: int) -> Number:
        """0-based indexed access; float ranges computed by index (exact)."""
        if not (0 <= i < self.length):
            raise IndexError(i)
        return self.start + self.step * i

    def values(self) -> list[Number]:
        return [self.value(i) for i in range(self.length)]

    def index_of(self, v: Number) -> int | None:
        """Inverse of value(); None if v is not on the range. O(1)."""
        q = (v - self.start) / self.step
        i = int(round(q))
        if 0 <= i < self.length and self.value(i) == v:
            return i
        return None


def rng(start: Number, stop: Number, step: Number = 1) -> RangeSpec:
    """Julia-style inclusive range constructor: rng(1, 10) ≙ 1:10,
    rng(1, 9, 2) ≙ 1:2:9, rng(1.0, 3.0, 0.5) ≙ 1:0.5:3."""
    if step == 0:
        raise ValueError("step must be nonzero")
    n = int((stop - start) / step) + 1 if (stop - start) / step >= 0 else 0
    # guard float fuzz: recompute length so last value does not overshoot
    while n > 0 and (start + step * (n - 1) > stop if step > 0 else start + step * (n - 1) < stop):
        n -= 1
    while start + step * n <= stop if step > 0 else start + step * n >= stop:
        n += 1
    return RangeSpec(start, step, n)

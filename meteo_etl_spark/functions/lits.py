"""One-round-trip literal array builders (r15 optimization).

``F.lit(values_list)`` — and the equivalent ``F.array(*[F.lit(x) for
x in values])`` — expands CLIENT-side into one py4j round trip per
element, so a 64-dim plane literal costs ~65 driver round trips
(~1 ms each) every time a query plan is CONSTRUCTED, before any job
runs. A bank of 8-16 such arrays (IVF centroids, LSH planes, PCA
components, SQ8 ranges) costs 0.5-1.5 s of pure Python-side plan
construction per query invocation — measured as ~35 s of the ~99 s
sf0.1 bench total (see OPTIMIZATION_r15.md).

These helpers render the same literal as ONE SQL expression string
parsed JVM-side in a single round trip. After Catalyst constant
folding the optimized plan contains the identical Literal node, so
results, oracle hashes and plan shape are unchanged.

Exactness: doubles are rendered with ``repr()`` — the shortest
string that round-trips to the same IEEE-754 double; both Python's
and Java's parsers are correctly rounded, so the parsed literal is
bit-identical to the ``F.lit`` path. Integers render exactly. No
NaN/inf support (no engine literal site produces them — the guard
raises rather than silently diverging).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def _dtok(x: float) -> str:
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal {x!r} has no SQL rendering")
    return repr(v) + "D"


def _itok(x: int) -> str:
    v = int(x)
    # py4j sends a Python int that fits 32 bits as a Java int
    # (IntegerType literal) and a larger one as long — mirror that so
    # the rendered literal's type matches F.lit exactly.
    return str(v) if _INT32_MIN <= v <= _INT32_MAX else f"{v}L"


def dlit(values: Iterable[float]) -> Column:
    """Literal ``array<double>`` in one py4j round trip."""
    return F.expr("array(" + ",".join(_dtok(x) for x in values) + ")")


def dlit2(matrix: Sequence[Sequence[float]]) -> Column:
    """Literal ``array<array<double>>`` in one py4j round trip."""
    rows = ",".join(
        "array(" + ",".join(_dtok(x) for x in row) + ")" for row in matrix
    )
    return F.expr(f"array({rows})")


def ilit(values: Iterable[int]) -> Column:
    """Literal integer array in one py4j round trip (int elements
    that fit 32 bits, bigint otherwise — the F.lit promotion)."""
    return F.expr("array(" + ",".join(_itok(x) for x in values) + ")")


def ilit2(matrix: Sequence[Sequence[int]]) -> Column:
    """Literal integer matrix in one py4j round trip."""
    rows = ",".join(
        "array(" + ",".join(_itok(x) for x in row) + ")" for row in matrix
    )
    return F.expr(f"array({rows})")


def num_lit_array(values: Sequence) -> Column:
    """Single-round-trip literal array for a homogeneous int or float
    sequence; falls back to per-element ``F.lit`` for anything else
    (Decimal, None, ...) where SQL rendering would change the type."""
    if values and all(type(x) is int for x in values):
        return ilit(values)
    if values and all(isinstance(x, float) for x in values):
        return dlit(values)
    return F.array(*[F.lit(x) for x in values])

"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (zip_with / aggregate), JVM-side.

All arithmetic is forced to DOUBLE and accumulated left-to-right so the
result is bit-identical to an oracle computing the same nominal order;
user-facing similarity values are rounded to a tolerance far above
double noise (SURVEY.md §7.3 oracle-expressibility note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ in DOUBLE, left-to-right fold."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    """‖a‖₂ in DOUBLE."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity in DOUBLE."""
    return dot(a, b) / (norm(a) * norm(b))


# Shared DuckDB fragments computing the same nominal arithmetic (explicit
# per-index products, left-to-right list_sum) — used by the oracle SQL.
def dd_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def dd_norm(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def dd_cosine(a: str, b: str) -> str:
    return f"({dd_dot(a, b)} / ({dd_norm(a)} * {dd_norm(b)}))"

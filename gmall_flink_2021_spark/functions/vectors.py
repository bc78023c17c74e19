"""Vector column expressions for embedding similarity.

All arithmetic runs JVM-side on array<double> via higher-order
functions (zip_with/aggregate) — no Python UDF. The fold order is
index-sequential with a 0.0 initial accumulator, which makes the
result bit-identical to an equivalent sequential fold in DuckDB
(list_reduce over list_transform) — so cosine scores are
oracle-checkable without rounding tolerances.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an ANSI DIVIDE_BY_ZERO crash) when
    either vector has zero norm — one degenerate embedding must not
    kill a corpus-scale scoring job, and NULL matches DuckDB's x/0
    double semantics, keeping the oracles aligned."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))

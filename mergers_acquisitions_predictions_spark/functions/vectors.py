"""Vector expressions over `array<float>` embedding columns.

Engine-level vector math stays in `array<float>`/`array<double>` with
JVM higher-order functions (`zip_with`, `aggregate`) — no Python, no
ml.Vector until the MLlib boundary (SURVEY §1.1: `VectorUDT` only where
MLlib requires it; bridges via `pyspark.ml.functions.vector_to_array`).

Precision discipline: every element is cast to double BEFORE any
arithmetic and reductions run left-to-right, so results are
bit-reproducible against the DuckDB oracle computing the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision, left-to-right accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)

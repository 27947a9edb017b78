"""Vector math over ``array<float>`` columns — JVM higher-order functions.

No Python in the path: ``zip_with`` + ``aggregate`` compile to codegen'd
expressions, so a cosine over a 64-dim embedding is a tight JVM loop per row.
For very wide vectors (≥ 1k dims) an Arrow-batched Pandas UDF wins on SIMD —
that variant lives in operators/similarity.py as the documented alternative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs instead of NaN/err."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))

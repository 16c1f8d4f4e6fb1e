"""Vector math over ``array<float>`` columns with built-in HOFs only
(zip_with + aggregate) — JVM-side, no UDFs, so similarity scans stay
inside codegen and scale linearly with the corpus.

Determinism note: ``aggregate`` folds left-to-right, so double sums
are bit-reproducible — and match any oracle that sums sequentially.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / F.nullif(
        F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)), F.lit(0.0))


def scale(a: Column, s: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double") * s)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") + y.cast("double"))

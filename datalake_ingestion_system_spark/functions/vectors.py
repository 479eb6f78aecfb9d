"""Vector math over ``array<float>`` columns as pure Catalyst expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Arrow
round-trip, no Python), which is the right default for 100 TB of embeddings;
a Pandas-UDF variant only pays off once SIMD over large batches beats
codegen'd loops, and can be swapped in per-operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float/double array columns."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        _to_double(v), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe on zero-norm vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)

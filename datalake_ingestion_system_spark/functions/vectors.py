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

# Round-17 rejected experiment (recorded so it is not re-chased): a
# fixed-dim UNROLLED dot/l2_norm — 64 element_at terms in the same
# left-associated order, meant to trade the interpreted higher-order
# fold for whole-stage codegen — was bit-identical (0 mismatches on a
# 54k-pair sample) but measured 2-3x SLOWER than the aggregate/zip_with
# form on 0.25-2M-pair joins (e.g. 2.75 s vs 6.07 s on ~0.8M pairs;
# 11.3 s vs 20.9 s on 2M).  The 128-term expression tree exceeds what
# codegen handles gracefully; ArrayAggregate's interpreted loop is the
# faster engine here.  OPTIMIZATION_r17.md carries the numbers.

"""Skew mitigation for hot join keys.

AQE's skew-join split (enabled in ``session.py``) handles sort-merge skew
after the fact; explicit salting is the a-priori tool when one side is a
modest dimension and the fact's key distribution is known-pathological
(e.g. a null-ish default key holding 30% of a 100 TB fact).  Salting
rewrites ``fact ⋈ dim ON k`` as ``fact' ⋈ dim' ON (k, salt)`` where the
fact picks one random salt per row and the dim is replicated across all
salts — the hot key's rows spread over ``salts`` shuffle partitions, at the
cost of a ``salts``× blow-up of the (small) dimension side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: str | list[str],
                salts: int = 16, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Join with the fact side salted across ``salts`` sub-keys and the
    dimension side replicated to every salt.  Result rows are identical to
    ``fact.join(dim, on, how)``; only the shuffle distribution changes.

    ``how`` is restricted to fact-preserving types (inner/left/left_semi/
    left_anti): a right/full join would need dim-side dedup after the
    replication.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    on = [on] if isinstance(on, str) else list(on)
    f = fact.withColumn(_SALT, (F.rand(seed) * salts).cast("int"))
    d = dim.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return f.join(d, on + [_SALT], how).drop(_SALT)

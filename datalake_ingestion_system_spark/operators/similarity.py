"""Similarity search over embedding columns (``array<float>``).

Two tiers:
- ``brute_force_topk``  — exact cosine top-k: broadcast the (small) query set,
  score every candidate, per-query window rank.  O(n·q) but one scan, no
  shuffle of the corpus — the correctness baseline.
- ``lsh_ann_topk``      — approximate: random-hyperplane signatures bucket the
  corpus; queries probe only their bucket (plus optional multi-probe).  The
  100 TB path: the corpus shuffles once on the bucket key, and each probe
  touches ~n/2^bits of the data.

Hyperplanes are derived deterministically (seeded) so results are stable
across runs and executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot


def brute_force_topk(candidates: DataFrame, queries: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     k: int = 5, round_digits: int = 6) -> DataFrame:
    """Exact cosine top-k: per query row, the k nearest candidate vectors.

    Rank on the *rounded* similarity (+ id tie-break) so ordering is stable
    under floating-point reassociation across engines/partitionings.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_similarity("q_vec", "c_vec"), round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def hyperplane_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from dot products against fixed hyperplanes —
    a pure Catalyst expression (no UDF)."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    return sum(bits[1:], bits[0])


def lsh_ann_topk(candidates: DataFrame, queries: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 k: int = 5, n_planes: int = 4, dim: int = 64,
                 seed: int = 42) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's
    hyperplane bucket.  Recall < 1 by design; rows-only correctness check."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)

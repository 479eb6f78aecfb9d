"""Bucketized range join: point-in-interval matching at scale.

Spark plans a raw ``p.ts >= i.start AND p.ts < i.end`` join as
BroadcastNestedLoopJoin (fine only while one side broadcasts) or, worse, a
cartesian product.  The reference's config-validity lookup (SURVEY §2.3
J1, ``q_join_interval_config``) broadcasts the interval side because it is
config-scale; THIS operator covers the case where BOTH sides are data-
scale — sensor readings against maintenance windows, events against
incident spans, trades against auction periods.

The classic time-bucketing rewrite: chunk time into ``bucket``-second
cells, explode each interval into the cells it covers, map each point to
its single cell, equi-join on (keys..., cell), and re-apply the exact
range predicate as a residual filter.  Candidate volume is
``|points| + |intervals| x (avg_span / bucket)`` — linear, shuffled on a
normal hash key, no broadcast and no quadratic blow-up.  Pick ``bucket``
near the median interval span: much smaller multiplies the interval
explode factor; much larger multiplies residual-filter waste per cell.

Semantics: ``start <= point < end`` (end-exclusive) at second resolution
(epoch-seconds arithmetic, NTZ-safe via ``catalog.epoch_seconds``).
Zero- and negative-length intervals cover no cells and match nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import epoch_seconds


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_ts: str, start_ts: str, end_ts: str,
                           keys: list[str] | None = None,
                           bucket: int = 3600,
                           how: str = "inner") -> DataFrame:
    """Join each point row to every interval row containing it.

    ``keys`` are additional equi-join columns present on BOTH sides (e.g.
    user_id, device_id) — they ride the same shuffle as the cell id.
    ``how`` supports ``inner`` and ``left_outer`` (unmatched points keep
    NULL interval columns; implemented candidate-inner + anti-union so the
    residual filter cannot eat left rows).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r}")
    keys = list(keys or [])
    p_ep = epoch_seconds(point_ts)
    s_ep = epoch_seconds(start_ts)
    e_ep = epoch_seconds(end_ts)

    pts = points.withColumn("_cell", F.floor(p_ep / bucket))
    # an interval [s, e) covers cells floor(s/b) .. floor(e'/b) where e' is
    # the last contained instant.  epoch_seconds truncates to seconds, so
    # the end cell is taken CONSERVATIVELY as floor(e_ep/b): a sub-second
    # fraction on e may extend the interval into that cell, and the extra
    # candidate rows (at most one cell per interval) die in the exact
    # residual filter.  e_ep >= s_ep (not >) for the same reason: a
    # sub-second interval truncates to equal epochs but still contains
    # points; truly empty intervals (e <= s) emit candidates the residual
    # kills.  Backwards intervals (e_ep < s_ep) cover nothing.
    cells = F.when(
        e_ep >= s_ep,
        F.sequence(F.floor(s_ep / bucket), F.floor(e_ep / bucket)),
    ).otherwise(F.array().cast("array<bigint>"))
    iv = intervals.withColumn("_cell", F.explode_outer(cells))

    # string-qualified aliases: when both sides derive from the SAME scan
    # (e.g. windows and points both carved from one events table), raw
    # pts[k] == iv[k] shares attribute ids and Spark resolves it only by
    # self-join heuristics (with a 'trivially true equals' warning) —
    # explicit aliases make the resolution unambiguous by construction
    pts_a, iv_a = pts.alias("_rj_p"), iv.alias("_rj_i")
    on = None
    for k in [*keys, "_cell"]:
        term = F.col(f"_rj_p.{k}") == F.col(f"_rj_i.{k}")
        on = term if on is None else (on & term)
    residual = ((F.col(f"_rj_p.{point_ts}") >= F.col(f"_rj_i.{start_ts}"))
                & (F.col(f"_rj_p.{point_ts}") < F.col(f"_rj_i.{end_ts}")))
    iv_keep = [c for c in iv.columns if c not in (*keys, "_cell")]
    matched = (pts_a.join(iv_a, on, "inner")
               .filter(residual)
               .select(*[F.col(f"_rj_p.{c}") for c in points.columns],
                       *[F.col(f"_rj_i.{c}") for c in iv_keep]))
    if how == "inner":
        return matched
    # left_outer: points with no containing interval come back with NULL
    # interval columns — recover them with a left_anti on the matched
    # rows' point identity, then union.  Identity = every point column,
    # compared NULL-SAFELY: a plain equi-anti would leak any matched row
    # containing a NULL back in as a spurious unmatched duplicate.
    iv_cols = [c for c in intervals.columns if c not in keys]
    matched_pts = matched.select(*points.columns).distinct()
    anti_cond = None
    for c in points.columns:
        term = points[c].eqNullSafe(matched_pts[c])
        anti_cond = term if anti_cond is None else (anti_cond & term)
    unmatched = points.join(matched_pts, on=anti_cond, how="left_anti")
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched)

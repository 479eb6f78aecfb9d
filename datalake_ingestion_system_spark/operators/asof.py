"""As-of (temporal) join operators.

Spark has no native ASOF JOIN; two implementations with different scale
profiles (SURVEY §2.3 J1 discusses the config-validity interval join):

- ``asof_join_window``  — when left and right rows share one event stream (or
  can be unioned), a carry-forward window ``max`` gives exact as-of semantics
  with ONE shuffle on the partition key.  Preferred at scale.
- ``asof_join_pandas``  — general two-table merge_asof via ``applyInPandas``:
  co-groups both sides by key, runs ``pd.merge_asof`` per key group.  Arrow-
  batched; right side must fit per-key in executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_window(events: DataFrame, key: str, ts: str,
                     mark_filter, value_col: str,
                     out_col: str = "asof_value") -> DataFrame:
    """Exact as-of within one stream: for each row, the latest ``value_col``
    at-or-before it among rows satisfying ``mark_filter``.

    Carry-forward is ``max`` over ``struct(ts, value)`` — the struct orders by
    ``ts`` first, so the max IS the most recent marked row (value itself need
    not be monotone), and ties on ``ts`` break deterministically by value.
    """
    w = (Window.partitionBy(key).orderBy(ts)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.max(
        F.when(mark_filter, F.struct(F.col(ts).alias("_t"),
                                     F.col(value_col).alias("_v")))).over(w)
    return events.withColumn(out_col, carried.getField("_v"))


def asof_join_pandas(left: DataFrame, right: DataFrame, key: str, ts: str,
                     direction: str = "backward",
                     suffix: str = "_right") -> DataFrame:
    """General merge_asof between two tables, per join key.

    Both sides shuffle once on ``key``; each co-group is joined with
    ``pd.merge_asof`` (sorted by ``ts``).  Arrow moves columnar batches, so
    the Python cost is per-batch, not per-row.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    # defensively re-alias the right side: when both sides derive from the
    # same scan (self-as-of), identical attribute ids on the two cogroup
    # sides get wrongly deduplicated and the right frame arrives with
    # columns missing (observed: `ts` pruned from the view side)
    right = right.select(
        *[F.col(f.name).alias(f.name) for f in right.schema.fields])

    l_fields = left.schema.fields
    r_fields = [f for f in right.schema.fields if f.name not in (key, ts)]
    out_schema = StructType(
        l_fields + [type(f)(f.name + suffix, f.dataType, True) for f in r_fields])
    r_renames = {f.name: f.name + suffix for f in r_fields}

    def merge(key_tuple, l_iter_df, r_iter_df):
        # a key present on only one side delivers the other side as an
        # empty frame (no columns) — guard before sort_values touches `ts`
        if l_iter_df.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        lp = l_iter_df.sort_values(ts)
        if r_iter_df.empty:
            merged = lp.copy()
            for f in r_fields:
                merged[f.name + suffix] = None
        else:
            rp = (r_iter_df.sort_values(ts)
                  .drop(columns=[key], errors="ignore")
                  .rename(columns=r_renames))
            merged = pd.merge_asof(lp, rp, on=ts, direction=direction)
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
    )

"""As-of (temporal) join operators.

Spark has no native ASOF JOIN; two implementations with different scale
profiles (SURVEY §2.3 J1 discusses the config-validity interval join):

- ``asof_join_window``  — when left and right rows share one event stream (or
  can be unioned), a carry-forward window ``max`` gives exact as-of semantics
  with ONE shuffle on the partition key.  Preferred at scale.
- ``asof_join_pandas``  — general two-table merge_asof via ``applyInPandas``:
  co-groups both sides by a hash BUCKET of the key, runs one
  ``pd.merge_asof(..., by=key)`` per bucket.  Arrow-batched; a bucket's
  rows must fit in executor memory (size ``num_buckets`` accordingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (ByteType, IntegerType, LongType, ShortType,
                               StructType)

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)


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
                     suffix: str = "_right",
                     num_buckets: int = 64,
                     tolerance: str | None = None) -> DataFrame:
    """General merge_asof between two tables, per join key.

    Both sides shuffle once on a hash BUCKET of ``key``, not the raw key:
    ``cogroup().applyInPandas`` pays one Python/Arrow round-trip per group,
    so grouping by a high-cardinality key makes per-call overhead the whole
    cost (measured: 1500 per-key calls ≈ 7s vs 64 per-bucket calls ≈ 1s on
    the same sf0.1 input).  Each bucket is joined with a single
    ``pd.merge_asof(..., by=key)`` — semantics identical to the per-key
    form.  At 100 TB, raise ``num_buckets`` until a bucket's rows fit in
    executor memory; the shuffle volume is the same either way.

    ``tolerance`` (a pandas Timedelta string, e.g. ``"30m"``) bounds how
    far back/forward a match may reach — the attribution-window form; an
    out-of-window left row keeps NULL right columns, exactly an unmatched
    one.
    """
    import pandas as pd

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
    out_cols = [f.name for f in out_schema.fields]

    bcol = "__asof_bucket"
    lb = left.withColumn(
        bcol, F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)))
    rb = right.withColumn(
        bcol, F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)))

    def merge(key_tuple, l_df, r_df):
        # a bucket present on only one side delivers the other side as an
        # empty frame (no columns) — guard before sort_values touches `ts`
        if l_df.empty:
            return pd.DataFrame(columns=out_cols)
        lp = l_df.drop(columns=[bcol]).sort_values(ts, kind="mergesort")
        if r_df.empty:
            merged = lp.copy()
            for f in r_fields:
                merged[f.name + suffix] = None
        else:
            rp = (r_df.drop(columns=[bcol])
                  .sort_values(ts, kind="mergesort")
                  .rename(columns=r_renames))
            kw = ({"tolerance": pd.Timedelta(tolerance)}
                  if tolerance is not None else {})
            merged = pd.merge_asof(lp, rp, on=ts, by=key,
                                   direction=direction, **kw)
            # unmatched keys upcast integer columns to float64(NaN) —
            # restore a nullable integer dtype so Arrow hands Spark
            # int64-with-nulls, matching the declared schema
            for f in r_fields:
                c = f.name + suffix
                if (isinstance(f.dataType, _INT_TYPES)
                        and merged[c].dtype.kind == "f"):
                    merged[c] = merged[c].astype("Int64")
        return merged[out_cols]

    return (
        lb.groupBy(bcol)
        .cogroup(rb.groupBy(bcol))
        .applyInPandas(merge, out_schema)
    )

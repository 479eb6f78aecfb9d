"""Continuous aggregate (hypertable-rollup) maintenance.

The TimescaleDB/Druid pattern re-expressed Spark-first: a long-lived
rollup table holds per-(hour-bucket, event_type) aggregates; each
``refresh_rollup`` run re-aggregates ONLY the buckets at-or-after the
stored high-water mark minus a late-data grace window, and publishes them
with dynamic partition overwrite — one atomic commit per refresh, old
buckets untouched.

Why this shape at 100 TB:

- The raw scan is bounded by the refresh window, not table size: the
  cutoff lands in the parquet scan as a pushed filter (and as partition
  pruning when the raw table is date-partitioned).
- ``overwrite_partitions`` on the bucket column rewrites only touched
  buckets; the commit-log replay (``TxnLogFormat``) keeps readers atomic
  across refreshes.
- Refreshes are idempotent: re-running the same window recomputes the
  same aggregates into the same partitions — crash-and-rerun converges,
  the same contract as the ingest protocol.
- Late data inside ``grace`` hours is folded in by the next refresh
  (its bucket re-aggregates from raw); data later than grace needs a
  manual backfill of that bucket — the standard continuous-aggregate
  trade, stated rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import TxnLogFormat

BUCKET_COL = "bucket_hour"


def rollup_aggregate(events: DataFrame,
                     granularity: str = "hour") -> DataFrame:
    """The rollup body: per (time bucket, event_type) count / value sum /
    distinct users.  Partial-agg friendly (all three are map-side
    combinable; count_distinct is exact here — swap approx_count_distinct
    if user cardinality per bucket outgrows memory).  ``granularity`` is
    any ``date_trunc`` unit — pick it so the bucket count stays
    partition-directory-friendly for the target retention (hourly buckets
    over years => thousands of dirs; day/week coarsens the layout)."""
    return (events
            .groupBy(F.date_trunc(granularity, F.col("ts"))
                      .alias(BUCKET_COL),
                     "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.countDistinct("user_id").alias("n_users")))


def refresh_rollup(spark: SparkSession, events: DataFrame,
                   rollup_path: str, grace_hours: int = 2,
                   granularity: str = "hour",
                   fmt: TxnLogFormat | None = None) -> int:
    """Incrementally refresh the rollup; returns the number of buckets
    (re)written.  ``events`` is the raw table (lazy — only the refresh
    window is scanned)."""
    fmt = fmt or TxnLogFormat()
    try:
        current = fmt.read(spark, rollup_path)
        wm = current.agg(F.max(BUCKET_COL)).head()[0]  # scalar high-water
    except FileNotFoundError:
        wm = None
    if wm is not None:
        # literal cutoff (not a subquery) so the comparison reaches the
        # scan as a pushed filter / partition prune.  Compared in
        # wall-clock epoch seconds (catalog.epoch_seconds) so the same
        # code handles LTZ and TIMESTAMP_NTZ event columns — a raw
        # F.lit(datetime) literal is LTZ and cannot compare to NTZ.
        import calendar

        from ..catalog import epoch_seconds
        cut = calendar.timegm(wm.timetuple()) - grace_hours * 3600
        window = events.filter(
            epoch_seconds(F.date_trunc(granularity, F.col("ts")))
            >= F.lit(cut))
    else:
        window = events  # first refresh: full history
    fresh = rollup_aggregate(window, granularity)
    n_buckets = fresh.select(BUCKET_COL).distinct().count()
    if n_buckets == 0:
        return 0
    fmt.overwrite_partitions(fresh, rollup_path, BUCKET_COL)
    return n_buckets

"""Structured Streaming query surface (SURVEY §2.7 upgrade).

The reference is a scheduled batch system with a hand-rolled incremental loop
(D:370-397) and watermark (C:99); here the same semantics run as Structured
Streaming with ``Trigger.AvailableNow`` (≙ "the daily job over whatever is
new"), event-time windows, and watermarks.  For oracle checking, a bounded
parquet directory drives the stream to completion synchronously via the
memory sink; window aggregates are then plain SQL-expressible.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_ltz, ensure_ntz, load, table_path
from ..session import tune
from .scratch import scratch_dir

QUERIES = {}
ORACLE_SQL = {}
_SINK_IDS = itertools.count()


def _q(name):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)
        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # lets tools fingerprint the real body
        QUERIES[name] = wrapped
        return wrapped
    return deco


def _run_stream_to_memory(agg: DataFrame, spark: SparkSession,
                          mode: str = "complete",
                          state_partitions: int = 8) -> DataFrame:
    """Drive a bounded stream to completion into a memory sink, return the
    materialized result as a (batch) DataFrame.

    Stateful operators open one state store PER shuffle partition and the
    per-partition runner overhead (store commit + Arrow/Python worker for
    applyInPandasWithState) dominates when per-key work is small — measured
    7.2s → 2.5s on the stateful profile query going 32 → 8 partitions at
    sf0.1.  ``state_partitions`` is pinned for the query's lifetime at first
    start (Spark persists it in the checkpoint); size it to active keys ÷
    target keys-per-task — a real 100 TB stream wants hundreds, the bounded
    test corpus wants few.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        name = f"stream_sink_{next(_SINK_IDS)}"
        q = (agg.writeStream.outputMode(mode)
             .format("memory").queryName(name)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import fix_nanos_ts
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # glob form: the file-stream source needs a directory-rooted basePath
    stream = (spark.readStream.schema(raw_schema)
              .parquet(f"{sf_dir}/events.parque*"))
    return fix_nanos_ts(stream)


@_q("q_stream_hourly_events")
def q_stream_hourly_events(spark, sf_dir):
    """Tumbling 1-hour event-time windows over the event stream
    (readStream → window agg → AvailableNow → memory sink)."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_stream_to_memory(agg, spark)
    return out.select(
        F.col("window.start").alias("window_start"),
        "event_type", "n_events", "total_value",
    )


ORACLE_SQL["q_stream_hourly_events"] = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@_q("q_stream_sliding_windows")
def q_stream_sliding_windows(spark, sf_dir):
    """Sliding 2-hour windows advancing hourly (each event lands in 2
    windows) — overlap semantics mirrored in SQL as a shifted union."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_stream_to_memory(agg, spark)
    return out.select(F.col("window.start").alias("window_start"), "n_events")


ORACLE_SQL["q_stream_sliding_windows"] = """
WITH w AS (
  SELECT date_trunc('hour', ts) AS window_start FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start FROM events
)
SELECT window_start, count(*) AS n_events
FROM w GROUP BY 1
"""


@_q("q_stream_watermark_late_data")
def q_stream_watermark_late_data(spark, sf_dir):
    """Watermarked windowed aggregation (10-minute lateness bound) in
    append mode: only windows sealed by the final watermark are emitted.

    DETERMINISTIC here, hence oracle-checked (VERDICT r4 item 6):
    ``Trigger.AvailableNow`` with no ``maxFilesPerTrigger`` ingests the
    whole bounded directory in ONE micro-batch, so the watermark is -inf
    while data flows (no mid-stream late drops regardless of file order)
    and advances once, at batch end, to ``max(ts) - 10 min``; the final
    no-data batch then emits exactly the windows with
    ``window_end < watermark``.  The DuckDB mirror replays that closed
    form.  (A multi-batch run — e.g. with maxFilesPerTrigger set — would
    be batch-boundary-dependent again; this query pins the single-batch
    trigger.)"""
    # Watermarks require LTZ event time (driver parquet reads as NTZ).
    agg = (
        ensure_ltz(_events_stream(spark, sf_dir), "ts")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_stream_to_memory(agg, spark, mode="append")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events")


ORACLE_SQL["q_stream_watermark_late_data"] = """
WITH m AS (
  SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events
), agg AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
         event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events
FROM agg, m
WHERE window_start + INTERVAL 15 MINUTE < wm
"""


@_q("q_stream_dedup_events")
def q_stream_dedup_events(spark, sf_dir):
    """Streaming exact dedup with BOUNDED state: the event stream unioned
    with itself (every record arrives twice) collapses back to one copy via
    ``dropDuplicatesWithinWatermark`` — dedup state for a key is retained
    only for the watermark delay, so a continuous 100 TB/day feed does not
    accumulate unbounded state (the streaming counterpart of
    ``operators.dedup.exact_dedup``)."""
    s = ensure_ltz(_events_stream(spark, sf_dir), "ts")
    doubled = s.select("user_id", "ts", "event_type").union(
        s.select("user_id", "ts", "event_type"))
    dd = (doubled
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(["user_id", "ts", "event_type"]))
    # NTZ output: naive wall clocks compare exactly with the DuckDB oracle.
    return ensure_ntz(_run_stream_to_memory(dd, spark, mode="append"), "ts")


ORACLE_SQL["q_stream_dedup_events"] = """
SELECT DISTINCT user_id, ts, event_type FROM events
"""


@_q("q_session_window_agg")
def q_session_window_agg(spark, sf_dir):
    """Event-time session windows (30-minute gap) — batch ``session_window``
    (same operator Structured Streaming uses for stateful sessionization),
    oracle-mirrored via gap-and-cumsum SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events")
    )


ORACLE_SQL["q_session_window_agg"] = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts), 1)
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM s
GROUP BY user_id, session_seq
"""


@_q("q_stream_session_windows")
def q_stream_session_windows(spark, sf_dir):
    """STREAMING session windows (30-minute gap) with a 10-minute watermark
    in append mode: only sessions the final watermark has sealed (no
    further event could extend them) are emitted — the stateful-session
    operator the batch ``q_session_window_agg`` mirrors, now exercised
    through Structured Streaming's state store.  Deterministic for the
    same reason as ``q_stream_watermark_late_data``: single-batch
    AvailableNow makes the final watermark ``max(ts) - 10 min``, so the
    emitted set is exactly the sessions with ``session_end < watermark``
    — a closed form the DuckDB gap-and-cumsum oracle replays."""
    agg = (
        ensure_ltz(_events_stream(spark, sf_dir), "ts")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_stream_to_memory(agg, spark, mode="append")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events")


ORACLE_SQL["q_stream_session_windows"] = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts), 1)
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM g
), sess AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end,
         count(*) AS n_events
  FROM s GROUP BY user_id, session_seq
), m AS (
  SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events
)
SELECT user_id, session_start, session_end, n_events
FROM sess, m WHERE session_end < wm
"""


@_q("q_stream_stateful_user_profile")
def q_stream_stateful_user_profile(spark, sf_dir):
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running profile (event count, 30-min-gap session count, value sum,
    last-seen) carried in GroupState across micro-batches
    (``streaming/stateful.py``).  Each batch emits a cumulative snapshot per
    active key, so ``max(cum_*)`` per user reconstructs the final totals
    independent of how the bounded input was micro-batched; the oracle is the
    equivalent batch lag/cumsum SQL."""
    from ..streaming.stateful import running_user_profile
    snap = running_user_profile(_events_stream(spark, sf_dir))
    out = _run_stream_to_memory(snap, spark, mode="update")
    return (
        out.groupBy("user_id")
        .agg(F.max("cum_events").alias("n_events"),
             F.max("cum_sessions").alias("n_sessions"),
             F.round(F.max("cum_value"), 2).alias("total_value"),
             F.max("last_ts").alias("last_seen"))
    )


ORACLE_SQL["q_stream_stateful_user_profile"] = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - lag(epoch(ts), 1)
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions,
       round(sum(value), 2) AS total_value,
       max(ts) AS last_seen
FROM g
GROUP BY user_id
"""


@_q("q_stream_stream_join")
def q_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join: each user's 'click' events
    joined to that user's 'error' events arriving 0-10 minutes later —
    the funnel/causality shape (click → error-within-10-min).  Both sides
    carry watermarks and the join condition carries the time bound, so
    Spark can expire buffered state: per-key state is bounded by
    watermark + interval regardless of stream length (the unbounded-state
    trap of an unconstrained stream-stream join).  Bounded input drives it
    to completion; the oracle is the equivalent batch interval self-join."""
    s = ensure_ltz(_events_stream(spark, sf_dir), "ts")
    clicks = (s.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("c_id"))
              .withWatermark("c_ts", "30 minutes"))
    errors = (s.filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("e_user"),
                      F.col("ts").alias("e_ts"),
                      F.col("event_id").alias("e_id"))
              .withWatermark("e_ts", "30 minutes"))
    j = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    out = _run_stream_to_memory(j, spark, mode="append")
    return (out.groupBy("c_user")
            .agg(F.count("*").alias("n_click_error_pairs"),
                 F.min("c_id").alias("first_click_id"),
                 F.max("e_id").alias("last_error_id")))


ORACLE_SQL["q_stream_stream_join"] = """
SELECT c.user_id AS c_user,
       count(*) AS n_click_error_pairs,
       min(c.event_id) AS first_click_id,
       max(e.event_id) AS last_error_id
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
GROUP BY c.user_id
"""


@_q("q_asof_two_table")
def q_asof_two_table(spark, sf_dir):
    """General two-table as-of join (cogrouped ``pd.merge_asof``,
    ``operators/asof.py``): for every click event, that user's latest view
    event at-or-before the click.  Both sides shuffle once on user_id; the
    oracle is DuckDB's native ASOF JOIN — cross-engine agreement on the
    trades/quotes shape.  Aggregated per user to keep the surface compact
    while pinning every matched (click, view) assignment via sums."""
    from ..operators.asof import asof_join_pandas
    e = load(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("event_id").alias("click_id")))
    # both sides derive from the same scan: re-alias the right side's
    # shared columns so cogroup sees fresh attribute ids (same-exprId
    # columns on both sides get wrongly deduplicated/pruned)
    views = (e.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("user_id"),
                     F.col("ts").alias("ts"),
                     F.col("event_id").alias("view_id")))
    j = asof_join_pandas(clicks, views, key="user_id", ts="ts")
    return (j.groupBy("user_id")
            .agg(F.count("*").alias("n_clicks"),
                 F.count("view_id_right").alias("n_matched"),
                 F.sum("view_id_right").alias("sum_matched_view_ids"))
    )


ORACLE_SQL["q_asof_two_table"] = """
WITH clicks AS (
  SELECT user_id, ts, event_id AS click_id FROM events
  WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, event_id AS view_id FROM events
  WHERE event_type = 'view'
)
SELECT c.user_id AS user_id,
       count(*) AS n_clicks,
       count(v.view_id) AS n_matched,
       CAST(sum(v.view_id) AS BIGINT) AS sum_matched_view_ids
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
GROUP BY c.user_id
"""


@_q("q_stream_static_join")
def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment join: the event stream joined to the static
    customer dimension (broadcast — re-resolved per micro-batch, so a
    slowly-changing dim picks up updates between batches), aggregated per
    market segment.  No watermark/state needed: the static side is not a
    stream, so this is the cheapest streaming-join shape and the first one
    a 100 TB pipeline should reach for."""
    s = _events_stream(spark, sf_dir)
    cust = (load(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("user_id"),
                    "c_mktsegment"))
    agg = (s.join(F.broadcast(cust), "user_id")
           .groupBy("c_mktsegment")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value")))
    return _run_stream_to_memory(agg, spark)


ORACLE_SQL["q_stream_static_join"] = """
SELECT c.c_mktsegment, count(*) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@_q("q_asof_tolerance_window")
def q_asof_tolerance_window(spark, sf_dir):
    """Attribution-window as-of join: for every purchase, the user's latest
    view AT MOST 30 minutes before it (``asof_join_pandas`` with the
    ``tolerance`` bound — merge_asof's windowed form; an out-of-window
    purchase keeps NULL view columns exactly like an unmatched one).  Same
    bucketed cogroup plan as ``q_asof_two_table``; aggregated per user so
    every in/out-of-window assignment is pinned via counts and sums.
    Oracle: DuckDB ASOF join with the window re-applied as a predicate on
    the matched timestamp (ASOF-then-filter == merge_asof tolerance)."""
    from ..operators.asof import asof_join_pandas
    e = load(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", F.col("event_id").alias("buy_id")))
    views = (e.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("user_id"),
                     F.col("ts").alias("ts"),
                     F.col("event_id").alias("view_id")))
    j = asof_join_pandas(purchases, views, key="user_id", ts="ts",
                         tolerance="30min")
    return (j.groupBy("user_id")
            .agg(F.count("*").alias("n_purchases"),
                 F.count("view_id_right").alias("n_attributed"),
                 F.sum("view_id_right").alias("sum_attributed_view_ids")))


ORACLE_SQL["q_asof_tolerance_window"] = """
WITH purchases AS (
  SELECT user_id, ts, event_id AS buy_id FROM events
  WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, ts, event_id AS view_id FROM events
  WHERE event_type = 'view'
), m AS (
  SELECT p.user_id, p.ts AS pts, v.ts AS vts, v.view_id
  FROM purchases p ASOF LEFT JOIN views v
    ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT user_id,
       count(*) AS n_purchases,
       count(CASE WHEN vts >= pts - INTERVAL 30 MINUTE
                  THEN view_id END) AS n_attributed,
       CAST(sum(CASE WHEN vts >= pts - INTERVAL 30 MINUTE
                     THEN view_id END) AS BIGINT)
         AS sum_attributed_view_ids
FROM m GROUP BY user_id
"""


@_q("q_cdc_stream_apply")
def q_cdc_stream_apply(spark, sf_dir):
    """STREAMING CDC upsert, oracle-verified end to end: the event stream
    runs through ``streaming/cdc_stream.py`` (foreachBatch latest-wins
    merge into a TxnLogFormat table, 'error' as the delete marker) and the
    FINAL table state is returned — the DuckDB oracle is the batch
    apply-latest query, so the whole replay-safe streaming merge pipeline
    (micro-batching, commit-log publishes, tombstone handling) is checked
    against a pure declarative recomputation.  Deterministic because
    latest-wins over a total order (ts, event_id) is independent of how
    the bounded input was micro-batched — the same convergence
    ``tests/test_cdc_stream.py`` asserts."""

    from ..sinks import TxnLogFormat
    from ..streaming.cdc_stream import start_cdc_upsert_stream
    workdir = scratch_dir(prefix="cdc_stream_q_")
    table = f"{workdir}/table"
    q = start_cdc_upsert_stream(
        spark, _events_stream(spark, sf_dir), table,
        key="user_id", order_cols=("ts", "event_id"),
        checkpoint_dir=f"{workdir}/ckpt",
        delete_expr=F.col("event_type") == "error")
    q.awaitTermination()
    return (TxnLogFormat().read(spark, table)
            .select("user_id",
                    F.col("event_type").alias("last_op"),
                    F.col("ts").alias("last_ts"),
                    F.round("value", 2).alias("last_value")))


ORACLE_SQL["q_cdc_stream_apply"] = """
WITH ranked AS (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_op,
       ts AS last_ts,
       round(value, 2) AS last_value
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


@_q("q_rollup_incremental")
def q_rollup_incremental(spark, sf_dir):
    """Continuous-aggregate rollup, oracle-verified: the DAY-bucket rollup is
    built in TWO genuine incremental refreshes (history before the median
    day, then the full table — the second run re-aggregates only buckets
    inside its grace window plus the new tail) through
    ``plans/rollup.py``'s watermark + dynamic-partition-overwrite path,
    and the final table state is returned.  The DuckDB oracle is the
    straight one-shot aggregate, so incremental == full-recompute is
    checked cross-engine, not just in unit tests."""

    from ..catalog import epoch_seconds, load
    from ..plans.rollup import BUCKET_COL, refresh_rollup
    from ..sinks import TxnLogFormat
    e = load(spark, sf_dir, "events")
    mid = (e.select(epoch_seconds("ts").alias("ep"))
           .agg(F.expr("percentile_approx(ep, 0.5)")).head()[0])
    path = scratch_dir(prefix="rollup_q_") + "/rollup"
    refresh_rollup(spark, e.filter(epoch_seconds("ts") < F.lit(int(mid))),
                   path, grace_hours=48, granularity="day")
    refresh_rollup(spark, e, path, grace_hours=48, granularity="day")
    return (TxnLogFormat().read(spark, path)
            .select(F.col(BUCKET_COL).alias("bucket_day"), "event_type",
                    "n_events", F.round("sum_value", 2).alias("sum_value"),
                    "n_users"))


ORACLE_SQL["q_rollup_incremental"] = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
       event_type,
       count(*) AS n_events,
       round(round(sum(value), 2), 2) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


@_q("q_stream_stream_left_join")
def q_stream_stream_left_join(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER interval join — the state-
    EXPIRY half of the join surface ``q_stream_stream_join`` (inner)
    doesn't exercise: an unmatched click is buffered until no future error
    can possibly match it (watermark past ``c_ts + 10min``), and only then
    emitted with NULLs.  Clicks newer than that horizon are correctly
    withheld at stream end — the number the oracle must model, not ignore.

    Closed-form watermark model (verified empirically, sf0.01: 6 matched
    rows + 1999 expired-unmatched, latest emitted click 22:29:46 vs
    least-of-sides watermark 22:53:43): the global watermark is the MIN of
    the two stream-side watermarks — ``least(max(click ts), max(error
    ts)) - 30min`` — NOT global ``max(ts) - 30min``; on this corpus errors
    end ~1h before events overall, and using the global max would claim
    expiry Spark hasn't granted.  Expiry comparison is strict (``+10min <
    watermark``); the corpus doesn't sit on the boundary (same documented
    data-dependence as the session-window gap note)."""
    s = ensure_ltz(_events_stream(spark, sf_dir), "ts")
    clicks = (s.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("c_id"))
              .withWatermark("c_ts", "30 minutes"))
    errors = (s.filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("e_user"),
                      F.col("ts").alias("e_ts"),
                      F.col("event_id").alias("e_id"))
              .withWatermark("e_ts", "30 minutes"))
    j = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter")
    out = _run_stream_to_memory(j, spark, mode="append")
    return (out.groupBy("c_user")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.when(F.col("e_id").isNotNull(), 1).otherwise(0))
                 .cast("long").alias("n_pairs"),
                 F.sum(F.when(F.col("e_id").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_expired_unmatched"),
                 F.min("c_id").alias("first_click_id")))


ORACLE_SQL["q_stream_stream_left_join"] = """
WITH c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), e AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
), wm AS (
  SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM e))
         - INTERVAL 30 MINUTE AS w
), pairs AS (
  SELECT c.user_id, c.event_id AS c_id, e.event_id AS e_id
  FROM c JOIN e ON c.user_id = e.user_id
   AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
), expired_unmatched AS (
  SELECT c.user_id, c.event_id AS c_id, CAST(NULL AS BIGINT) AS e_id
  FROM c, wm
  WHERE NOT EXISTS (
    SELECT 1 FROM e WHERE e.user_id = c.user_id
      AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE)
    AND c.ts + INTERVAL 10 MINUTE < wm.w
)
SELECT user_id AS c_user, count(*) AS n_rows,
       CAST(sum(CASE WHEN e_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(sum(CASE WHEN e_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_expired_unmatched,
       min(c_id) AS first_click_id
FROM (SELECT * FROM pairs UNION ALL SELECT * FROM expired_unmatched)
GROUP BY user_id
"""


@_q("q_stream_kmv_distinct")
def q_stream_kmv_distinct(spark, sf_dir):
    """STREAMING distinct-count sketch, oracle-verified end to end: the
    event stream folds into a persistent per-type KMV bottom-k sketch
    (``streaming/sketch_stream.py`` — foreachBatch union-of-k-smallest
    into a TxnLogFormat table) and the FINAL sketch's cardinality
    estimates are returned.  Because KMV union is associative and
    idempotent, the maintained sketch is bit-identical to the batch
    sketch over the whole input regardless of micro-batching — so the
    DuckDB oracle is simply the batch KMV recomputation, and the whole
    streaming sketch pipeline gets a hash check instead of the rows-only
    fate of non-replayable sketch state (cf. ``q_hll_sketch_rollup``).
    State is O(k) per set; estimates are integer-exact (same
    ``(k-1) * 2^52 DIV h_k`` path as ``q_kmv_distinct_sketch``)."""

    from ..sinks import TxnLogFormat
    from ..streaming.sketch_stream import start_kmv_stream

    k, m_num = 64, 63 * (1 << 52)
    workdir = scratch_dir(prefix="kmv_stream_q_")
    q = start_kmv_stream(
        spark,
        _events_stream(spark, sf_dir).select("event_type", "user_id"),
        f"{workdir}/sketch", set_col="event_type", key_col="user_id",
        checkpoint_dir=f"{workdir}/ckpt", k=k)
    q.awaitTermination()
    sk = TxnLogFormat().read(spark, f"{workdir}/sketch")
    return (sk.groupBy("event_type")
            .agg(F.count("*").alias("n_sketch"),
                 F.max("h").alias("kth_hash"))
            .select(F.col("event_type").alias("set_label"),
                    "n_sketch", "kth_hash",
                    F.when(F.col("n_sketch") < k, F.col("n_sketch"))
                     .otherwise(F.expr(f"{m_num} DIV kth_hash"))
                     .alias("est_distinct")))


ORACLE_SQL["q_stream_kmv_distinct"] = """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), hx AS (
  SELECT event_type,
         GREATEST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                     1, 13))::BIGINT, 1) AS h
  FROM d
), ranked AS (
  -- the sketch is a SET of hash values: colliding inputs occupy one slot
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM (SELECT DISTINCT event_type, h FROM hx) dh
), sk AS (
  SELECT event_type, h FROM ranked WHERE rn <= 64
)
SELECT event_type AS set_label,
       CAST(count(*) AS BIGINT) AS n_sketch,
       max(h) AS kth_hash,
       CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
            ELSE CAST(283726776524341248 // max(h) AS BIGINT)
       END AS est_distinct
FROM sk GROUP BY event_type
"""


@_q("q_txnlog_stream_source")
def q_txnlog_stream_source(spark, sf_dir):
    """The commit log as a STREAMING SOURCE (Spark-4 Python Data Source,
    ``sources/txnlog_stream.py`` — Delta streaming-source parity): events
    are committed in three separate appends (three versions), a
    ``readStream.format("txnlog")`` consumer drains them (commit versions
    are the offsets, each staged file one Arrow-batched partition), and
    the per-type rollup of everything the STREAM delivered must equal the
    declarative rollup of the table — exactly-once delivery across
    micro-batches, checked cross-engine.

    Scale shape: offset planning is O(new commits) driver-side metadata;
    file reads are executor-side pyarrow -> Arrow batches (no per-row
    Python); the three-way split rides one keyed repartition."""

    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value")
    path = scratch_dir(prefix="txnsrc_q_") + "/t"
    fmt = TxnLogFormat()
    for part in range(3):  # three commits -> three source versions
        fmt.append(e.filter(F.pmod("event_id", F.lit(3)) == part), path)
    # collect_set size, not countDistinct: streaming aggs reject DISTINCT
    stream = (spark.readStream.format("txnlog").load(path)
              .groupBy("event_type")
              .agg(F.count("*").alias("n_rows"),
                   F.size(F.collect_set("user_id")).alias("n_users"),
                   F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                    .alias("value_cents")))
    return _run_stream_to_memory(stream, spark)


ORACLE_SQL["q_txnlog_stream_source"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY event_type
"""


@_q("q_change_data_feed")
def q_change_data_feed(spark, sf_dir):
    """CHANGE DATA FEED over the commit log (Delta ``readChangeFeed``
    parity, ``sources/txnlog_stream.py``): events land in two appends,
    a deletion-vector DELETE vectors out the error rows, and a
    deletion-vector UPDATE flips negative values — then the feed is
    read back as tagged per-row changes (insert / delete /
    update_preimage / update_postimage, each with its commit version)
    and rolled up per tag.  The DuckDB oracle reconstructs every change
    set declaratively from the raw table: inserts are the two append
    splits, deletes are the error rows, pre/postimages are the live
    high-value rows before/after the shift — so tagging, DV row
    identity, per-commit provenance, and the position-take read path
    are all checked cross-engine.

    Scale shape: feed planning is O(commits in range) driver-side
    metadata + O(vectored rows) DV descriptor reads (Delta's CDF plan
    shape); row emission is executor-side pyarrow position-takes and
    file scans — no snapshot diffing anywhere.  Reference parity: the
    reference ships full daily snapshots (D:319-344); the feed is the
    incremental contract its consumers actually want."""

    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value")
    path = scratch_dir(prefix="cdf_q_") + "/t"
    fmt = TxnLogFormat()
    fmt.append(e.filter(F.pmod("event_id", F.lit(2)) == 0), path)  # v0
    fmt.append(e.filter(F.pmod("event_id", F.lit(2)) == 1), path)  # v1
    fmt.delete_where_dv(spark, path, "event_type = 'error'")       # v2
    fmt.update_where_dv(spark, path, "value > 100",
                        {"value": "value + 1000"})                 # v3
    feed = (spark.read.format("txnlog")
            .option("readChangeFeed", "true").load(path))
    return (feed.groupBy(
                F.col("_change_type").alias("change_type"),
                F.col("_commit_version").alias("commit_version"))
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("event_id").alias("n_ids"),
                 F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                  .alias("value_cents")))


ORACLE_SQL["q_change_data_feed"] = """
WITH base AS (
  SELECT event_id, event_type, value FROM events
), changes AS (
  SELECT 'insert' AS change_type, 0 AS commit_version, *
  FROM base WHERE event_id % 2 = 0
  UNION ALL
  SELECT 'insert', 1, * FROM base WHERE event_id % 2 = 1
  UNION ALL
  SELECT 'delete', 2, * FROM base WHERE event_type = 'error'
  UNION ALL
  SELECT 'update_preimage', 3, *
  FROM base
  WHERE coalesce(event_type <> 'error', TRUE) AND value > 100
  UNION ALL
  SELECT 'update_postimage', 3, event_id, event_type, value + 1000
  FROM base
  WHERE coalesce(event_type <> 'error', TRUE) AND value > 100
)
SELECT change_type,
       CAST(commit_version AS BIGINT) AS commit_version,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM changes
GROUP BY change_type, commit_version
"""


@_q("q_cdf_replica_mirror")
def q_cdf_replica_mirror(spark, sf_dir):
    """Downstream REPLICA maintained from the change data feed
    (``streaming/cdf_mirror.py`` — the Delta CDF+MERGE sync pattern):
    events land upstream in two appends, a DV delete removes the error
    rows and a DV update shifts the high-value rows; the mirror stream
    drains the feed (availableNow) applying latest-change-per-key
    batches through idempotent commits, and the REPLICA's per-type
    rollup is returned.  The DuckDB oracle recomputes the upstream live
    state declaratively — replica == source is checked cross-engine
    through the whole feed→apply→commit-log pipeline.

    Scale shape: sync cost follows CHANGE volume (feed planning is
    O(commits) metadata + O(vectored rows); the apply touches changed
    keys), not source size — the incremental contract the reference's
    full daily snapshot ship (D:319-344) lacked."""

    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource
    from ..streaming.cdf_mirror import start_cdf_mirror

    spark.dataSource.register(TxnLogDataSource)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value")
    work = scratch_dir(prefix="cdfmir_q_")
    src, dst = f"{work}/src", f"{work}/dst"
    fmt = TxnLogFormat()
    fmt.append(e.filter(F.pmod("event_id", F.lit(2)) == 0), src)   # v0
    fmt.append(e.filter(F.pmod("event_id", F.lit(2)) == 1), src)   # v1
    fmt.delete_where_dv(spark, src, "event_type = 'error'")        # v2
    fmt.update_where_dv(spark, src, "value > 100",
                        {"value": "value + 1000"})                 # v3
    q = start_cdf_mirror(spark, src, dst, "event_id", f"{work}/ckpt")
    q.awaitTermination()
    return (fmt.read(spark, dst)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                  .alias("value_cents")))


ORACLE_SQL["q_cdf_replica_mirror"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(
           (CASE WHEN value > 100 THEN value + 1000 ELSE value END)
           * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE coalesce(event_type <> 'error', TRUE)
GROUP BY event_type
"""


@_q("q_cdf_rowid_mirror")
def q_cdf_rowid_mirror(spark, sf_dir):
    """ROW-ID replica maintenance (round 12 — VERDICT r11 item 7): the
    mirror applies changes by the upstream row's STABLE ``_row_id``
    (``by_row_id=True``; the upstream is row-tracked and its CDF
    sidecars materialize ids), so a KEY-MUTATING update — the click
    rows' ``event_id`` shifts by 1,000,000 mid-pipeline — round-trips
    exactly: the preimage's replica row leaves by identity, not by the
    now-stale key.  A key-based mirror provably diverges here (the old
    key's row never leaves).  The replica's rollup — including
    ``sum(event_id)``, which pins the key mutation — must match the
    DuckDB oracle's declarative recomputation of the upstream state.

    Scale shape: identical to the key mirror (sync cost follows change
    volume); identity addressing adds one lineage column to the
    replica, no extra pass."""

    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource
    from ..streaming.cdf_mirror import SRC_ROW_ID, start_cdf_mirror

    spark.dataSource.register(TxnLogDataSource)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    work = scratch_dir(prefix="ridmir_q_")
    src, dst = f"{work}/src", f"{work}/dst"
    fmt = TxnLogFormat()
    fmt.append(e.limit(0), src)
    fmt.set_properties(spark, src, row_tracking=True,
                       change_data_feed=True)
    fmt.append(e, src)
    # the key itself mutates — the key-based mirror's blind spot
    fmt.update_where(spark, src, "event_type = 'click'",
                     {"event_id": "event_id + 1000000",
                      "value": "value + 1000"})
    fmt.delete_where(spark, src, "event_type = 'error'")
    q = start_cdf_mirror(spark, src, dst, None, f"{work}/ckpt",
                         by_row_id=True)
    q.awaitTermination()
    return (fmt.read(spark, dst).drop(SRC_ROW_ID)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("event_id").alias("sum_id"),
                 F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                  .alias("value_cents")))


ORACLE_SQL["q_cdf_rowid_mirror"] = """
WITH live AS (
  SELECT CASE WHEN event_type = 'click'
              THEN event_id + 1000000 ELSE event_id END AS event_id,
         event_type,
         CASE WHEN event_type = 'click'
              THEN value + 1000 ELSE value END AS value
  FROM events
  WHERE coalesce(event_type <> 'error', TRUE)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS sum_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM live GROUP BY event_type
"""


@_q("q_txnlog_stream_sink")
def q_txnlog_stream_sink(spark, sf_dir):
    """The commit log as an exactly-once streaming SINK
    (``df.writeStream.format("txnlog")``) composed with the streaming
    SOURCE — a table-to-table incremental pipeline with no foreachBatch
    glue: events land upstream in three appends, a txnlog stream
    projects/filters them, the txnlog sink publishes each micro-batch
    as one atomic epoch-watermarked commit, and the DOWNSTREAM table's
    per-type rollup is checked against the declarative recomputation.
    Exactly-once on both ends: source offsets are commit versions, sink
    epochs are txn watermarks (Delta sink txnAppId/txnVersion parity).

    Scale shape: sink tasks stream Arrow chunks to per-task staged
    files (no task buffering); the epoch commit is O(files) driver
    metadata — the same job-commit cost every table format pays."""

    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value")
    work = scratch_dir(prefix="txnsink_q_")
    src, dst = f"{work}/src", f"{work}/dst"
    fmt = TxnLogFormat()
    for part in range(3):
        fmt.append(e.filter(F.pmod("event_id", F.lit(3)) == part), src)
    q = (spark.readStream.format("txnlog").load(src)
         .filter("value >= 0")
         .selectExpr("event_type", "user_id",
                     "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
         .writeStream.format("txnlog").option("path", dst)
         .option("checkpointLocation", f"{work}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (fmt.read(spark, dst)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("cents").alias("value_cents")))


ORACLE_SQL["q_txnlog_stream_sink"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE value >= 0
GROUP BY event_type
"""


@_q("q_stream_drain")
def q_stream_drain(spark, sf_dir):
    """Bounded AvailableNow drain, oracle-verified (round 14 — VERDICT
    r13 item 6): events land upstream in FIVE commits;
    ``drain_stream`` empties the backlog through the REAL streaming
    engine in ``maxCommitsPerTrigger=2``-bounded micro-batches (the
    ``capBase`` seeding closes the engine's
    latestOffset-before-initialOffset gap that made Spark's own
    AvailableNow fall back to one giant batch), each foreachBatch
    epoch appending idempotently to a downstream txnlog table under
    the epoch txn watermark; the downstream rollup must equal the
    declarative recomputation — rows delivered exactly once across
    ≥3 bounded epochs.

    Scale shape: each micro-batch plans from commit metadata (no
    listing), peak memory is bounded by the per-trigger cap — the
    property the single-batch fallback destroys on a 100 TB
    backfill."""
    from ..sinks import TxnLogFormat
    from ..streaming.drain import drain_stream

    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    work = scratch_dir(prefix="drain_q_")
    src, dst = f"{work}/src", f"{work}/dst"
    fmt = TxnLogFormat()
    for part in range(5):
        fmt.append(e.filter(F.pmod("event_id", F.lit(5)) == part), src)

    def sink(df, epoch):
        batch = df.selectExpr(
            "event_type",
            "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
        if batch.isEmpty():
            return
        TxnLogFormat().append(batch, dst, txn_app="drain_q",
                              txn_version=epoch)

    drain_stream(spark, src, sink, f"{work}/ckpt",
                 max_commits_per_trigger=2)
    return (fmt.read(spark, dst)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("value_cents")))


ORACLE_SQL["q_stream_drain"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY event_type
"""


@_q("q_txnlog_stream_pushdown")
def q_txnlog_stream_pushdown(spark, sf_dir):
    """STREAMING-read filter pushdown (``option("where", ...)`` on the
    txnlog source — Delta prunes streaming scans too): events are
    committed as one append PER event_type (five commits, five files
    with tight per-type string stats), then a filtered stream drains
    the backlog with the predicate pushed to the PLANNER — four of the
    five files are provably empty for ``event_type = 'purchase'`` and
    never enter any micro-batch — and the paired ``.where`` keeps
    may-contain semantics exact.  The per-user-bucket rollup of what
    the pruned stream delivered must equal the declarative answer over
    the raw table, cross-engine.

    Scale shape: pruning reads only commit-recorded stats already
    replayed for offset planning (zero extra storage reads); at 100 TB
    a filtered stream over a type-partitioned firehose plans O(matching
    files), not O(commits x files) — this was the last unpruned read
    path (VERDICT r9 item 3)."""

    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value")
    path = scratch_dir(prefix="txnpush_q_") + "/t"
    fmt = TxnLogFormat()
    for et in ("click", "error", "purchase", "signup", "view"):
        fmt.append(e.filter(F.col("event_type") == et).coalesce(1), path)
    stream = (spark.readStream.format("txnlog")
              .option("where", "event_type = 'purchase'").load(path)
              .where("event_type = 'purchase'")
              .groupBy(F.pmod("user_id", F.lit(4)).alias("user_bucket"))
              .agg(F.count("*").alias("n_rows"),
                   F.size(F.collect_set("user_id")).alias("n_users"),
                   F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                    .alias("value_cents")))
    return _run_stream_to_memory(stream, spark)


ORACLE_SQL["q_txnlog_stream_pushdown"] = """
SELECT user_id % 4 AS user_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id % 4
"""

"""applyInPandasWithState operator: state must carry across micro-batches.

Feeds one user's events as TWO parquet files consumed one-per-trigger
(maxFilesPerTrigger=1 → two micro-batches), with a session straddling the
batch boundary.  If GroupState carry-over were broken, the second batch
would restart counts at zero and/or open a spurious session.
"""

from __future__ import annotations

import pytest

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.streaming.stateful import (
    running_user_profile)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double")


@pytest.mark.slow
def test_state_carries_across_batches(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    # batch 1: two sessions (gap > 30 min between e2 and e3)
    batch1 = [(1, t0, 1.0), (1, t0 + 5 * m, 2.0), (1, t0 + 45 * m, 3.0)]
    # batch 2: first event 10 min after batch 1's last -> SAME session;
    #          then a 40-min gap -> one new session
    batch2 = [(1, t0 + 55 * m, 4.0), (1, t0 + 95 * m, 5.0),
              (2, t0, 10.0)]

    src = tmp_path / "stream_src"
    src.mkdir()
    _mk_events(spark, batch1).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    _mk_events(spark, batch2).coalesce(1).write.parquet(str(src / "b2"))

    schema = spark.read.parquet(str(src / "b1")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(f"{src}/b*/part-*.parquet"))
    snap = running_user_profile(stream)
    q = (snap.writeStream.outputMode("update")
         .format("memory").queryName("stateful_test")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("stateful_test")

    # two batches => user 1 must have emitted two snapshots (proves the
    # input really was split), cumulative not per-batch
    snaps = (out.filter(F.col("user_id") == 1)
             .orderBy("cum_events").collect())
    assert len(snaps) == 2, "expected one snapshot per micro-batch"
    assert [r.cum_events for r in snaps] == [3, 5]
    # sessions: batch1 opens 2; batch2's first event continues session 2
    # (10-min gap against carried last_ts), second opens session 3
    assert [r.cum_sessions for r in snaps] == [2, 3]
    assert abs(snaps[-1].cum_value - 15.0) < 1e-9
    assert snaps[-1].last_ts == t0 + 95 * m

    final2 = (out.filter(F.col("user_id") == 2)
              .orderBy(F.desc("cum_events")).first())
    assert (final2.cum_events, final2.cum_sessions) == (1, 1)


def test_session_window_exact_gap_boundary_merges(spark):
    """ADVICE r5 (low) claimed Spark session windows are [start, last+gap)
    with EXCLUSIVE end, so an event exactly ``gap`` after the previous one
    would start a new session and the DuckDB oracle's ``> 1800`` predicate
    would diverge.  Measured on Spark 4: the merge condition is INCLUSIVE —
    an event at exactly prev_ts + 1800s JOINS the session — so the oracle's
    ``new_session = gap > 1800`` is the correct mirror and must not be
    changed to ``>= 1800``.  This test pins that semantic so a future Spark
    upgrade that flips it fails loudly instead of silently desyncing
    ``q_session_window_agg`` / ``q_stream_session_windows``."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u", t0),
        ("u", t0 + dt.timedelta(seconds=1800)),    # exactly gap later: merges
        ("u", t0 + dt.timedelta(seconds=3601)),    # gap+1 after 12:30: splits
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = (df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
             .agg(F.count("*").alias("n")))
    sessions = sorted((r["session_window"]["start"], r["n"])
                      for r in out.collect())
    assert [n for _, n in sessions] == [2, 1]
    # and the oracle predicate (> 1800) groups identically
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE e (user_id VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO e VALUES (?, ?)", [list(r) for r in rows])
    n_sessions = con.execute("""
        WITH g AS (
          SELECT CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts) > 1800
                      THEN 1 ELSE 0 END AS ns FROM e)
        SELECT 1 + sum(ns) FROM g""").fetchone()[0]
    assert int(n_sessions) == len(sessions) == 2


def test_kmv_stream_merge_property_across_epochs(spark, tmp_path):
    """The maintained sketch must be bit-identical to the one-shot batch
    sketch no matter how the input is micro-batched: fold three disjoint
    chunks through apply_batch-style merges, replay one chunk (crash
    redelivery), and compare against bottom_k over the union."""
    from datalake_ingestion_system_spark.sinks import TxnLogFormat
    from datalake_ingestion_system_spark.streaming.sketch_stream import (
        bottom_k, kmv_hash)

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    all_rows = e.select("event_type", "user_id")
    fmt = TxnLogFormat()
    path = str(tmp_path / "sketch")
    chunks = [all_rows.filter(F.pmod(F.col("user_id"), F.lit(3)) == i)
              for i in range(3)]
    chunks.append(chunks[1])  # replayed epoch: must be a no-op
    for c in chunks:
        fresh = c.select("event_type", kmv_hash(F.col("user_id")).alias("h"))
        try:
            merged = bottom_k(fmt.read(spark, path).unionByName(fresh),
                              "event_type", 64)
        except FileNotFoundError:
            merged = bottom_k(fresh, "event_type", 64)
        fmt.overwrite_table(merged, path)
    got = sorted((r.event_type, r.h)
                 for r in fmt.read(spark, path).collect())
    want = sorted(
        (r.event_type, r.h)
        for r in bottom_k(
            all_rows.select("event_type",
                            kmv_hash(F.col("user_id")).alias("h")),
            "event_type", 64).collect())
    assert got == want

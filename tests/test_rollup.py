"""Continuous aggregate (hypertable rollup): incremental refresh windows,
late-data folding inside grace, untouched cold buckets, idempotent rerun,
and equality with the full recompute — the invariant that makes a rollup
trustworthy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.plans.rollup import (
    BUCKET_COL, refresh_rollup, rollup_aggregate)
from datalake_ingestion_system_spark.sinks import TxnLogFormat

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ev(eid, hours, uid, etype, value):
    return (eid, T0 + dt.timedelta(hours=hours), uid, etype, float(value))


def _read(spark, path):
    return {(r[BUCKET_COL], r.event_type): (r.n_events, r.sum_value, r.n_users)
            for r in TxnLogFormat().read(spark, path).collect()}


def test_refresh_converges_with_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    batch1 = spark.createDataFrame([
        _ev(1, 0.1, 1, "view", 1), _ev(2, 0.5, 2, "view", 2),
        _ev(3, 1.2, 1, "click", 3), _ev(4, 2.7, 3, "view", 4)], SCHEMA)
    assert refresh_rollup(spark, batch1, path) == 3  # hours 0,1,2
    # new events land in hour 3 and (late, within grace) hour 2
    batch2 = spark.createDataFrame([
        _ev(5, 3.4, 2, "view", 5), _ev(6, 2.9, 4, "view", 6)], SCHEMA)
    full = batch1.unionByName(batch2)
    n = refresh_rollup(spark, full, path)
    assert n >= 2  # hour 2 re-aggregated, hour 3 new (grace window)
    expect = {(r[BUCKET_COL], r.event_type):
              (r.n_events, r.sum_value, r.n_users)
              for r in rollup_aggregate(full).collect()}
    assert _read(spark, path) == expect


def test_cold_buckets_not_rewritten(spark, tmp_path):
    """The second refresh must only overwrite buckets inside the grace
    window — verified against the commit log's recorded partitions."""
    path = str(tmp_path / "rollup")
    fmt = TxnLogFormat()
    days = spark.createDataFrame(
        [_ev(i, 24.0 * i, i, "view", i) for i in range(4)], SCHEMA)
    refresh_rollup(spark, days, path)  # buckets on 4 different days
    more = days.unionByName(spark.createDataFrame(
        [_ev(99, 24.0 * 3 + 1, 9, "view", 9)], SCHEMA))
    refresh_rollup(spark, more, path, grace_hours=2)
    last = fmt._commits(path)[-1]
    assert last["action"] == "overwrite"
    # only the newest day's buckets appear in the refresh commit
    assert all(p.startswith("2024-03-04") for p in last["partitions"]), \
        last["partitions"]
    # and the full state still equals the recompute
    expect = {(r[BUCKET_COL], r.event_type):
              (r.n_events, r.sum_value, r.n_users)
              for r in rollup_aggregate(more).collect()}
    assert _read(spark, path) == expect


def test_refresh_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "rollup")
    events = spark.createDataFrame(
        [_ev(1, 0.2, 1, "view", 1), _ev(2, 0.8, 2, "click", 2)], SCHEMA)
    refresh_rollup(spark, events, path)
    first = _read(spark, path)
    refresh_rollup(spark, events, path)  # crash-and-rerun
    assert _read(spark, path) == first


def test_empty_window_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "rollup")
    events = spark.createDataFrame([_ev(1, 0.0, 1, "view", 1)], SCHEMA)
    refresh_rollup(spark, events, path)
    n_commits = len(TxnLogFormat()._commits(path))
    empty = spark.createDataFrame([], SCHEMA).filter(F.lit(False))
    assert refresh_rollup(spark, empty, path) == 0
    assert len(TxnLogFormat()._commits(path)) == n_commits  # no new commit

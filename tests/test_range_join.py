"""Bucketized point-in-interval range join: equivalence with the naive
theta join, left_outer recovery, degenerate intervals, and the plan-shape
guarantee (hash join on the cell key — no BroadcastNestedLoopJoin or
cartesian) that is the operator's whole reason to exist."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.operators.range_join import (
    point_in_interval_join)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _fixtures(spark):
    points = spark.createDataFrame(
        [(u, _ts(m), pid) for (u, m, pid) in [
            (1, 10, 100), (1, 70, 101), (1, 200, 102),
            (2, 30, 200), (2, 90, 201),
            (3, 10, 300)]],
        "user_id long, ts timestamp, pid long")
    intervals = spark.createDataFrame(
        [(u, _ts(s), _ts(e), iv) for (u, s, e, iv) in [
            (1, 0, 120, "a"),      # spans two 1h buckets
            (1, 60, 80, "b"),      # overlaps a: pid 101 matches both
            (2, 85, 95, "c"),
            (2, 100, 100, "zero"),  # zero-length: matches nothing
            (3, 50, 40, "neg"),     # negative: matches nothing
        ]],
        "user_id long, w_start timestamp, w_end timestamp, iv string")
    return points, intervals


def _naive(points, intervals):
    return (points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & (F.col("p.ts") >= F.col("i.w_start"))
        & (F.col("p.ts") < F.col("i.w_end")))
        .select("p.user_id", "p.pid", "i.iv"))


def test_inner_matches_naive_theta_join(spark):
    points, intervals = _fixtures(spark)
    got = (point_in_interval_join(points, intervals, "ts", "w_start",
                                  "w_end", keys=["user_id"], bucket=3600)
           .select("user_id", "pid", "iv"))
    expect = _naive(points, intervals)
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, expect.collect())))
    # the overlap case really exercised multi-match: pid 101 hits a AND b
    rows = {(r.pid, r.iv) for r in got.collect()}
    assert (101, "a") in rows and (101, "b") in rows


def test_small_bucket_still_exact(spark):
    """A bucket much smaller than the spans multiplies the explode factor
    but must not change results."""
    points, intervals = _fixtures(spark)
    got = (point_in_interval_join(points, intervals, "ts", "w_start",
                                  "w_end", keys=["user_id"], bucket=60)
           .select("user_id", "pid", "iv"))
    expect = _naive(points, intervals)
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, expect.collect())))


def test_left_outer_keeps_unmatched_points(spark):
    points, intervals = _fixtures(spark)
    got = point_in_interval_join(points, intervals, "ts", "w_start",
                                 "w_end", keys=["user_id"], bucket=3600,
                                 how="left_outer")
    by_pid = {}
    for r in got.collect():
        by_pid.setdefault(r.pid, set()).add(r.iv)
    # matched points carry their interval(s); unmatched carry a NULL row
    assert by_pid[101] == {"a", "b"}
    assert by_pid[102] == {None}   # after interval a closed
    assert by_pid[300] == {None}   # user 3 has only degenerate intervals
    assert len(got.collect()) == len(_naive(points, intervals).collect()) + 3


def test_plan_is_hash_join_not_nested_loop(spark):
    points, intervals = _fixtures(spark)
    j = point_in_interval_join(points, intervals, "ts", "w_start", "w_end",
                               keys=["user_id"], bucket=3600)
    jvm = j.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = j._jdf.queryExecution().explainString(mode)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_subsecond_interval_ends_still_match(spark):
    """Review r6: cells came from second-truncated epochs while the
    residual used full precision, silently dropping matches in the final
    fractional second (and in sub-second intervals entirely)."""
    points = spark.createDataFrame(
        [(1, T0 + dt.timedelta(hours=1, microseconds=200_000), 100),
         (1, T0 + dt.timedelta(seconds=0, microseconds=300_000), 101)],
        "user_id long, ts timestamp, pid long")
    intervals = spark.createDataFrame(
        [(1, T0, T0 + dt.timedelta(hours=1, microseconds=900_000), "a"),
         (1, T0, T0 + dt.timedelta(microseconds=500_000), "sub")],
        "user_id long, w_start timestamp, w_end timestamp, iv string")
    got = (point_in_interval_join(points, intervals, "ts", "w_start",
                                  "w_end", keys=["user_id"], bucket=3600)
           .select("pid", "iv"))
    expect = _naive(points, intervals).select("pid", "iv")
    rows = sorted(map(tuple, got.collect()))
    assert rows == sorted(map(tuple, expect.collect()))
    assert (100, "a") in rows      # point in the interval's last fraction
    assert (101, "sub") in rows    # sub-second interval


def test_left_outer_null_safe_with_null_point_columns(spark):
    """Review r6: the left_anti recovery compared point identity with a
    null-unsafe equi-join, re-emitting matched rows that contain NULLs as
    spurious unmatched duplicates."""
    points = spark.createDataFrame(
        [(1, _ts(10), None), (1, _ts(500), None)],
        "user_id long, ts timestamp, pid long")
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(120), "a")],
        "user_id long, w_start timestamp, w_end timestamp, iv string")
    got = point_in_interval_join(points, intervals, "ts", "w_start",
                                 "w_end", keys=["user_id"], bucket=3600,
                                 how="left_outer")
    rows = sorted((r.ts, r.iv) for r in got.collect())
    # exactly two rows: the matched one and the genuinely-unmatched one
    assert rows == [(_ts(10), "a"), (_ts(500), None)]

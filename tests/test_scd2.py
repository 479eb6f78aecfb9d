"""SCD Type-2 dimension operators (round 13).

Claims pinned: append-only version ingest (idempotent under txn
replay, in-batch duplicates collapse deterministically), the derived
validity view (intervals chain per key, tombstones close history
without a current row), the current snapshot, and the point-in-time
as-of lookup fact pipelines join through.
"""

from __future__ import annotations

import os

import pytest

from datalake_ingestion_system_spark.operators import scd2
from datalake_ingestion_system_spark.sinks import TxnLogFormat


@pytest.fixture()
def dim(spark, tmp_path):
    path = str(tmp_path / "dim")
    fmt = TxnLogFormat(checkpoint_interval=None)
    b1 = spark.createDataFrame(
        [(1, 10, "bronze", "U"), (1, 20, "silver", "U"),
         (2, 10, "gold", "U")],
        "k long, ts long, tier string, op string")
    b2 = spark.createDataFrame(
        [(1, 30, "gold", "U"), (2, 25, "gold", "D"),
         (3, 30, "bronze", "U")],
        "k long, ts long, tier string, op string")
    scd2.scd2_append(spark, path, b1, "k", "ts", fmt=fmt)
    scd2.scd2_append(spark, path, b2, "k", "ts", fmt=fmt)
    return {"path": path, "fmt": fmt}


def test_scd2_view_intervals_and_tombstones(spark, dim):
    v = scd2.scd2_view(dim["fmt"].read(spark, dim["path"]),
                       "k", "ts", op_col="op")
    rows = {(r.k, r.ts): (r._valid_to, r._is_current, r.tier)
            for r in v.collect()}
    assert rows[(1, 10)] == (20, False, "bronze")
    assert rows[(1, 20)] == (30, False, "silver")
    assert rows[(1, 30)] == (None, True, "gold")
    # key 2's latest version is a tombstone: history kept, NOT current
    assert rows[(2, 10)] == (25, False, "gold")
    assert rows[(2, 25)][1] is False
    assert rows[(3, 30)] == (None, True, "bronze")

    cur = scd2.scd2_current(dim["fmt"].read(spark, dim["path"]),
                            "k", "ts", op_col="op")
    assert {(r.k, r.tier) for r in cur.collect()} \
        == {(1, "gold"), (3, "bronze")}


def test_scd2_as_of_lookup(spark, dim):
    versions = dim["fmt"].read(spark, dim["path"])
    got = {r.k: r.tier for r in scd2.scd2_as_of(
        versions, "k", "ts", 22, op_col="op").collect()}
    assert got == {1: "silver", 2: "gold"}  # key 3 not born yet
    got = {r.k: r.tier for r in scd2.scd2_as_of(
        versions, "k", "ts", 30, op_col="op").collect()}
    assert got == {1: "gold", 3: "bronze"}  # key 2 deleted at 25


def test_scd2_append_dedup_and_replay(spark, tmp_path):
    path = str(tmp_path / "dim")
    fmt = TxnLogFormat(checkpoint_interval=None)
    dup = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 10, "b")],
        "k long, ts long, attr string")
    scd2.scd2_append(spark, path, dup, "k", "ts", fmt=fmt,
                     txn_app="dimload", txn_version=1)
    assert [(r.k, r.ts, r.attr) for r in
            fmt.read(spark, path).collect()] == [(1, 10, "b")]
    # replayed epoch skips through the txn watermark (exactly-once)
    scd2.scd2_append(spark, path, dup, "k", "ts", fmt=fmt,
                     txn_app="dimload", txn_version=1)
    assert fmt.read(spark, path).count() == 1


def test_scd2_streaming_ingest_exactly_once(spark, tmp_path):
    """start_scd2_stream: micro-batches append version rows
    exactly-once (epoch = txn version); the derived view is correct
    after the drain, and a REPLAYED epoch is skipped, not duplicated."""
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, 10, "bronze"), (2, 10, "gold"), (1, 20, "silver")],
        "k long, ts long, tier string").write.parquet(src_dir + "/b1")
    fmt = TxnLogFormat(checkpoint_interval=None)
    path = str(tmp_path / "dim")
    changes = (spark.readStream.schema("k long, ts long, tier string")
               .parquet(src_dir + "/*"))
    q = scd2.start_scd2_stream(spark, changes, path, "k", "ts",
                               str(tmp_path / "ckpt"), fmt=fmt,
                               txn_app="scd2test")
    q.awaitTermination()
    assert fmt.read(spark, path).count() == 3
    cur = scd2.scd2_current(fmt.read(spark, path), "k", "ts")
    assert {(r.k, r.tier) for r in cur.collect()} \
        == {(1, "silver"), (2, "gold")}
    # replayed epoch (same app + epoch id) must be a no-op
    scd2.scd2_append(
        spark, path, spark.createDataFrame(
            [(9, 9, "x")], "k long, ts long, tier string"),
        "k", "ts", fmt=fmt, txn_app="scd2test", txn_version=0)
    assert fmt.read(spark, path).count() == 3

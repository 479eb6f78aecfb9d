"""Streaming CDC upsert (foreachBatch merge into TxnLogFormat): the
streaming twin of q_cdc_apply_latest.  Asserts convergence with the batch
apply-latest query, latest-wins across micro-batches, tombstone deletes,
and replay idempotence (the foreachBatch epoch-redelivery case)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.sinks import TxnLogFormat
from datalake_ingestion_system_spark.streaming.cdc_stream import (
    latest_per_key, start_cdc_upsert_stream)

SCHEMA = "user_id long, event_type string, ts timestamp, event_id long, value double"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(*specs):
    return [(u, op, T0 + dt.timedelta(minutes=m), eid, float(v))
            for (u, op, m, eid, v) in specs]


def _write_batch(spark, src_dir, name, specs):
    (spark.createDataFrame(_rows(*specs), SCHEMA)
     .coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/{name}"))


def _run(spark, src_glob, table, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src_glob)
    q = start_cdc_upsert_stream(
        spark, stream, table, key="user_id",
        order_cols=("ts", "event_id"), checkpoint_dir=ckpt,
        delete_expr=F.col("event_type") == "error")
    q.awaitTermination()


def _state(spark, table):
    fmt = TxnLogFormat()
    return {r.user_id: (r.event_type, r.value)
            for r in fmt.read(spark, table).collect()}


def test_upsert_converges_with_batch_apply_latest(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_batch(spark, src, "b1", [
        (1, "insert", 0, 100, 10), (2, "insert", 1, 101, 20),
        (1, "update", 2, 102, 11)])
    _run(spark, f"{src}/*", table, ckpt)
    assert _state(spark, table) == {1: ("update", 11.0), 2: ("insert", 20.0)}

    # second micro-batch: update key 2, delete key 1, insert key 3
    _write_batch(spark, src, "b2", [
        (2, "update", 3, 103, 21), (1, "error", 4, 104, 0),
        (3, "insert", 5, 105, 30)])
    _run(spark, f"{src}/*", table, ckpt)
    got = _state(spark, table)
    assert got == {2: ("update", 21.0), 3: ("insert", 30.0)}

    # convergence: equals the batch latest-per-key over the FULL change log
    full = spark.read.parquet(f"{src}/*")
    batch = (latest_per_key(full, "user_id", ("ts", "event_id"))
             .filter(F.col("event_type") != "error"))
    expect = {r.user_id: (r.event_type, r.value) for r in batch.collect()}
    assert got == expect


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """foreachBatch may re-deliver an epoch after a crash: applying the
    same change batch twice must leave the table in the same state (and
    the commit log readable throughout)."""
    from datalake_ingestion_system_spark.streaming import cdc_stream
    table = str(tmp_path / "table")
    fmt = TxnLogFormat()
    changes = spark.createDataFrame(_rows(
        (1, "insert", 0, 100, 10), (1, "update", 1, 101, 11)), SCHEMA)

    def apply_once():
        latest = cdc_stream.latest_per_key(
            changes, "user_id", ("ts", "event_id"))
        try:
            current = fmt.read(spark, table)
            merged = cdc_stream.latest_per_key(
                current.unionByName(latest), "user_id", ("ts", "event_id"))
        except FileNotFoundError:
            merged = latest
        fmt.overwrite_table(merged, table)

    apply_once()
    first = _state(spark, table)
    apply_once()  # replay
    assert _state(spark, table) == first == {1: ("update", 11.0)}


@pytest.mark.slow
def test_delete_then_reinsert(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_batch(spark, src, "b1", [(7, "insert", 0, 100, 70)])
    _run(spark, f"{src}/*", table, ckpt)
    _write_batch(spark, src, "b2", [(7, "error", 1, 101, 0)])
    _run(spark, f"{src}/*", table, ckpt)
    assert _state(spark, table) == {}
    _write_batch(spark, src, "b3", [(7, "insert", 2, 102, 71)])
    _run(spark, f"{src}/*", table, ckpt)
    assert _state(spark, table) == {7: ("insert", 71.0)}


def test_null_delete_predicate_is_not_a_tombstone(spark, tmp_path):
    """Review r6: filter(~delete_expr) dropped rows whose predicate
    evaluated to NULL (e.g. a NULL op column) — silent data loss for
    records that were never deleted.  NULL must mean 'keep'."""
    from datalake_ingestion_system_spark.streaming import cdc_stream
    table = str(tmp_path / "table")
    fmt = TxnLogFormat()
    changes = spark.createDataFrame(
        [(1, None, T0, 100, 10.0), (2, "error", T0, 101, 0.0)], SCHEMA)
    latest = cdc_stream.latest_per_key(changes, "user_id", ("ts", "event_id"))
    merged = latest.filter(
        ~F.coalesce(F.col("event_type") == "error", F.lit(False)))
    fmt.overwrite_table(merged, table)
    assert _state(spark, table) == {1: (None, 10.0)}
    # end-to-end through the stream helper too
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    (spark.createDataFrame([(3, None, T0, 102, 30.0)], SCHEMA)
     .coalesce(1).write.parquet(f"{src}/b1"))
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/*")
    q = start_cdc_upsert_stream(
        spark, stream, str(tmp_path / "t2"), key="user_id",
        order_cols=("ts", "event_id"), checkpoint_dir=ckpt,
        delete_expr=F.col("event_type") == "error")
    q.awaitTermination()
    assert _state(spark, str(tmp_path / "t2")) == {3: (None, 30.0)}


# -- CDF replica mirror (streaming/cdf_mirror.py) --------------------------


def _mirror_rows(spark, fmt, path):
    return sorted(tuple(r) for r in fmt.read(spark, path).collect())


@pytest.mark.slow
def test_cdf_mirror_tracks_source_exactly(spark, tmp_path):
    """The replica follows the upstream table through appends, DV
    deletes, and DV updates — after each availableNow drain the replica
    state equals the upstream live state, schema included (no CDF
    metadata columns leak into the replica)."""
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)
    from datalake_ingestion_system_spark.streaming.cdf_mirror import (
        start_cdf_mirror)
    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat()
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    fmt.append(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, s string, v double"),
        src)
    fmt.append(spark.createDataFrame(
        [(3, "c", 3.0)], "id long, s string, v double"), src)

    def drain():
        q = start_cdf_mirror(spark, src, dst, "id", ckpt)
        q.awaitTermination()

    drain()
    assert fmt.read(spark, dst).columns == ["id", "s", "v"]
    assert _mirror_rows(spark, fmt, dst) == _mirror_rows(spark, fmt, src)

    # upstream keeps moving while the mirror is down; restart catches up
    fmt.delete_where_dv(spark, src, "id = 1")
    fmt.update_where_dv(spark, src, "id = 2", {"v": "v * 10"})
    fmt.append(spark.createDataFrame(
        [(4, "d", 4.0)], "id long, s string, v double"), src)
    drain()
    assert _mirror_rows(spark, fmt, dst) == _mirror_rows(spark, fmt, src)
    assert _mirror_rows(spark, fmt, dst) == [
        (2, "b", 20.0), (3, "c", 3.0), (4, "d", 4.0)]

    # a drained feed replays nothing: re-running leaves the replica's
    # commit log untouched (idempotent epochs, not converged-through)
    head = fmt._commits(dst)[-1]["version"]
    drain()
    assert fmt._commits(dst)[-1]["version"] == head


@pytest.mark.slow
def test_cdf_mirror_delete_then_reinsert_same_batch(spark, tmp_path):
    """Within one drained batch the LATEST change per key wins: delete
    at v2 then re-insert at v3 leaves the key present with the new
    row."""
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)
    from datalake_ingestion_system_spark.streaming.cdf_mirror import (
        start_cdf_mirror)
    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat()
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    fmt.append(spark.createDataFrame(
        [(1, 1.0)], "id long, v double"), src)          # v0
    fmt.append(spark.createDataFrame(
        [(2, 2.0)], "id long, v double"), src)          # v1
    fmt.delete_where_dv(spark, src, "id = 1")           # v2
    fmt.append(spark.createDataFrame(
        [(1, 9.0)], "id long, v double"), src)          # v3
    q = start_cdf_mirror(spark, src, dst, "id", str(tmp_path / "ck"))
    q.awaitTermination()
    assert _mirror_rows(spark, fmt, dst) == [(1, 9.0), (2, 2.0)]


@pytest.mark.slow
def test_cdf_mirror_by_row_id_key_mutating_update(spark, tmp_path):
    """ROW-ID mirror (round 12): a KEY-REWRITING upstream update must
    round-trip — the key-based mirror's blind spot (the preimage's key
    never leaves, so a stale row survives).  Matrix: restart mid-way,
    delete + key-mutation + append across epochs, idempotent re-drain."""
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)
    from datalake_ingestion_system_spark.streaming.cdf_mirror import (
        SRC_ROW_ID, start_cdf_mirror)
    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat()
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    fmt.append(spark.createDataFrame([], "id long, v double"), src)
    fmt.set_properties(spark, src, row_tracking=True,
                       change_data_feed=True)
    fmt.append(spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id long, v double"), src)

    def drain():
        q = start_cdf_mirror(spark, src, dst, None, ckpt,
                             by_row_id=True)
        q.awaitTermination()

    drain()
    assert sorted((r.id, r.v) for r in fmt.read(spark, dst)
                  .drop(SRC_ROW_ID).collect()) == [
        (1, 1.0), (2, 2.0), (3, 3.0)]
    # the replica persists the lineage column
    assert SRC_ROW_ID in fmt.read(spark, dst).columns

    # epoch 2: the key itself mutates (2 -> 22), plus delete + append
    fmt.update_where(spark, src, "id = 2", {"id": "22", "v": "v * 10"})
    fmt.delete_where(spark, src, "id = 3")
    fmt.append(spark.createDataFrame([(4, 4.0)], "id long, v double"),
               src)
    drain()
    got = sorted((r.id, r.v) for r in fmt.read(spark, dst)
                 .drop(SRC_ROW_ID).collect())
    # key mode would have left a stale (2, 2.0) here
    assert got == [(1, 1.0), (4, 4.0), (22, 20.0)]
    # upstream and replica ids agree row for row
    up = {r.id: r._row_id for r in
          fmt.read(spark, src, with_row_ids=True).collect()}
    down = {r.id: r[SRC_ROW_ID] for r in
            fmt.read(spark, dst).collect()}
    assert up == down
    # idempotent re-drain: no new replica commit
    head = fmt._commits(dst)[-1]["version"]
    drain()
    assert fmt._commits(dst)[-1]["version"] == head


def test_cdf_mirror_by_row_id_refuses_null_ids(spark, tmp_path):
    """NULL-id changes (rows written before row_tracking) must raise,
    never silently mis-address the replica."""
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)
    from datalake_ingestion_system_spark.streaming.cdf_mirror import (
        start_cdf_mirror)
    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat()
    src = str(tmp_path / "src")
    fmt.append(spark.createDataFrame([(1, 1.0)], "id long, v double"),
               src)  # PRE-tracking rows: NULL ids in the feed
    fmt.set_properties(spark, src, row_tracking=True,
                       change_data_feed=True)
    q = start_cdf_mirror(spark, src, str(tmp_path / "dst"), None,
                         str(tmp_path / "ck"), by_row_id=True)
    with pytest.raises(Exception, match="NULL _row_id"):
        q.awaitTermination()

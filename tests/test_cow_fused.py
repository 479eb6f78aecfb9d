"""Single-pass copy-on-write fusion (round 17): merge / delete_where /
update_where fuse their probe and rewrite scans into one cached
candidate scan when the candidate set is small (``_fuse_candidates``),
and fall back to the classic two-pass shape otherwise.  Both shapes
must commit identical state — including change-feed sidecars and row
ids — and the fused cache must never outlive the operation."""

from __future__ import annotations

import os

import pytest

from datalake_ingestion_system_spark.sinks import TxnLogFormat


def _mk(spark, path, n=60):
    fmt = TxnLogFormat(checkpoint_interval=None)
    df = spark.createDataFrame(
        [(i, float(i), "ab"[i % 2]) for i in range(n)],
        "id long, v double, g string")
    fmt.append(df.limit(0), path)
    fmt.set_properties(spark, path, row_tracking=True,
                       change_data_feed=True)
    fmt.append(df.repartition(3), path)
    return fmt


def _state(spark, fmt, path):
    rows = sorted((r.id, r.v, r.g) for r in fmt.read(spark, path).collect())
    ids = sorted(
        (r.id, r._row_id is not None)
        for r in fmt.read(spark, path, with_row_ids=True).collect())
    return rows, ids


@pytest.fixture()
def force_two_pass():
    os.environ["SPARK_GRAFT_COW_FUSE_MAX_BYTES"] = "0"
    yield
    del os.environ["SPARK_GRAFT_COW_FUSE_MAX_BYTES"]


def _dml_round(spark, fmt, path):
    src = spark.createDataFrame(
        [(1, 100.0, "a", "U"), (2, 200.0, "b", "D"), (999, 9.0, "z", "U")],
        "id long, v double, g string, op string")
    m = fmt.merge(spark, path, src, "id",
                  matched_delete_condition="op = 'D'",
                  insert_condition="op <> 'D'")
    n_del = fmt.delete_where(spark, path, "id < 10")
    n_upd = fmt.update_where(spark, path, "id >= 55 AND id < 60",
                             {"v": "v + 0.25"})
    return m, n_del, n_upd


def test_fused_and_two_pass_commit_identical_state(spark, tmp_path):
    f1 = _mk(spark, str(tmp_path / "fused"))
    m1, d1, u1 = _dml_round(spark, f1, str(tmp_path / "fused"))
    s1 = _state(spark, f1, str(tmp_path / "fused"))

    os.environ["SPARK_GRAFT_COW_FUSE_MAX_BYTES"] = "0"
    try:
        f2 = _mk(spark, str(tmp_path / "twopass"))
        m2, d2, u2 = _dml_round(spark, f2, str(tmp_path / "twopass"))
        s2 = _state(spark, f2, str(tmp_path / "twopass"))
    finally:
        del os.environ["SPARK_GRAFT_COW_FUSE_MAX_BYTES"]

    assert (m1, d1, u1) == (m2, d2, u2)
    assert m1 == {"updated": 1, "deleted": 1, "inserted": 1}
    assert (d1, u1) == (9, 5)  # id=2 already deleted by the merge
    assert s1 == s2
    # every surviving row kept / was assigned a row id in both shapes
    assert all(has_id for _i, has_id in s1[1])


def test_fused_change_feed_matches_two_pass(spark, tmp_path):
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)

    spark.dataSource.register(TxnLogDataSource)

    def feed(path):
        df = (spark.read.format("txnlog")
              .option("readChangeFeed", "true")
              .option("startingVersion", "3").load(path))
        return sorted(
            (r.id, r.v, r._change_type, r._commit_version)
            for r in df.collect())

    f1 = _mk(spark, str(tmp_path / "fused"))
    _dml_round(spark, f1, str(tmp_path / "fused"))
    os.environ["SPARK_GRAFT_COW_FUSE_MAX_BYTES"] = "0"
    try:
        f2 = _mk(spark, str(tmp_path / "twopass"))
        _dml_round(spark, f2, str(tmp_path / "twopass"))
    finally:
        del os.environ["SPARK_GRAFT_COW_FUSE_MAX_BYTES"]
    assert feed(str(tmp_path / "fused")) == feed(str(tmp_path / "twopass"))


def test_fused_cache_never_outlives_the_operation(spark, tmp_path):
    sc = spark.sparkContext
    path = str(tmp_path / "t")
    fmt = _mk(spark, path)
    before = sc._jsc.sc().getPersistentRDDs().size()
    # success, no-op, and guard-raise paths must all release the cache
    fmt.delete_where(spark, path, "id = 3")
    fmt.update_where(spark, path, "id = 4", {"v": "v + 1"})
    fmt.delete_where(spark, path, "id = 10000")  # no-op
    src_dup = spark.createDataFrame(
        [(5, 1.0, "a"), (5, 2.0, "b")], "id long, v double, g string")
    with pytest.raises(ValueError, match="multiple source rows"):
        fmt.merge(spark, path, src_dup, "id")
    # merge's own source localCheckpoint RDDs are reclaimed by the
    # ContextCleaner, not unpersisted here — exclude them by storage
    # name is brittle; instead assert the count returns to the baseline
    # plus at most the checkpoint RDD of the one merge attempted
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after <= before + 1


def test_plan_info_reports_exact_scan_targets(spark, tmp_path):
    path = str(tmp_path / "t")
    fmt = _mk(spark, path)
    info: dict = {}
    fmt.read(spark, path, where="id < 10", _with_pos=True,
             _prune_only=True, _plan_info=info)
    assert info["exact"] is True
    assert info["paths"] and all(p.endswith(".parquet")
                                 for p in info["paths"])
    assert all(os.path.isfile(p) for p in info["paths"])
    # prune-only: the row filter is NOT applied (all 60 rows survive)
    n = fmt.read(spark, path, where="id < 10", _prune_only=True).count()
    assert n == 60
    # ...while the default read applies it
    assert fmt.read(spark, path, where="id < 10").count() == 10

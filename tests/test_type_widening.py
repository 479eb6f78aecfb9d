"""Type widening — Delta typeWidening parity (round 11).

``alter_table(widen_columns={col: wider_ddl})`` promotes a column to a
strictly wider type as a METADATA-ONLY commit: pre-alter files read
through a lossless cast (batch per-piece conformance AND the stream's
arrow-side mapping), post-alter writers store the wide type, time
travel serves the old schema.  Narrowing and cross-family changes are
data rewrites and are refused.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from datalake_ingestion_system_spark.sinks import TxnLogFormat

BIG = 1_000_000_000_000  # > int32 range: only correct through the widen


def _fmt():
    return TxnLogFormat(checkpoint_interval=None)


@pytest.fixture()
def widened(spark, tmp_path):
    """5 int rows, widen v to long, 3 long rows beyond int range."""
    path = str(tmp_path / "t")
    fmt = _fmt()
    fmt.append(spark.range(5).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("v")),
        path)
    fmt.alter_table(path, widen_columns={"v": "long"})
    fmt.append(spark.range(5, 8).select(
        F.col("id").alias("k"), (F.col("id") * BIG).alias("v")), path)
    return fmt, path


def test_widened_reads_serve_the_wide_type(spark, widened):
    fmt, path = widened
    got = fmt.read(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.count() == 8
    assert got.agg(F.sum("v")).head()[0] == 10 + (5 + 6 + 7) * BIG
    # predicates on both eras still work (stats family-matched)
    assert fmt.read(spark, path, where="v = 3").count() == 1
    assert fmt.read(spark, path, where=f"v >= {5 * BIG}").count() == 3


def test_time_travel_serves_the_narrow_schema(spark, widened):
    fmt, path = widened
    old = fmt.read(spark, path, as_of_version=0)
    assert dict(old.dtypes)["v"] == "int"
    assert old.count() == 5


def test_widen_survives_checkpoint_fold(spark, widened):
    fmt, path = widened
    fmt.checkpoint(path)
    fresh = _fmt()
    got = fresh.read(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.agg(F.sum("v")).head()[0] == 10 + (5 + 6 + 7) * BIG


def test_fresh_stream_casts_the_narrow_backlog(spark, widened,
                                               tmp_path):
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)
    fmt, path = widened
    spark.dataSource.register(TxnLogDataSource)
    q = (spark.readStream.format("txnlog").load(path)
         .writeStream.format("memory").queryName("widen_stream")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    r = spark.sql(
        "SELECT count(*) n, sum(v) s FROM widen_stream").head()
    assert (r.n, r.s) == (8, 10 + (5 + 6 + 7) * BIG)


def test_narrow_pinned_stream_fails_loudly(spark, widened):
    """A stream pinned BEFORE the widen would need a lossy downcast of
    post-alter files — the pin check refuses with a restart hint."""
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogStreamReader)
    fmt, path = widened
    reader = TxnLogStreamReader(
        StructType([StructField("k", LongType()),
                    StructField("v", IntegerType())]), {"path": path})
    with pytest.raises(ValueError, match="widens"):
        reader.partitions(reader.initialOffset(), reader.latestOffset())


def test_unsafe_widenings_are_refused(spark, tmp_path):
    path = str(tmp_path / "g")
    fmt = _fmt()
    fmt.append(spark.range(3).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("v"),
        F.lit(1.5).cast("double").alias("d"),
        F.lit("x").alias("s")), path)
    for bad in ({"v": "short"},        # narrowing
                {"d": "float"},        # narrowing
                {"s": "long"},         # cross-family
                {"v": "string"},       # cross-family
                {"missing": "long"}):  # unknown column
        with pytest.raises(ValueError):
            fmt.alter_table(path, widen_columns=bad)
    # combining with rename/drop of the same column is refused
    with pytest.raises(ValueError, match="separate alters"):
        fmt.alter_table(path, rename_columns={"v": "v2"},
                        widen_columns={"v": "long"})
    # the promotion chain composes across separate alters
    fmt.alter_table(path, widen_columns={"v": "long"})
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.lit(BIG).alias("v"),
        F.lit(0.0).alias("d"), F.lit("y").alias("s")), path)
    got = fmt.read(spark, path)
    assert got.agg(F.sum("v")).head()[0] == 3 + BIG


def test_widen_then_rename_in_separate_alters(spark, tmp_path):
    path = str(tmp_path / "wr")
    fmt = _fmt()
    fmt.append(spark.range(4).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("v")),
        path)
    fmt.alter_table(path, widen_columns={"v": "long"})
    fmt.alter_table(path, rename_columns={"v": "val"})
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.lit(BIG).alias("val")), path)
    got = fmt.read(spark, path)
    assert got.columns == ["k", "val"]
    assert dict(got.dtypes)["val"] == "bigint"
    assert got.agg(F.sum("val")).head()[0] == 6 + BIG


def test_catalog_scan_detects_widen_drift(spark, tmp_path):
    """An out-of-band widen makes a catalog registration stale (the
    drift check compares TYPES, not just names) — refused with the
    refresh hint, then served after refresh_table."""
    import uuid

    from datalake_ingestion_system_spark import tables
    path = str(tmp_path / "cd")
    fmt = _fmt()
    fmt.append(spark.range(4).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("v")),
        path)
    name = f"wd_{uuid.uuid4().hex[:10]}"
    tables.create_table(spark, name, path)
    try:
        assert spark.table(name).count() == 4
        fmt.alter_table(path, widen_columns={"v": "long"})
        with pytest.raises(Exception, match="refresh_table"):
            spark.table(name).count()
        tables.refresh_table(spark, name)
        got = spark.table(name)
        assert dict(got.dtypes)["v"] == "bigint"
        assert got.count() == 4
    finally:
        tables.drop_table(spark, name)


def test_cdf_maps_narrow_files_through_the_widen(spark, widened,
                                                 tmp_path):
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)
    fmt, path = widened
    spark.dataSource.register(TxnLogDataSource)
    feed = (spark.read.format("txnlog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 0).load(path))
    assert dict(feed.dtypes)["v"] == "bigint"
    ins = feed.filter("_change_type = 'insert'")
    assert ins.count() == 8
    assert ins.agg(F.sum("v")).head()[0] == 10 + (5 + 6 + 7) * BIG

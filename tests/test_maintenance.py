"""Lake maintenance: schema-evolution merge, user-zone replication,
DDL export, config backup."""

from datalake_ingestion_system_spark.plans import ingest as ing
from datalake_ingestion_system_spark.plans import maintenance as mnt
from datalake_ingestion_system_spark.sources import registry


def _ingest(spark, fx):
    conf = registry.load_registry(spark, fx["mapping"])
    ing.ingest(spark, fx["landing"], fx["storing"], conf,
               fx["state"], fx["quarantine"])
    return conf


def test_merge_evolved_table(spark, landing):
    _ingest(spark, landing)
    src = landing["storing"] + "/daily/CUSTOMER_MASTER"
    out = landing["storing"] + "/daily/CUSTOMER_MASTER_LAYOUTCHANGED"
    n = mnt.merge_evolved_table(spark, src, out)
    assert n == 5
    df = spark.read.parquet(out)
    assert "EMAIL" in df.columns  # union of both layouts
    # old-layout rows have NULL email
    assert df.filter("EMAIL IS NULL").count() == 3


def test_replicate_to_user_zone(spark, landing, tmp_path):
    _ingest(spark, landing)
    gm = spark.createDataFrame(
        [("CUSTOMER_MASTER", "grp_a", "daily", "user-bkt-1")],
        "TABLE string, GROUP string, FEQ string, USER_BUCKET string")
    dsts = mnt.replicate_to_user_zone(
        spark, landing["storing"], gm, str(tmp_path / "user"))
    assert len(dsts) == 1
    assert spark.read.parquet(dsts[0]).count() == 5


def test_replicate_layout_changed_redirect(spark, landing, tmp_path):
    _ingest(spark, landing)
    src = landing["storing"] + "/daily/CUSTOMER_MASTER"
    mnt.merge_evolved_table(
        spark, src, landing["storing"] + "/daily/CUSTOMER_MASTER_LAYOUTCHANGED")
    gm = spark.createDataFrame(
        [("CUSTOMER_MASTER", "grp_a", "daily", "user-bkt-1")],
        "TABLE string, GROUP string, FEQ string, USER_BUCKET string")
    lc = spark.createDataFrame([("CUSTOMER_MASTER",)], "TABLE string")
    dsts = mnt.replicate_to_user_zone(
        spark, landing["storing"], gm, str(tmp_path / "user"),
        layout_changed=lc)
    df = spark.read.parquet(dsts[0])
    assert "EMAIL" in df.columns  # replicated from _LAYOUTCHANGED source


def test_merge_upsert_by_key(spark, tmp_path):
    """MERGE INTO semantics on both table formats: updates replace matched
    keys, insert unmatched ones, leave the rest, and evolve the schema."""
    from datalake_ingestion_system_spark.sinks import TableFormat, TxnLogFormat
    for fmt, sub in ((TableFormat(), "pq"), (TxnLogFormat(), "txn")):
        path = str(tmp_path / sub)
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
        assert mnt.merge_upsert(spark, path, base, ["id"], fmt=fmt) == 3
        upd = spark.createDataFrame(
            [(2, "B", 1.5), (9, "Z", 0.5)], "id long, v string, w double")
        assert mnt.merge_upsert(spark, path, upd, ["id"], fmt=fmt) == 4
        got = {r.id: (r.v, r.w) for r in fmt.read(spark, path).collect()}
        assert got == {1: ("a", None), 2: ("B", 1.5),
                       3: ("c", None), 9: ("Z", 0.5)}, sub


def test_backup_and_ddl_export(spark, landing, tmp_path):
    conf = _ingest(spark, landing)
    out = mnt.backup_config(conf, str(tmp_path / "bkp"), ts="20190601_000000")
    assert spark.read.parquet(out).count() == 4
    ddl = mnt.export_ddl(spark)
    assert ddl.columns == ["table", "ddl", "exported_at"]


def test_expire_partitions(spark, tmp_path):
    """Retention drops exactly the partitions older than the cutoff —
    directory unlinks, no data rewrite — and ignores malformed values."""
    import os
    from datalake_ingestion_system_spark.plans.maintenance import \
        expire_partitions
    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],
        "v int, TRANSFERRED_DATE string")
    df.write.partitionBy("TRANSFERRED_DATE").parquet(out)
    os.makedirs(f"{out}/TRANSFERRED_DATE=__HIVE_DEFAULT_PARTITION__",
                exist_ok=True)
    dropped = expire_partitions(spark, out, "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = spark.read.parquet(out)
    assert [r.v for r in left.collect()] == [3]
    assert os.path.isdir(f"{out}/TRANSFERRED_DATE=__HIVE_DEFAULT_PARTITION__")


def test_zorder_write_tightens_stats_on_both_columns(spark, tmp_path):
    """Z-order layout must leave parquet per-file min/max ranges narrow on
    BOTH clustered columns (the multi-column pruning contract); a
    single-column sort leaves the second column's ranges ~full-width."""
    import glob as globmod

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from datalake_ingestion_system_spark.plans.maintenance import zorder_write

    n = 20_000
    df = (spark.range(n)
          .select((F.col("id") % 1000).alias("a"),
                  F.floor(F.col("id") / 20).alias("b")))

    def mean_coverage(path, col, global_span):
        covs = []
        for f in globmod.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            covs.append((hi - lo) / global_span)
        return sum(covs) / len(covs)

    zpath = str(tmp_path / "zorder")
    zorder_write(df, zpath, ["a", "b"], n_files=16)
    spath = str(tmp_path / "sorted_a")
    (df.repartitionByRange(16, "a").sortWithinPartitions("a")
       .write.parquet(spath))

    za, zb = mean_coverage(zpath, "a", 999), mean_coverage(zpath, "b", n / 20)
    sa, sb = mean_coverage(spath, "a", 999), mean_coverage(spath, "b", n / 20)
    # z-order: BOTH columns substantially narrower than full width
    assert za < 0.5 and zb < 0.5, (za, zb)
    # single-column sort: great on a, useless on b — the contrast that
    # justifies z-ordering
    assert sa < 0.2
    assert zb < sb, (zb, sb)
    # and the data itself round-trips
    assert (spark.read.parquet(zpath).count() == n)


def test_zorder_write_empty_and_all_null_inputs(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from datalake_ingestion_system_spark.plans.maintenance import zorder_write
    empty = spark.createDataFrame([], "a long, b long")
    zorder_write(empty, str(tmp_path / "e"), ["a", "b"])  # plain no-op write
    assert spark.read.parquet(str(tmp_path / "e")).count() == 0
    nulls = spark.range(5).select(
        F.lit(None).cast("long").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="entirely NULL"):
        zorder_write(nulls, str(tmp_path / "n"), ["a", "b"])


def test_orc_table_format_round_trip(spark, tmp_path):
    """The TableFormat seam's second native codec: ORC writes/reads with
    the same contract as parquet — dynamic partition overwrite, append,
    mergeSchema union — and replication mirrors through it unchanged."""
    import pytest

    from datalake_ingestion_system_spark.sinks import TableFormat

    fmt = TableFormat("orc")
    p = str(tmp_path / "orc_tbl")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")],
        "id int, v string, TRANSFERRED_DATE string")
    fmt.overwrite_partitions(df, p, "TRANSFERRED_DATE")
    assert sorted(r.id for r in fmt.read(spark, p).collect()) == [1, 2]
    # replace one partition only (idempotent dynamic overwrite)
    upd = spark.createDataFrame(
        [(3, "c", "2024-01-02")], "id int, v string, TRANSFERRED_DATE string")
    fmt.overwrite_partitions(upd, p, "TRANSFERRED_DATE")
    assert sorted(r.id for r in fmt.read(spark, p).collect()) == [1, 3]
    # append contract on a plain (non-partitioned) table
    q = str(tmp_path / "orc_plain")
    fmt.overwrite_table(df, q)
    fmt.append(upd, q)
    assert fmt.read(spark, q).count() == 3
    # schema-evolution read: a partition written with an extra column
    ev = spark.createDataFrame(
        [(4, "d", "x", "2024-01-03")],
        "id int, v string, extra string, TRANSFERRED_DATE string")
    fmt.overwrite_partitions(ev, p, "TRANSFERRED_DATE")
    merged = fmt.read_merged(spark, p)
    assert "extra" in merged.columns
    assert merged.filter("extra IS NULL").count() == 2  # ids 1 and 3
    # the seam rejects codecs this container can't write
    with pytest.raises(ValueError, match="avro"):
        TableFormat("avro")


def test_orc_replication_mirror(spark, landing, tmp_path):
    """User-zone replication transcoding a parquet storing zone into an
    ORC consumer zone via the ``dst_fmt`` knob."""
    from datalake_ingestion_system_spark.sinks import TableFormat

    _ingest(spark, landing)
    gm = spark.createDataFrame(
        [("CUSTOMER_MASTER", "grp_a", "daily", "user-bkt-1")],
        "TABLE string, GROUP string, FEQ string, USER_BUCKET string")
    dsts = mnt.replicate_to_user_zone(
        spark, landing["storing"], gm, str(tmp_path / "user"),
        dst_fmt=TableFormat("orc"))
    assert spark.read.orc(dsts[0]).count() == 5
    import glob
    assert glob.glob(dsts[0] + "/*.orc")  # really ORC files on disk

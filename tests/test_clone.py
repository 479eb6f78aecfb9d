"""CLONE (Delta ``CREATE TABLE ... CLONE`` parity): a zero-copy
independent table seeded from the source's resolved state.

The seed is the SAME checkpoint-form record `_write_checkpoint`
produces (records are table-relative by protocol, hence portable),
published as both the raw head and the checkpoint — the standard shape
of a log-pruned table — with every live data/vector file HARDLINKED
under its identical relative path.  Unlike Delta's shallow clone, the
links keep shared inodes alive, so vacuuming or deleting the SOURCE can
never break the clone."""

import os

import pytest
from pyspark.sql import functions as F

from datalake_ingestion_system_spark.sinks import TxnLogFormat


def _df(spark, lo=0, hi=20):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))


class TestCloneState:
    def test_clone_equals_source_and_evolves_independently(
            self, spark, tmp_path):
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)
        fmt.append(_df(spark, 20, 30), src)
        fmt.delete_where_dv(spark, src, "k < 5")        # live DV
        fmt.alter_table(src, add_columns={"tag": "string"},
                        column_defaults={"tag": "old"})  # alter+default
        v = fmt.clone(src, dst)
        key = lambda df: sorted((r.k, r.v, r.tag) for r in df.collect())
        assert key(fmt.read(spark, dst)) == key(fmt.read(spark, src))
        # writes to one never touch the other
        fmt.append(spark.createDataFrame([(100, 1, "new")],
                                         "k long, v long, tag string"),
                   dst)
        fmt.delete_where(spark, src, "k >= 25")
        assert fmt.read(spark, dst).count() == 26
        assert fmt.read(spark, src).count() == 20
        # history starts at the seed (one checkpoint row)
        assert [r["action"] for r in fmt.history(dst)][-1] == "checkpoint"
        with pytest.raises(ValueError, match="horizon"):
            fmt.read(spark, dst, as_of_version=v - 1)

    def test_clone_at_historical_version(self, spark, tmp_path):
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)                      # v0
        fmt.delete_where(spark, src, "k >= 10")          # v1
        assert fmt.clone(src, dst, version=0) == 0
        assert fmt.read(spark, dst).count() == 20        # pre-delete
        assert fmt.read(spark, src).count() == 10

    def test_clone_refuses_existing_destination(self, spark, tmp_path):
        fmt = TxnLogFormat()
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)
        fmt.append(_df(spark), dst)
        with pytest.raises(FileExistsError):
            fmt.clone(src, dst)
        with pytest.raises(ValueError, match="does not exist"):
            fmt.clone(src, str(tmp_path / "dst2"), version=99)

    def test_clone_survives_source_vacuum_and_deletion(self, spark,
                                                       tmp_path):
        """The anti-Delta-shallow-clone guarantee: hardlinks keep the
        shared inodes alive, so the source can be compacted, vacuumed,
        or deleted outright and the clone still reads."""
        import shutil
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)
        fmt.clone(src, dst)
        fmt.compact(spark, src)
        fmt.vacuum(src, retain_hours=0.0)
        assert fmt.read(spark, dst).count() == 20
        shutil.rmtree(src)
        assert fmt.read(spark, dst).count() == 20

    def test_clone_carries_stats_properties_identity_protocol(
            self, spark, tmp_path):
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)
        fmt.append(_df(spark, 1000, 1020), src)
        fmt.set_properties(spark, src, constraints={"pos": "v >= 0"},
                           identity_columns={
                               "rid": {"start": 1, "step": 1}})
        fmt.set_protocol(src, reader_features=["deletion_vectors"])
        fmt.append(_df(spark, 50, 60), src)              # allocates rids
        v = fmt.clone(src, dst)
        # properties bind dst writers
        with pytest.raises(ValueError, match="pos"):
            fmt.append(spark.createDataFrame([(1, -1)], "k long, v long"),
                       dst)
        # identity continues from the source watermark — never reissues
        high = fmt.details(dst)["identity_high"]["rid"]
        fmt.append(_df(spark, 70, 75), dst)
        rids = [r.rid for r in fmt.read(spark, dst)
                .filter("k >= 70 AND k < 80").collect()]
        assert min(rids) == high + 1
        # protocol carried
        assert fmt.protocol(dst)["reader_features"] == [
            "deletion_vectors"]
        # per-file stats carried: a skipping read on dst prunes files
        skipped = fmt.read(spark, dst, where="k >= 1000")
        files = {os.path.basename(p) for p in skipped.inputFiles()}
        full = {os.path.basename(p)
                for p in fmt.read(spark, dst).inputFiles()}
        assert files < full, "stats skipping should prune cloned files"
        assert skipped.count() == 20

    def test_clone_sidecar_form_and_empty_entries(self, spark, tmp_path):
        """A source above the sidecar threshold clones into a
        sidecar-form seed; an empty live dir (overwrite of an empty
        frame) must exist at dst so read() does not flag corruption."""
        fmt = TxnLogFormat(checkpoint_interval=None,
                           checkpoint_sidecar_files=4)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        for i in range(3):
            fmt.append(_df(spark, i * 10, i * 10 + 10)
                       .repartition(2), src)
        v = fmt.clone(src, dst)
        cp = os.path.join(dst, "_txn_log",
                          f"{v:012d}.checkpoint.stats.parquet")
        assert os.path.exists(cp), "expected a sidecar-form seed"
        assert fmt.read(spark, dst).count() == 30
        # skipping still works through the cloned sidecar
        assert fmt.read(spark, dst, where="k >= 20").count() == 10

    def test_clone_seed_is_both_raw_head_and_checkpoint(self, spark,
                                                        tmp_path):
        """_commit assigns versions from RAW names: without the raw
        twin, the first append to a clone would claim version 0 and
        vanish below the seed checkpoint."""
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)
        fmt.append(_df(spark, 20, 30), src)
        v = fmt.clone(src, dst)
        log = os.path.join(dst, "_txn_log")
        assert f"{v:012d}.json" in os.listdir(log)
        assert f"{v:012d}.checkpoint.json" in os.listdir(log)
        fmt.append(_df(spark, 100, 105), dst)
        assert fmt.details(dst)["version"] == v + 1
        assert fmt.read(spark, dst).count() == 35

    def test_clone_then_clone_chains(self, spark, tmp_path):
        fmt = TxnLogFormat(checkpoint_interval=None)
        a, b, c = (str(tmp_path / n) for n in ("a", "b", "c"))
        fmt.append(_df(spark), a)
        fmt.clone(a, b)
        fmt.append(_df(spark, 100, 110), b)
        v = fmt.clone(b, c)
        assert fmt.read(spark, c).count() == 30
        fmt.delete_where(spark, c, "k >= 100")
        assert fmt.read(spark, c).count() == 20
        assert fmt.read(spark, b).count() == 30


class TestTimestampTargets:
    def test_clone_and_restore_at_timestamp(self, spark, tmp_path):
        """CLONE/RESTORE ... TIMESTAMP AS OF resolve through the same
        UTC-pinned cutoff rule as read(as_of_timestamp=...)."""
        import json as _json
        import os as _os

        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark, 0, 10), src)                  # v0
        fmt.append(_df(spark, 10, 30), src)                 # v1
        # pin a cutoff strictly between the two commit timestamps
        log = _os.path.join(src, "_txn_log")
        ts = []
        for n in sorted(_os.listdir(log)):
            if n.endswith(".json"):
                with open(_os.path.join(log, n)) as f:
                    ts.append(_json.load(f)["ts"])
        cutoff = (ts[0] + ts[1]) / 2
        assert fmt.clone(src, dst, timestamp=cutoff) == 0
        assert fmt.read(spark, dst).count() == 10
        with pytest.raises(ValueError, match="not both"):
            fmt.clone(src, str(tmp_path / "d2"), version=0,
                      timestamp=cutoff)
        v = fmt.restore(spark, src, timestamp=cutoff)
        assert fmt.read(spark, src).count() == 10
        # the restore itself is one more commit
        assert fmt.details(src)["version"] == v == 2
        with pytest.raises(ValueError, match="version or timestamp"):
            fmt.restore(spark, src)


class TestCloneHardening:
    def test_clone_of_partitioned_overwrite_table(self, spark, tmp_path):
        """The reference's primary pattern: dynamic partition
        overwrites (hive-laid-out staged dirs, value-subtraction
        bookkeeping).  A clone must carry the nested files, the
        partition metadata, AND the log-level partition pruning."""
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        df = spark.createDataFrame(
            [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],
            "k long, d string")
        fmt.overwrite_partitions(df, src, "d")
        # re-overwrite one partition: subtraction bookkeeping must carry
        fmt.overwrite_partitions(spark.createDataFrame(
            [(20, "2024-01-02")], "k long, d string"), src, "d")
        fmt.clone(src, dst)
        # hive partition-type inference reads the dir values back as
        # DATEs (documented hazard) — clone must simply agree with the
        # source read, stringified for comparison
        key = lambda p: sorted((r.k, str(r.d))
                               for r in fmt.read(spark, p).collect())
        assert key(dst) == key(src) == [
            (1, "2024-01-01"), (3, "2024-01-03"), (20, "2024-01-02")]
        # log-level partition pruning still plans O(matching dirs):
        # '2024-01-03' lives only in the first overwrite's recorded
        # values, so the second dir must drop from the plan
        pruned = fmt.read(spark, dst, where="d = '2024-01-03'")
        assert pruned.count() == 1
        dirs = {p.split("_txn_data/")[1].split("/")[0]
                for p in pruned.inputFiles()}
        assert len(dirs) == 1, "partition pruning lost in the clone"

    def test_vacuum_on_clone_never_breaks_source(self, spark, tmp_path):
        """Hardlink safety is TWO-WAY: compact+vacuum on the CLONE
        deletes only the clone's link names; the shared inodes keep
        serving the source."""
        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark), src)
        fmt.append(_df(spark, 20, 30), src)
        fmt.clone(src, dst)
        fmt.compact(spark, dst)
        fmt.vacuum(dst, retain_hours=0.0)
        assert fmt.read(spark, dst).count() == 30
        assert fmt.read(spark, src).count() == 30
        assert sorted(r.k for r in fmt.read(spark, src).collect()) == \
            sorted(r.k for r in fmt.read(spark, dst).collect())


class TestConvert:
    def test_convert_flat_parquet_dir(self, spark, tmp_path):
        """CONVERT TO DELTA parity: a plain parquet directory becomes a
        txnlog table in place — zero bytes rewritten (hardlinks), stats
        harvested so skipping works from commit 0, and every later
        write primitive behaves as on a native table."""
        d = str(tmp_path / "flat")
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")) \
            .coalesce(3).write.parquet(d)
        fmt = TxnLogFormat(checkpoint_interval=None)
        assert fmt.convert(spark, d) == 0
        assert fmt.read(spark, d).count() == 100
        # footer-harvested stats prune files immediately
        sk = fmt.read(spark, d, where="k >= 90")
        assert len(sk.inputFiles()) < len(fmt.read(spark, d).inputFiles())
        assert sk.count() == 10
        # native write surface works on the converted table
        assert fmt.delete_where_dv(spark, d, "k < 10") == 10
        fmt.append(spark.range(200, 205).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")), d)
        assert fmt.read(spark, d).count() == 95
        # originals untouched (non-destructive): plain reader still works
        assert spark.read.parquet(
            *[os.path.join(d, n) for n in os.listdir(d)
              if n.endswith(".parquet")]).count() == 100
        with pytest.raises(FileExistsError):
            fmt.convert(spark, d)

    def test_convert_partitioned_dir(self, spark, tmp_path):
        d = str(tmp_path / "part")
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a"), (4, "c")],
            "k long, p string").write.partitionBy("p").parquet(d)
        fmt = TxnLogFormat(checkpoint_interval=None)
        fmt.convert(spark, d)
        got = sorted((r.k, r.p) for r in fmt.read(spark, d).collect())
        assert got == [(1, "a"), (2, "b"), (3, "a"), (4, "c")]
        assert fmt.read(spark, d, where="p = 'b'").count() == 1
        # the commit recorded the partition column and values, so a
        # LATER dynamic overwrite subtracts correctly
        fmt.overwrite_partitions(spark.createDataFrame(
            [(20, "b")], "k long, p string"), d, "p")
        got = sorted((r.k, str(r.p))
                     for r in fmt.read(spark, d).collect())
        assert got == [(1, "a"), (3, "a"), (4, "c"), (20, "b")]

    def test_convert_rejects_ambiguous_layouts(self, spark, tmp_path):
        fmt = TxnLogFormat()
        d = str(tmp_path / "mixed")
        os.makedirs(os.path.join(d, "p=a"))
        spark.range(3).coalesce(1).write.mode("append").parquet(d)
        # the flat write put parquet at top level; add a file under p=a
        spark.range(2).coalesce(1).write.parquet(os.path.join(d, "tmp"))
        import shutil
        for n in os.listdir(os.path.join(d, "tmp")):
            if n.endswith(".parquet"):
                shutil.move(os.path.join(d, "tmp", n),
                            os.path.join(d, "p=a", n))
        shutil.rmtree(os.path.join(d, "tmp"))
        with pytest.raises(ValueError, match="mixed layout"):
            fmt.convert(spark, d)
        with pytest.raises(FileNotFoundError):
            fmt.convert(spark, str(tmp_path / "empty_dir_missing"))


class TestCloneRace:
    def test_concurrent_twin_clones_converge(self, spark, tmp_path):
        """Racing cloners of the SAME source converge instead of
        corrupting: data links are idempotent (same inode), the seed
        record's os.link picks a winner and identical-content losers
        stand down — every racer returns success and the destination is
        a single healthy table."""
        from concurrent.futures import ThreadPoolExecutor

        fmt = TxnLogFormat(checkpoint_interval=None)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        fmt.append(_df(spark).repartition(4), src)
        fmt.append(_df(spark, 20, 30).repartition(3), src)

        def one(_):
            return TxnLogFormat().clone(src, dst)

        with ThreadPoolExecutor(max_workers=4) as ex:
            got = list(ex.map(one, range(4)))
        assert got == [1, 1, 1, 1]
        log = os.path.join(dst, "_txn_log")
        names = sorted(n for n in os.listdir(log) if n.endswith(".json"))
        assert names == ["000000000001.checkpoint.json",
                         "000000000001.json"]
        assert fmt.read(spark, dst).count() == 30
        # a clone racing a DIFFERENT table at dst still fails loudly
        other = str(tmp_path / "other")
        fmt.append(_df(spark, 99, 100), other)
        with pytest.raises(FileExistsError):
            fmt.clone(other, dst)

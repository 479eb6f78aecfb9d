"""CONVERT TO TXNLOG (round 16 — Delta CONVERT TO DELTA parity).

An existing plain-parquet directory becomes a txnlog table by
hardlinking every data file into one staging dir (zero bytes moved)
and publishing one append-form version-0 commit with footer stats.
The read contract: the converted table returns exactly what
``spark.read.parquet(src_dir)`` returns — including Spark's hive
partition-type inference (the type lives in the path, not the files).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datalake_ingestion_system_spark import tables
from datalake_ingestion_system_spark.sinks import TxnLogFormat


def _base(spark):
    return spark.range(60).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.col("id") % 3).alias("p"),
        (F.col("id") * 1.5).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v", "p").collect())


def test_convert_flat_and_hive_zero_copy(spark, tmp_path):
    fmt = TxnLogFormat(checkpoint_interval=None)
    base = _base(spark)
    src = str(tmp_path / "hive")
    dst = str(tmp_path / "t")
    base.write.partitionBy("p").parquet(src)
    v = fmt.convert_parquet(spark, src, dst)
    assert v == 0
    plain = _rows(spark.read.parquet(src))
    assert _rows(fmt.read(spark, dst)) == plain
    # zero-copy: converted file shares the source inode
    s0 = os.path.join(src, "p=g0")
    f0 = [f for f in os.listdir(s0) if f.endswith(".parquet")][0]
    (linked,) = glob.glob(
        os.path.join(dst, "_txn_data", "*", "p=g0", f0))
    assert os.path.samefile(os.path.join(s0, f0), linked)
    # footer stats landed: data skipping works from the first query
    skim = fmt.read(spark, dst, where="k < 5")
    assert skim.count() == 5
    # the whole format surface works on the converted table
    assert fmt.delete_where(spark, dst, "k >= 50") == 10
    assert fmt.read(spark, dst).count() == 50
    assert fmt.read(spark, dst, as_of_version=0).count() == 60
    # flat layout
    src2, dst2 = str(tmp_path / "flat"), str(tmp_path / "t2")
    base.write.parquet(src2)
    fmt.convert_parquet(spark, src2, dst2)
    assert _rows(fmt.read(spark, dst2)) == plain


def test_convert_refusals_and_source_untouched(spark, tmp_path):
    fmt = TxnLogFormat(checkpoint_interval=None)
    base = _base(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "t")
    base.write.parquet(src)
    n_before = len(os.listdir(src))
    fmt.convert_parquet(spark, src, dst)
    # source untouched: same entries, still plain-readable
    assert len(os.listdir(src)) == n_before
    assert spark.read.parquet(src).count() == 60
    with pytest.raises(ValueError, match="already exists"):
        fmt.convert_parquet(spark, src, dst)
    with pytest.raises(FileNotFoundError, match="no parquet files"):
        fmt.convert_parquet(spark, str(tmp_path / "empty"),
                            str(tmp_path / "t3"))
    # multi-level hive refuses loudly
    deep = str(tmp_path / "deep")
    base.withColumn("q", F.lit("x")) \
        .write.partitionBy("p", "q").parquet(deep)
    with pytest.raises(ValueError, match="one hive level"):
        fmt.convert_parquet(spark, deep, str(tmp_path / "t4"))


def test_convert_sql_arm_registers(spark, tmp_path):
    import uuid
    base = _base(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "t")
    base.write.partitionBy("p").parquet(src)
    name = f"conv_{uuid.uuid4().hex[:8]}"
    v = tables.sql(
        spark, f"CONVERT TO TXNLOG parquet.`{src}` "
               f"LOCATION '{dst}' AS {name}")
    assert v == 0
    assert spark.table(name).count() == 60
    assert spark.sql(
        f"SELECT count(*) AS c FROM {name} WHERE p = 'g1'").head().c \
        == base.filter("p = 'g1'").count()
    with pytest.raises(ValueError, match="unsupported CONVERT"):
        tables.sql(spark, "CONVERT TO TXNLOG something")
    tables.drop_table(spark, name)

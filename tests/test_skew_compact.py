"""Skew-salted join correctness + small-file compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.operators.skew import salted_join
from datalake_ingestion_system_spark.plans.maintenance import compact_table


def _skewed(spark):
    # 9000 rows on key 1 (hot), 1000 spread over 2..101
    hot = spark.range(9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        (F.col("id") % 100 + 2).alias("k"), F.col("id").alias("v"))
    return hot.union(cold)


def _dim(spark):
    return spark.range(102).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name"))


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed(spark), _dim(spark)
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k", salts=8).groupBy("k").count()
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_spreads_hot_key(spark):
    fact = _skewed(spark)
    f = fact.withColumn("_s", (F.rand(42) * 8).cast("int"))
    n_sub = (f.filter(F.col("k") == 1).select("_s").distinct().count())
    assert n_sub == 8, "hot key did not spread across all salts"


def test_salted_join_left_and_anti(spark):
    fact, dim = _skewed(spark), _dim(spark)
    small_dim = dim.filter(F.col("k") <= 50)
    left = salted_join(fact, small_dim, "k", salts=4, how="left")
    assert left.count() == fact.count()
    anti = salted_join(fact, small_dim, "k", salts=4, how="left_anti")
    assert anti.count() == fact.filter(F.col("k") > 50).count()


def test_compact_table(spark, tmp_path):
    out = str(tmp_path / "frag")
    spark.range(10000).repartition(40).write.parquet(out)
    before, after = compact_table(spark, out, target_file_bytes=10**9)
    assert before == 40 and after == 1
    assert spark.read.parquet(out).count() == 10000


def test_compact_table_partitioned(spark, tmp_path):
    out = str(tmp_path / "fragp")
    (spark.range(1000)
     .withColumn("d", F.when(F.col("id") % 2 == 0, "a").otherwise("b"))
     .repartition(20).write.partitionBy("d").parquet(out))
    before, after = compact_table(spark, out, target_file_bytes=10**9,
                                  partition_col="d")
    assert after < before
    df = spark.read.parquet(out)
    assert df.count() == 1000
    assert df.filter(F.col("d") == "a").count() == 500


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from datalake_ingestion_system_spark.plans.bucketing import write_clustered

    out = str(tmp_path / "clustered")
    df = spark.range(100000).select(
        (F.xxhash64("id") % 10000).alias("k"), F.col("id").alias("v"))
    write_clustered(df, out, ["k"], n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    overlaps = sum(1 for (a, b) in zip(ranges, ranges[1:]) if b[0] <= a[1])
    # range partition boundaries are sampled → at most tiny edge overlap
    assert overlaps <= 1, f"clustered files overlap heavily: {ranges}"
    # data intact
    assert spark.read.parquet(out).count() == 100000


def test_refresh_rollup_incremental_equals_full(spark, tmp_path):
    from datalake_ingestion_system_spark.plans.maintenance import refresh_rollup

    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "rollup")
    day1 = [(1, "a", "2024-01-01", 10.0), (2, "b", "2024-01-01", 5.0)]
    day2 = [(3, "a", "2024-01-02", 7.0), (4, "a", "2024-01-02", 1.0)]
    schema = "id long, grp string, d string, x double"
    spark.createDataFrame(day1, schema).write.partitionBy("d").parquet(fact)
    n = refresh_rollup(spark, fact, roll, "d", ["grp"],
                       {"total": "round(sum(x), 2)", "n": "count(*)"})
    assert n == 1

    # new day lands; refresh ONLY that partition
    (spark.createDataFrame(day2, schema)
     .write.mode("append").partitionBy("d").parquet(fact))
    n = refresh_rollup(spark, fact, roll, "d", ["grp"],
                       {"total": "round(sum(x), 2)", "n": "count(*)"},
                       changed_partitions=["2024-01-02"])
    assert n == 1

    got = {(str(r.d), r.grp): (r.total, r.n)
           for r in spark.read.parquet(roll).collect()}
    assert got == {("2024-01-01", "a"): (10.0, 1),
                   ("2024-01-01", "b"): (5.0, 1),
                   ("2024-01-02", "a"): (8.0, 2)}

    # day-1 reprocess (value changes) refreshed in place, day-2 untouched
    (spark.createDataFrame([(1, "a", "2024-01-01", 99.0)], schema)
     .write.mode("overwrite").partitionBy("d")
     .option("partitionOverwriteMode", "dynamic").parquet(fact))
    refresh_rollup(spark, fact, roll, "d", ["grp"],
                   {"total": "round(sum(x), 2)", "n": "count(*)"},
                   changed_partitions=["2024-01-01"])
    got = {(str(r.d), r.grp): (r.total, r.n)
           for r in spark.read.parquet(roll).collect()}
    assert got == {("2024-01-01", "a"): (99.0, 1),
                   ("2024-01-02", "a"): (8.0, 2)}


def test_z_order_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files must bound BOTH dimensions; a linear sort bounds only
    its leading column (the second dimension spans ~the full domain in every
    file)."""
    import glob

    import pyarrow.parquet as pq

    from datalake_ingestion_system_spark.plans.bucketing import (
        write_clustered, z_order_key)

    df = (spark.range(65536)
          .select((F.col("id") % 256).alias("a"),
                  F.floor(F.col("id") / 256).alias("b")))

    def spread(path, col_idx):
        widths = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min); maxs.append(st.max)
            widths.append(max(maxs) - min(mins))
        return sum(widths) / len(widths)

    zp = str(tmp_path / "zorder")
    zdf = df.withColumn("zk", z_order_key(["a", "b"], bits=8))
    write_clustered(zdf, zp, ["zk"], n_files=16)
    lp = str(tmp_path / "linear")
    write_clustered(df, lp, ["a"], n_files=16)

    # columns in written files: zorder file has (a, b, zk); linear (a, b)
    z_a, z_b = spread(zp, 0), spread(zp, 1)
    l_a, l_b = spread(lp, 0), spread(lp, 1)
    assert l_b > 200, "control: linear-by-a should NOT bound b"
    assert z_a < 128 and z_b < 128, (
        f"z-order should bound both dims: a={z_a}, b={z_b}")
    assert spark.read.parquet(zp).count() == 65536


def test_aqe_skew_join_rescue(spark):
    """Pins the engine's THIRD skew tool (besides salted_join and the
    chain-chunked LSH buckets): AQE's runtime skew-join split.  With
    thresholds scaled to the fixture, a 2/3-hot-key sort-merge join must
    come out of execution with ``skew=true`` on the join node — i.e. the
    conf the session ships actually rescues an unsalted skewed join at
    runtime.  (The executed plan only reflects AQE decisions AFTER an
    action; an unexecuted AdaptiveSparkPlan shows the initial plan.)"""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(300000).select(
            F.when(F.col("id") % 3 != 0, F.lit(7))
             .otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"),
                     F.col("id").cast("string")).alias("p"))
        dim = spark.range(1000).select(F.col("id").alias("k"),
                                       F.col("id").alias("v"))
        j = fact.join(dim, "k")
        assert len(j.collect()) == 300000  # every fact row matches one dim
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed join"
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_compact_table_transcodes_codec(spark, tmp_path):
    """Compaction as the codec-transcode point: zstd output files, smaller
    than the snappy originals on compressible data (the modern answer to
    the reference's hard-coded gzip, D:123-124)."""
    import glob
    import os

    import pyspark.sql.functions as F

    from datalake_ingestion_system_spark.plans import maintenance as mnt

    p = str(tmp_path / "t")
    (spark.range(50000)
     .select(F.concat(F.lit("the quick brown fox jumps over the lazy dog "),
                      (F.col("id") % 97).cast("string")).alias("s"))
     .repartition(16).write.parquet(p))
    before = sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    mnt.compact_table(spark, p, target_file_bytes=1 << 20, codec="zstd")
    files = glob.glob(f"{p}/*.parquet")
    assert files and all(".zstd." in f for f in files)
    after = sum(os.path.getsize(f) for f in files)
    assert after < before  # fewer files AND denser codec
    assert spark.read.parquet(p).count() == 50000

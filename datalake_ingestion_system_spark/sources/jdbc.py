"""JDBC (RDBMS) ingestion source with incremental watermarking.

Rebuilds CONVERT_RDS_TO_S3_DAILY_JOB.PY's three load modes (C:77-102):

- ``full``            — unpartitioned full dump, overwrite          (C:77-78)
- ``first_load``      — partitioned table not yet in the lake:
                        full pull + derived date partition column   (C:84-92)
- ``incremental``     — lake table exists: pull only rows with
                        watermark strictly above the lake max       (C:96-102)

Improvements over the reference: the existence probe is
``spark.catalog.tableExists``-style path probing instead of catching
``AnalysisException`` (C:83-87); the derived partition uses ``yyyy`` (the
reference's ``'YYYY-MM-dd'`` week-year bug, §0.3/P4, is fixed); and the
watermark predicate is pushed INTO the JDBC query so the database ships only
new rows (the reference pulled the full table then filtered in Spark).
Parallel pull via partitionColumn/numPartitions is exposed for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jdbc(spark: SparkSession, url: str, dbtable: str,
              driver: str | None = None,
              partition_column: str | None = None,
              num_partitions: int = 1,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              **options: str) -> DataFrame:
    """Plain JDBC table scan (S4).  With ``partition_column`` the pull is
    split into ``num_partitions`` parallel range queries — the scale path for
    large source tables."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", dbtable))
    if driver:
        reader = reader.option("driver", driver)
    if partition_column:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def _lake_exists(spark: SparkSession, path: str) -> bool:
    """Path-probe replacement for the reference's try/except-AnalysisException
    catalog probe (C:83-87)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def dump_table(spark: SparkSession, url: str, dbtable: str, out_dir: str,
               partitioned: bool = False,
               partition_key: str | None = None,
               driver: str | None = None,
               repartition: int = 5,
               **jdbc_options: str) -> str:
    """One table dump with the reference's three-mode dispatch.

    Returns the mode used ('full' | 'first_load' | 'incremental').
    """
    if not partitioned:
        df = read_jdbc(spark, url, dbtable, driver, **jdbc_options)
        df.repartition(repartition).write.mode("overwrite").parquet(out_dir)
        return "full"

    assert partition_key, "partitioned dump needs partition_key"
    part_col = f"{partition_key}_date"

    def first_load() -> str:
        df = read_jdbc(spark, url, dbtable, driver, **jdbc_options)
        out = df.withColumn(part_col,
                            F.date_format(partition_key, "yyyy-MM-dd"))
        (out.repartition(part_col).write.mode("overwrite")
            .partitionBy(part_col).parquet(out_dir))
        return "first_load"

    if not _lake_exists(spark, out_dir):
        return first_load()

    # incremental: lake max watermark, pushed down into the source query so
    # the DB ships only new rows (reference filtered post-pull, C:96-99)
    import datetime

    wm = spark.read.parquet(out_dir).agg(F.max(partition_key)).head()[0]
    if wm is None:
        # lake path exists but holds no usable watermark (empty / all-null):
        # a '> None' predicate would be invalid SQL — full re-pull instead
        return first_load()
    if isinstance(wm, datetime.datetime):
        # microsecond precision: truncating to seconds would re-pull (and
        # duplicate) every row sharing the true max's second on each run
        wm_sql = f"TIMESTAMP('{wm.strftime('%Y-%m-%d %H:%M:%S.%f')}')"
    elif isinstance(wm, datetime.date):
        wm_sql = f"DATE('{wm.isoformat()}')"
    elif isinstance(wm, str):
        wm_sql = "'" + wm.replace("'", "''") + "'"
    else:
        wm_sql = repr(wm)
    # ANSI double-quote the identifier: JDBC-created columns are stored
    # case-sensitively (e.g. Derby/Postgres fold unquoted names), so a bare
    # name may not resolve.  (MySQL needs ANSI_QUOTES for this form.)
    pushed = (f'(SELECT * FROM {dbtable} '
              f'WHERE "{partition_key}" > {wm_sql}) src')
    df = read_jdbc(spark, url, pushed, driver, **jdbc_options)
    out = df.withColumn(part_col, F.date_format(partition_key, "yyyy-MM-dd"))
    if out.head(1):
        (out.repartition(part_col).write.mode("append")
            .partitionBy(part_col).parquet(out_dir))
    return "incremental"

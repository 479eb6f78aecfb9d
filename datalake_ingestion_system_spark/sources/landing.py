"""Landing-zone file source: the filename IS the metadata.

Rebuilds the reference's landing contract (FIXTURES.md §A1): gzipped
headerless CSVs named ``{TABLE}_{YYYYMMDD}_{HHMMSS}.CSV.GZ`` where the name
carries table identity + snapshot date (parse: reference D:276-290).  The
reference listed keys with boto3 and parsed names in a Python loop; here
listing goes through the Hadoop FileSystem API (so the same code handles
file://, s3a://, hdfs://, abfss://) and parsing is a DataFrame expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: ``{TABLE}_{YYYYMMDD}_{HHMMSS}.CSV.GZ`` — table prefix may itself contain
#: underscores; date/time groups are fixed-width digits (reference D:276-285,
#: EXTENSION=23 at D:122).
FILENAME_RE = r"^([A-Za-z0-9_]+)_(\d{8})_(\d{6})\.(?i:CSV\.GZ|CSV)$"


def list_files(spark: SparkSession, landing_dir: str,
               glob: str = "*") -> list[tuple[str, str, int]]:
    """Enumerate landing files via Hadoop FS (any supported scheme).

    Driver-side metadata listing — same control-plane pattern Spark's own
    file index uses; the data itself is never pulled to the driver.
    Returns (path, filename, size).
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{landing_dir}/{glob}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(hpath) or []
    return [
        (st.getPath().toString(), st.getPath().getName(), st.getLen())
        for st in statuses if st.isFile()
    ]


def discover(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Landing inventory as a DataFrame with the filename grammar applied.

    Columns: path, filename, size, table, snapshot_date.
    ``table`` is NULL when the name does not match the grammar, and
    ``snapshot_date`` is NULL when the digits are not a real date — both are
    IRREGULAR-routed downstream (reference D:278, D:283-290, D:354-358).
    """
    files = list_files(spark, landing_dir)
    inv = spark.createDataFrame(
        files or [], "path string, filename string, size bigint")
    table = F.regexp_extract("filename", FILENAME_RE, 1)
    datestr = F.regexp_extract("filename", FILENAME_RE, 2)
    return inv.select(
        "path", "filename", "size",
        F.when(table != "", table).alias("table"),
        F.try_to_date(F.when(datestr != "", datestr), "yyyyMMdd")
         .alias("snapshot_date"),
    )


def file_stats(spark: SparkSession, paths: list[str],
               delimiter: str = ",", encoding: str = "UTF-8") -> DataFrame:
    """Per-file row/column counts in ONE distributed pass over all pending
    files (the reference opened each file from one of 120 driver threads;
    here every file's lines land in the same text scan).

    Column count = max fields per line in the file (the arity the CSV reader
    would see).  Zero-row files report n_rows=0 via the left join done by the
    caller.  Plain-split field counting mirrors the reference's unquoted CSV
    contract (its data never carries quoted delimiters).
    """
    import re

    if not paths:
        return spark.createDataFrame(
            [], "filename string, n_rows bigint, n_cols int")
    # key on basename: input_file_name() URI form (file:///...) differs from
    # the Hadoop listing form (file:/...); landing keys are unique by name
    lines = (spark.read.option("encoding", encoding).text(paths)
             .select(F.element_at(F.split(F.input_file_name(), "/"), -1)
                      .alias("filename"), "value"))
    return (
        lines.groupBy("filename")
        .agg(F.count("*").alias("n_rows"),
             F.max(F.size(F.split("value", re.escape(delimiter), -1)))
              .cast("int").alias("n_cols"))
    )

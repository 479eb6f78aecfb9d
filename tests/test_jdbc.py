"""Embedded-Derby tests for the JDBC ingestion source (S4) — all three load
modes of CONVERT_RDS_TO_S3_DAILY_JOB.PY (C:77-102), previously untested.

Derby ships on Spark's classpath, so these run with no extra dependencies.
The Derby database and the lake live under a session tmp dir; Spark's JDBC
writes/reads go through the same code paths a real RDBMS would use.
"""

import pyspark.sql.functions as F
import pytest

from datalake_ingestion_system_spark.sources import jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby DB with an EVENTS table carrying microsecond
    timestamps (the ADVICE r1 duplicate-repull trigger)."""
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    rows = [
        (1, "a", "2024-01-01 10:00:00.000000"),
        (2, "b", "2024-01-01 11:30:00.250000"),
        (3, "c", "2024-01-02 09:15:00.999999"),
    ]
    df = spark.createDataFrame(rows, "id int, val string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    (df.write.format("jdbc").option("url", url).option("driver", DRIVER)
       .option("dbtable", "EVENTS").mode("overwrite").save())
    return {"url": url, "db": str(db)}


def seen(spark, path):
    return {r.id for r in spark.read.parquet(path).collect()}


def test_full_mode_unpartitioned_overwrite(spark, derby, tmp_path):
    out = str(tmp_path / "full")
    mode = jdbc.dump_table(spark, derby["url"], "EVENTS", out, driver=DRIVER)
    assert mode == "full"
    assert seen(spark, out) == {1, 2, 3}
    # re-run overwrites, never duplicates
    assert jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                           driver=DRIVER) == "full"
    assert spark.read.parquet(out).count() == 3


def test_first_load_partitions_by_derived_date(spark, derby, tmp_path):
    out = str(tmp_path / "part")
    mode = jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                           partitioned=True, partition_key="ts", driver=DRIVER)
    assert mode == "first_load"
    df = spark.read.parquet(out)
    # derived yyyy-MM-dd partition column (the reference's week-year 'YYYY'
    # bug, §0.3/P4, stays fixed)
    assert "ts_date" in df.columns
    assert {str(r.ts_date) for r in df.select("ts_date").distinct().collect()} \
        == {"2024-01-01", "2024-01-02"}
    import os
    assert any(d.startswith("ts_date=") for d in os.listdir(out))


def test_incremental_pulls_only_above_watermark(spark, derby, tmp_path):
    out = str(tmp_path / "incr")
    jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                    partitioned=True, partition_key="ts", driver=DRIVER)
    # new rows arrive in the source, one older than the watermark
    new = spark.createDataFrame(
        [(4, "d", "2024-01-03 08:00:00.123456"),
         (5, "e", "2023-12-31 23:59:59.000000")],
        "id int, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    (new.write.format("jdbc").option("url", derby["url"])
        .option("driver", DRIVER).option("dbtable", "EVENTS")
        .mode("append").save())
    mode = jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                           partitioned=True, partition_key="ts", driver=DRIVER)
    assert mode == "incremental"
    # only the row above the lake max was appended; the stale row was not
    assert seen(spark, out) == {1, 2, 3, 4}


def test_incremental_microsecond_watermark_no_repull(spark, derby, tmp_path):
    """ADVICE r1: a second-truncated watermark re-pulls every row sharing the
    max second.  Run incremental twice with no source change: row counts must
    not move."""
    out = str(tmp_path / "micro")
    jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                    partitioned=True, partition_key="ts", driver=DRIVER)
    before = spark.read.parquet(out).count()
    jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                    partitioned=True, partition_key="ts", driver=DRIVER)
    assert spark.read.parquet(out).count() == before


def test_incremental_null_watermark_falls_back_to_full(spark, derby, tmp_path):
    """ADVICE r1: lake exists but holds no watermark → 'WHERE ts > None' was
    an invalid pushed-down query; must fall back to a full first_load pull."""
    out = str(tmp_path / "nullwm")
    empty = spark.createDataFrame([], "id int, val string, ts timestamp") \
        .withColumn("ts_date", F.date_format("ts", "yyyy-MM-dd"))
    empty.write.parquet(out)  # lake path exists, zero rows
    mode = jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                           partitioned=True, partition_key="ts", driver=DRIVER)
    assert mode == "first_load"
    assert spark.read.parquet(out).count() >= 3


def test_watermark_predicate_pushed_into_source_query(spark, derby, tmp_path):
    """The incremental pull must ship the predicate to the database (the
    reference pulled the whole table and filtered in Spark, C:96-99)."""
    out = str(tmp_path / "push")
    jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                    partitioned=True, partition_key="ts", driver=DRIVER)
    captured = []
    orig = jdbc.read_jdbc

    def spy(spark_, url, dbtable, *a, **kw):
        captured.append(dbtable)
        return orig(spark_, url, dbtable, *a, **kw)

    import unittest.mock as mock
    with mock.patch.object(jdbc, "read_jdbc", side_effect=spy):
        jdbc.dump_table(spark, derby["url"], "EVENTS", out,
                        partitioned=True, partition_key="ts", driver=DRIVER)
    assert captured and "WHERE \"ts\" > TIMESTAMP" in captured[0]
    import re
    # microsecond precision preserved (a seconds-truncated literal re-pulls)
    assert re.search(r"\.\d{6}'\)", captured[0]), captured[0]

"""Streaming ingestion: Trigger.AvailableNow drains the landing zone with
checkpoint-tracked exactly-once (replaces processed_list.json)."""

import gzip

import pyspark.sql.functions as F

from datalake_ingestion_system_spark.sources import registry
from datalake_ingestion_system_spark.streaming.ingest_stream import \
    start_ingest_stream


def drain(spark, fx):
    conf = registry.load_registry(spark, fx["mapping"])
    q = start_ingest_stream(
        spark, fx["landing"], fx["storing"], conf,
        fx["checkpoint"], fx["quarantine"])
    q.awaitTermination(120)
    return q


def test_stream_available_now(spark, landing):
    drain(spark, landing)
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    assert df.count() == 5
    q = spark.read.parquet(landing["quarantine"])
    types = {r.TYPE for r in q.collect()}
    assert types == {"UNMATCH", "OUTOFCONFIG", "IRREGULAR"}


def test_stream_incremental_second_batch(spark, landing):
    drain(spark, landing)
    # new file lands; second drain picks up ONLY it (checkpoint skips old)
    with gzip.open(landing["landing"] +
                   "/CUSTOMER_MASTER_20190620_010000.CSV.GZ", "wt") as f:
        f.write("5,Eve,WEST,e@x.jp\n")
    drain(spark, landing)
    df = spark.read.option("mergeSchema", True).parquet(
        landing["storing"] + "/daily/CUSTOMER_MASTER")
    assert df.count() == 6
    assert df.filter(F.col("TRANSFERRED_DATE") == "2019-06-20").count() == 1
    # earlier partitions untouched
    assert df.filter(F.col("TRANSFERRED_DATE") == "2019-06-01").count() == 3

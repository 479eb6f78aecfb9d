"""O8: lake timezone is configurable (the reference operated in Asia/Tokyo,
D:164) while the oracle-parity query surface stays hash-stable: registered
queries re-pin the session zone via tune(), so a driver session that starts
in ANY zone produces identical results."""

import pyspark.sql.functions as F

from datalake_ingestion_system_spark.queries.relational import q_date_functions
from datalake_ingestion_system_spark.session import tune

SF001 = "/root/testdata/sf0.001"


def test_non_utc_session_produces_identical_results(spark):
    """A session pre-set to Asia/Tokyo must yield the same date-function
    output as UTC once the registered query tunes it (oracle-hash parity)."""
    baseline = sorted(tuple(r) for r in q_date_functions(spark, SF001).collect())
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        tokyo = sorted(tuple(r) for r in q_date_functions(spark, SF001).collect())
    finally:
        tune(spark)  # restore harness default
    assert tokyo == baseline


def test_epoch_seconds_dst_invariant(spark):
    """ADVICE r4: epoch_seconds differences must not shift across a DST
    transition even when the session zone observes DST.  2024-03-10 in
    America/New_York skips 02:00→03:00; the naive wall-clock gap between
    01:30 and 03:30 is 2h and the oracle (naive timestamps) agrees — the
    old NTZ→LTZ cast produced 1h under that session zone."""
    from datalake_ingestion_system_spark.catalog import epoch_seconds
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("2024-03-10 01:30:00", "2024-03-10 03:30:00")],
            "a string, b string").select(
            F.col("a").cast("timestamp_ntz").alias("a"),
            F.col("b").cast("timestamp_ntz").alias("b"))
        gap = df.select(
            (epoch_seconds("b") - epoch_seconds("a")).alias("g")).head().g
    finally:
        tune(spark)
    assert gap == 7200


def test_operational_tz_override(spark, monkeypatch):
    """tune(tz=...) / SPARK_GRAFT_TZ pin an operational zone for ingestion
    sessions; timestamp rendering follows the configured lake zone."""
    tune(spark, tz="Asia/Tokyo")
    try:
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo"
        hour = spark.sql(
            "SELECT hour(to_timestamp('2024-01-01 00:00:00 UTC',"
            " 'yyyy-MM-dd HH:mm:ss z')) h").head().h
        assert hour == 9  # UTC midnight renders as 09:00 in Tokyo
        monkeypatch.setenv("SPARK_GRAFT_TZ", "America/New_York")
        tune(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    finally:
        monkeypatch.delenv("SPARK_GRAFT_TZ", raising=False)
        tune(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

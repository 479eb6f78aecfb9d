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

"""K7: charset option on landing reads (reference set encoding explicitly at
DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:244 and ran under
NLS_LANG=JAPANESE_JAPAN, :66 — its feeds were Shift-JIS-adjacent)."""

import gzip

import pyspark.sql.functions as F

from datalake_ingestion_system_spark.plans import ingest as ing
from datalake_ingestion_system_spark.sources import registry


def test_cp932_landing_file_roundtrips(spark, landing, tmp_path):
    """A Shift-JIS (cp932) landing file ingests with correct Japanese text in
    the parquet output when encoding='cp932' is passed — no silent mojibake."""
    raw = "10,株式会社テスト,関東\n11,有限会社丸子,近畿\n".encode("cp932")
    with gzip.open(landing["landing"] +
                   "/CUSTOMER_MASTER_20190602_023000.CSV.GZ", "wb") as f:
        f.write(raw)
    conf = registry.load_registry(spark, landing["mapping"])
    rep = ing.ingest(spark, landing["landing"], landing["storing"], conf,
                     landing["state"], landing["quarantine"],
                     encoding="MS932")
    assert rep.processed == 3  # 2 UTF-8 fixtures + the cp932 file
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    got = {r.CUST_NAME for r in
           df.filter(F.col("TRANSFERRED_DATE") == "2019-06-02").collect()}
    assert got == {"株式会社テスト", "有限会社丸子"}


def test_cp932_arity_stats_count_correctly(spark, tmp_path):
    """file_stats splits on the delimiter BYTE-safely for cp932 (',' is never
    a trail byte), so UNMATCH routing stays accurate for Japanese feeds."""
    p = tmp_path / "JFEED_20190601_000000.CSV"
    p.write_bytes("1,東京,A\n2,大阪,B\n".encode("cp932"))
    from datalake_ingestion_system_spark.sources import landing as land
    stats = land.file_stats(spark, [str(p)], ",", "MS932").collect()
    assert stats[0].n_rows == 2 and stats[0].n_cols == 3

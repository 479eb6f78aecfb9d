import pytest

from datalake_ingestion_system_spark.sources import registry


def test_parse_and_validate(spark, landing):
    conf = registry.load_registry(spark, landing["mapping"])
    rows = {(r.TABLE, tuple(r.head_list)) for r in conf.collect()}
    assert ("CUSTOMER_MASTER", ("CUST_ID", "CUST_NAME", "REGION_CD")) in rows
    registry.validate_registry(conf)  # should not raise


def test_duplicate_columns_abort(spark):
    raw = spark.createDataFrame(
        [("T1", "A|B|A", "", "daily", "2019/01/01", "2020/01/01")],
        "TABLE string, HEADLIST string, TYPELIST string, FEQ string, "
        "STARTDATE string, ENDDATE string")
    conf = registry.parse_registry(raw)
    with pytest.raises(registry.ConfigError, match="T1"):
        registry.validate_registry(conf)


def test_typelist_arity_mismatch_abort(spark):
    raw = spark.createDataFrame(
        [("T2", "A|B", "1", "daily", "2019/01/01", "2020/01/01")],
        "TABLE string, HEADLIST string, TYPELIST string, FEQ string, "
        "STARTDATE string, ENDDATE string")
    with pytest.raises(registry.ConfigError, match="T2"):
        registry.validate_registry(registry.parse_registry(raw))


def test_ddl_for_codes():
    assert registry.ddl_for(["a", "b"], ["4", "5"]) == \
        "`a` bigint, `b` timestamp"
    assert registry.ddl_for(["a"], None) == "`a` string"
    assert registry.ddl_for(["a"], ["2"], all_string=True) == "`a` string"
    with pytest.raises(registry.ConfigError):
        registry.ddl_for(["a"], ["9"])

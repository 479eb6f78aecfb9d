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


def test_registry_integrity():
    """No query name may be defined in two modules (dict merge would
    silently shadow one), every callable carries its registry name, and
    every oracle key has a matching query."""
    from datalake_ingestion_system_spark.queries import (_MODULE_ORDER,
                                                         all_oracle_sql,
                                                         all_queries)
    seen = {}
    for mod in _MODULE_ORDER:
        for name in mod.QUERIES:
            assert name not in seen, \
                f"{name} defined in both {seen[name]} and {mod.__name__}"
            seen[name] = mod.__name__
    qs = all_queries()
    assert set(seen) == set(qs)
    for name, fn in qs.items():
        assert fn.__name__ == name
    orphans = set(all_oracle_sql()) - set(qs)
    assert not orphans, f"oracles without queries: {orphans}"


def test_rotated_queries_stay_registered():
    """Rotation reorders the dict; it must never drop a query."""
    from datalake_ingestion_system_spark.queries import (_ROTATE_TO_BACK,
                                                         all_queries)
    qs = list(all_queries())
    for name in _ROTATE_TO_BACK:
        assert name in qs
    assert qs[-len(_ROTATE_TO_BACK):] == list(_ROTATE_TO_BACK)

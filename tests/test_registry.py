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
    from datalake_ingestion_system_spark.queries import (_MODULE_ORDER,
                                                         _rotate_to_back,
                                                         all_queries)
    qs = list(all_queries())
    defined = set()
    for mod in _MODULE_ORDER:
        defined.update(mod.QUERIES)
    assert set(qs) == defined
    rotated = _rotate_to_back()
    # rotated names occupy the back of the dict, front names the beginning
    front = [q for q in qs if q not in rotated]
    assert qs[:len(front)] == front


def test_rotation_evidence_coverage():
    """The driver samples the first-50 prefix of all_queries() for its
    hash-vs-oracle gate.  Hygiene invariant: every oracle-backed query must
    either already have a driver CORRECTNESS row (any round) or sit inside
    the sampled prefix so it gets one next round — otherwise a query could
    silently accumulate rounds with zero driver evidence (happened to the
    round-4 analytics trio, VERDICT r4 'What's missing' #2)."""
    from datalake_ingestion_system_spark.queries import (_evidence,
                                                         all_oracle_sql,
                                                         all_queries)
    _, sampled = _evidence()
    qs = list(all_queries())
    prefix = set(qs[:50])
    missing = [q for q in all_oracle_sql()
               if q not in sampled and q not in prefix]
    assert not missing, (
        f"oracle-backed queries with no driver evidence outside the "
        f"sampled prefix: {missing}")

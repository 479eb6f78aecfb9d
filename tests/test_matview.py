"""Incrementally-maintained materialized aggregates (round 16).

The maintenance strategy is re-aggregate-dirty-groups: the source
change feed names every group whose aggregate may have moved; only
those recompute from the head snapshot and merge in (one commit).
THE invariant — checked by every test here — is refresh-equals-full-
recompute: after any DML mix, the MV must equal ``GROUP BY`` run
fresh over the source head.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_ingestion_system_spark import matview, tables
from datalake_ingestion_system_spark.sinks import TxnLogFormat


def _fmt():
    return TxnLogFormat(checkpoint_interval=None)


def _full(spark, fmt, src, keys, aggs, where=None):
    df = fmt.read(spark, src)
    if where:
        df = df.filter(where)
    return sorted(
        (tuple(r) for r in
         df.groupBy(*keys).agg(
             *[F.expr(x).alias(a) for a, x in aggs.items()]).collect()),
        key=str)


def _mv(spark, mv):
    return sorted((tuple(r) for r in
                   matview.read(spark, mv).collect()), key=str)


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    _fmt().append(spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("c", 4.0)],
        "g string, v double"), path)
    _fmt().set_properties(None, path, change_data_feed=True)
    return path


def test_refresh_equals_full_recompute_mixed_dml(spark, src, tmp_path):
    """Insert into an existing group, a new group, full-group delete,
    and an update — one refresh, any-aggregate correctness (count
    DISTINCT is not additively maintainable; recompute serves it)."""
    mv = str(tmp_path / "mv")
    aggs = {"n": "count(*)", "s": "sum(v)", "d": "count(distinct v)"}
    fmt = _fmt()
    v = matview.create_materialized_aggregate(
        spark, src, mv, ["g"], aggs)
    assert v == 1
    fmt.append(spark.createDataFrame(
        [("a", 10.0), ("d", 5.0)], "g string, v double"), src)
    fmt.delete_where(spark, src, "g = 'c'")
    fmt.update_where(spark, src, "g = 'b'", {"v": "30.0"})
    m = matview.refresh(spark, mv)
    assert m["mode"] == "pruned" and m["refreshed_to"] == 4
    assert m["deleted"] == 1 and m["inserted"] == 1
    assert _mv(spark, mv) == _full(spark, fmt, src, ["g"], aggs)
    # untouched groups did not rewrite: only dirty groups were merged
    assert m["dirty_groups"] == 4  # a (x2 commits), d, c, b


def test_semi_join_path_matches_pruned_path(spark, src, tmp_path):
    """prune_key_limit=0 forces the semi-join fallback — same result."""
    mv = str(tmp_path / "mv")
    aggs = {"s": "sum(v)"}
    fmt = _fmt()
    matview.create_materialized_aggregate(spark, src, mv, ["g"], aggs)
    fmt.append(spark.createDataFrame(
        [("b", 7.0), ("e", 1.0)], "g string, v double"), src)
    m = matview.refresh(spark, mv, prune_key_limit=0)
    assert m["mode"] == "semi-join" and m["dirty_groups"] == 2
    assert _mv(spark, mv) == _full(spark, fmt, src, ["g"], aggs)


def test_noop_and_idempotent_crash_replay(spark, src, tmp_path):
    """head == last_version is a noop; a refresh whose spec bump was
    lost (crash between merge and bump) replays IDEMPOTENTLY —
    recomputation reads base data, never combines deltas."""
    import json as _json
    mv = str(tmp_path / "mv")
    fmt = _fmt()
    matview.create_materialized_aggregate(
        spark, src, mv, ["g"], {"s": "sum(v)"})
    assert matview.refresh(spark, mv)["mode"] == "noop"
    fmt.append(spark.createDataFrame(
        [("a", 5.0)], "g string, v double"), src)
    matview.refresh(spark, mv)
    state = _mv(spark, mv)
    # simulate the crash: rewind last_version as if the bump was lost
    spec = matview._spec(fmt, mv)
    _fmt().set_properties(None, mv, user_properties={
        matview.MV_SPEC_PROP: _json.dumps(
            {**spec, "last_version": spec["last_version"] - 1})})
    m = matview.refresh(spark, mv)  # replays the same window
    assert m["mode"] != "noop"
    assert _mv(spark, mv) == state


@pytest.mark.slow
def test_composite_keys_and_where_filter(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    fmt = _fmt()
    fmt.append(spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", -2.0), ("b", "x", 3.0)],
        "g string, h string, v double"), src)
    fmt.set_properties(None, src, change_data_feed=True)
    aggs = {"s": "sum(v)"}
    matview.create_materialized_aggregate(
        spark, src, mv, ["g", "h"], aggs, where="v > 0")
    fmt.append(spark.createDataFrame(
        [("a", "x", 10.0), ("c", "z", -1.0)],
        "g string, h string, v double"), src)
    # the filtered-out row dirties nothing: its group never existed
    m = matview.refresh(spark, mv)
    assert m["dirty_groups"] == 1
    assert _mv(spark, mv) == _full(
        spark, fmt, src, ["g", "h"], aggs, where="v > 0")
    # an update moving a row OUT of the filter set dirties its group
    fmt.update_where(spark, src, "g = 'b'", {"v": "-3.0"})
    m = matview.refresh(spark, mv)
    assert m["deleted"] == 1
    assert _mv(spark, mv) == _full(
        spark, fmt, src, ["g", "h"], aggs, where="v > 0")


def test_null_group_keys_refused_loudly(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    fmt = _fmt()
    fmt.append(spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "g string, v double"), src)
    fmt.set_properties(None, src, change_data_feed=True)
    with pytest.raises(ValueError, match="NULL value in group key"):
        matview.create_materialized_aggregate(
            spark, src, mv, ["g"], {"s": "sum(v)"})
    # the spec's where is the documented escape hatch
    matview.create_materialized_aggregate(
        spark, src, mv, ["g"], {"s": "sum(v)"}, where="g IS NOT NULL")
    fmt.append(spark.createDataFrame(
        [(None, 9.0), ("a", 1.0)], "g string, v double"), src)
    matview.refresh(spark, mv)
    assert _mv(spark, mv) == [("a", 2.0)]
    # a null key arriving OUTSIDE the filter refuses at refresh
    mv2 = str(tmp_path / "mv2")
    matview.create_materialized_aggregate(
        spark, src, mv2, ["v"], {"n": "count(*)"})
    fmt.append(spark.createDataFrame(
        [("z", None)], "g string, v double"), src)
    with pytest.raises(ValueError, match="NULL value in group key"):
        matview.refresh(spark, mv2)


def test_create_requires_change_feed(spark, tmp_path):
    src = str(tmp_path / "src")
    _fmt().append(spark.createDataFrame([("a", 1.0)],
                                        "g string, v double"), src)
    with pytest.raises(ValueError, match="change feed"):
        matview.create_materialized_aggregate(
            spark, src, str(tmp_path / "mv"), ["g"], {"n": "count(*)"})


def test_sql_surface_create_refresh_drop(spark, src, tmp_path):
    """CREATE/REFRESH/DROP MATERIALIZED VIEW as routed SQL text."""
    import uuid
    mv = str(tmp_path / "mv")
    name = f"mvq_{uuid.uuid4().hex[:8]}"
    sname = f"mvs_{uuid.uuid4().hex[:8]}"
    tables.create_table(spark, sname, src)
    tables.sql(spark, f"""
        CREATE MATERIALIZED VIEW {name} LOCATION '{mv}' AS
        SELECT g, count(*) AS n, sum(v) AS s
        FROM {sname} WHERE v < 100 GROUP BY g""")
    assert spark.table(name).count() == 3
    _fmt().append(spark.createDataFrame(
        [("a", 8.0), ("a", 200.0)], "g string, v double"), src)
    m = tables.sql(spark, f"REFRESH MATERIALIZED VIEW {name}")
    assert m["dirty_groups"] == 1
    got = {r.g: (r.n, r.s) for r in spark.table(name).collect()}
    assert got["a"] == (3, 11.0)  # the 200.0 row is outside the filter
    # bad shapes refuse loudly
    with pytest.raises(ValueError, match="GROUP BY"):
        tables.sql(spark, f"""
            CREATE MATERIALIZED VIEW x2 LOCATION '{mv}2' AS
            SELECT g, count(*) AS n FROM {sname}""")
    with pytest.raises(ValueError, match="AS alias"):
        tables.sql(spark, f"""
            CREATE MATERIALIZED VIEW x3 LOCATION '{mv}3' AS
            SELECT g, count(*) FROM {sname} GROUP BY g""")
    tables.sql(spark, f"DROP MATERIALIZED VIEW {name}")
    assert not spark.catalog.tableExists(name)
    tables.sql(spark, f"DROP MATERIALIZED VIEW IF EXISTS {name}")
    tables.drop_table(spark, sname)


def test_user_properties_roundtrip_and_show(spark, tmp_path):
    """Arbitrary TBLPROPERTIES keys (round 16): set / show flat /
    unset / typed-name collision refused."""
    import uuid
    path = str(tmp_path / "t")
    fmt = _fmt()
    fmt.append(spark.range(3).select(F.col("id").alias("k")), path)
    name = f"up_{uuid.uuid4().hex[:8]}"
    tables.create_table(spark, name, path)
    tables.sql(spark, f"ALTER TABLE {name} SET TBLPROPERTIES("
                      f"'team' = 'data-eng', 'pii.level' = '2')")
    rows = {r.key: r.value for r in
            tables.sql(spark, f"SHOW TBLPROPERTIES {name}").collect()}
    assert rows["team"] == "data-eng" and rows["pii.level"] == "2"
    tables.sql(spark, f"ALTER TABLE {name} UNSET TBLPROPERTIES('team')")
    rows = {r.key: r.value for r in
            tables.sql(spark, f"SHOW TBLPROPERTIES {name}").collect()}
    assert "team" not in rows and rows["pii.level"] == "2"
    with pytest.raises(ValueError, match="collide"):
        fmt.set_properties(None, path,
                           user_properties={"row_tracking": "x"})
    with pytest.raises(ValueError, match="must be"):
        fmt.set_properties(None, path, user_properties={"k": 3})
    tables.drop_table(spark, name)


@pytest.mark.slow
def test_refresh_stream_continuous(spark, src, tmp_path):
    """refresh_stream: the source's commit stream triggers idempotent
    refreshes — appends AND row-level changes (ignoreChanges) keep the
    MV caught up without a scheduler."""
    mv = str(tmp_path / "mv")
    aggs = {"n": "count(*)", "s": "sum(v)"}
    fmt = _fmt()
    matview.create_materialized_aggregate(spark, src, mv, ["g"], aggs)
    q = matview.refresh_stream(
        spark, mv, str(tmp_path / "ckpt"))
    try:
        fmt.append(spark.createDataFrame(
            [("e", 9.0), ("a", 1.0)], "g string, v double"), src)
        q.processAllAvailable()
        assert _mv(spark, mv) == _full(spark, fmt, src, ["g"], aggs)
        # a row-level delete (data-change commit) still triggers
        fmt.delete_where(spark, src, "g = 'c'")
        q.processAllAvailable()
        assert _mv(spark, mv) == _full(spark, fmt, src, ["g"], aggs)
        assert not any(r[0] == "c" for r in _mv(spark, mv))
    finally:
        q.stop()


def test_create_refuses_existing_location_and_canonicalizes_case(
        spark, src, tmp_path):
    """Round-16 review fixes: (a) re-CREATE at a location already
    holding a txnlog table refuses (DROP leaves data; an append would
    double every group), (b) case-variant group keys canonicalize
    onto the stored column names so refresh's Row lookups work."""
    mv = str(tmp_path / "mv")
    fmt = _fmt()
    matview.create_materialized_aggregate(
        spark, src, mv, ["G"], {"s": "sum(v)"})  # case-variant key
    assert matview._spec(fmt, mv)["keys"] == ["g"]  # canonicalized
    fmt.append(spark.createDataFrame(
        [("a", 5.0)], "g string, v double"), src)
    m = matview.refresh(spark, mv)  # Row lookups must not crash
    assert m["dirty_groups"] == 1
    assert _mv(spark, mv) == _full(spark, fmt, src, ["g"],
                                   {"s": "sum(v)"})
    with pytest.raises(ValueError, match="already exists"):
        matview.create_materialized_aggregate(
            spark, src, mv, ["g"], {"s": "sum(v)"})
    with pytest.raises(ValueError, match="not in the source schema"):
        matview.create_materialized_aggregate(
            spark, src, str(tmp_path / "mv2"), ["nope"],
            {"s": "sum(v)"})


def test_user_property_values_with_quote_edges(spark, tmp_path):
    """Round-16 review fix: values beginning/ending with a quote
    character survive, and doubled-quote escapes collapse."""
    import uuid
    path = str(tmp_path / "t")
    _fmt().append(spark.range(1).select(F.col("id").alias("k")), path)
    name = f"upq_{uuid.uuid4().hex[:8]}"
    tables.create_table(spark, name, path)
    tables.sql(spark, f"ALTER TABLE {name} SET TBLPROPERTIES("
                      f"'q1' = '\"v\"', 'q2' = 'it''s')")
    rows = {r.key: r.value for r in
            tables.sql(spark, f"SHOW TBLPROPERTIES {name}").collect()}
    assert rows["q1"] == '"v"' and rows["q2"] == "it's"
    tables.drop_table(spark, name)

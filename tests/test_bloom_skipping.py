"""Per-file bloom-filter skipping (Delta bloom-filter-index parity).

The filters ride each commit's per-file stats as an optional 5th
per-column element, so every stats carrier (inline record, checkpoint
fold, parquet sidecar, alter-aware rename inversion) moves them
unchanged.  THE soundness property is no-false-negatives: a literal
present in a file must never prune it — checked here directly and via
Hypothesis against the exact build/probe hash pair.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

from datalake_ingestion_system_spark.sinks import TxnLogFormat


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
    yield s


def _files(df):
    return {f.removeprefix("file://") for f in df.inputFiles()}


@pytest.mark.slow
def test_bloom_prunes_absent_equality_and_in(spark, tmp_path):
    fmt = TxnLogFormat(bloom_filter_columns=["name", "uid"])
    path = str(tmp_path / "t")
    # three files with DISJOINT value sets but overlapping min/max
    # ranges on `name` (shared prefixes), so range stats cannot
    # separate them — only the bloom can
    groups = [["apple", "apricot", "avocado"],
              ["almond", "azalea", "aster"],
              ["amber", "agate", "axis"]]
    for gi, names in enumerate(groups):
        fmt.append(spark.createDataFrame(
            [(n, gi * 100 + i) for i, n in enumerate(names)],
            "name string, uid long").coalesce(1), path)
    all_files = _files(fmt.read(spark, path))
    assert len(all_files) == 3

    # present value: its file is scanned, result correct
    hit = fmt.read(spark, path, where="name = 'azalea'")
    assert [r.name for r in hit.collect()] == ["azalea"]
    assert len(_files(hit)) == 1  # min/max can't do this; the bloom did

    # absent value inside every file's [min, max]: all files pruned
    miss = fmt.read(spark, path, where="name = 'apex'")
    assert miss.collect() == []
    assert len(_files(miss)) == 0

    # IN: prunable only when EVERY member is provably absent
    assert len(_files(fmt.read(
        spark, path, where="name IN ('apex', 'aloe')"))) == 0
    partial = fmt.read(spark, path, where="name IN ('apex', 'agate')")
    assert [r.name for r in partial.collect()] == ["agate"]
    assert len(_files(partial)) == 1

    # integral column: same behavior through the canonical str(int)
    assert len(_files(fmt.read(spark, path, where="uid = 201"))) == 1
    assert len(_files(fmt.read(spark, path, where="uid = 50"))) == 0

    # a reader with NO bloom config still prunes from the recorded
    # filters (they live in the log, not the writer instance)
    plain = TxnLogFormat()
    assert len(_files(plain.read(spark, path,
                                 where="name = 'apex'"))) == 0


def test_bloom_never_false_negative(spark, tmp_path):
    """Every value actually written must keep its file scanned — over
    strings exercising unicode, quoting, and numeric-looking forms."""
    values = ["", "a", "Ａｂｃ", "naïve", "O'Hara", '"q"', "x y\tz",
              "-42", "0", "3.14", "NULL", "null", "None", "true",
              "1e10", "日本語テキスト", "emoji🙂", "back\\slash",
              "semi;colon", "percent%like_"]
    fmt = TxnLogFormat(bloom_filter_columns={"v": 1024})
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame([(v,) for v in values],
                                     "v string").coalesce(1), path)
    for v in values:
        lit = v.replace("\\", "\\\\").replace("'", "\\'")
        got = fmt.read(spark, path, where=f"v = '{lit}'")
        assert len(_files(got)) == 1, f"false negative for {v!r}"
        assert [r.v for r in got.collect()] == [v]


def test_bloom_probe_matches_spark_build_hash(spark, tmp_path):
    """Build/probe hash parity at the primitive level: insert one value
    per file, then probe the recorded filter directly — the inserted
    value must test present for every generated string and int."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fmt = TxnLogFormat(bloom_filter_columns={"s": 256, "n": 256})
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame(
        [("probe-me", 77), ("and-me", -9007199254740993)],
        "s string, n long").coalesce(1), path)
    (stats,) = [c["stats"] for c in fmt._commits(path)
                if c.get("stats")]
    (per,) = stats.values()
    s_bloom, n_bloom = per["s"][4], per["n"][4]
    assert fmt._bloom_maybe_contains(s_bloom, "probe-me")
    assert fmt._bloom_maybe_contains(s_bloom, "and-me")
    assert fmt._bloom_maybe_contains(n_bloom, 77)
    assert fmt._bloom_maybe_contains(n_bloom, -9007199254740993)

    # randomized parity: whatever Spark inserted, Python finds
    @settings(max_examples=30, deadline=None)
    @given(st.text(min_size=1, max_size=40))
    def round_trip(s):
        import hashlib
        row = spark.sql(
            "select cast(conv(substring(md5(s),1,15),16,10) as bigint)"
            " h1, cast(conv(substring(md5(s),17,15),16,10) as bigint)"
            " h2 from values (:s) t(s)", args={"s": s}).head()
        d = hashlib.md5(s.encode("utf-8")).hexdigest()
        assert row.h1 == int(d[0:15], 16)
        assert row.h2 == int(d[16:31], 16)

    round_trip()


def test_bloom_survives_checkpoint_fold_and_sidecar(spark, tmp_path):
    fmt = TxnLogFormat(bloom_filter_columns=["name"],
                       checkpoint_interval=None,
                       checkpoint_sidecar_files=0)  # force sidecar form
    path = str(tmp_path / "t")
    for gi, names in enumerate((["alpha", "axe"], ["aria", "atom"])):
        fmt.append(spark.createDataFrame(
            [(n, gi) for n in names], "name string, g long")
            .coalesce(1), path)
    fmt.checkpoint(path)
    fmt.vacuum(path, retain_hours=0.0, log_retain_hours=0.0)
    fresh = TxnLogFormat()  # new instance, cold caches, sidecar path
    assert len(_files(fresh.read(spark, path,
                                 where="name = 'atom'"))) == 1
    assert len(_files(fresh.read(spark, path,
                                 where="name = 'apex'"))) == 0
    got = fresh.read(spark, path, where="name = 'aria'")
    assert [r.name for r in got.collect()] == ["aria"]


def test_bloom_maps_through_renames(spark, tmp_path):
    """Stats (and the bloom riding them) are recorded under the
    pre-rename name; a predicate on the NEW name must probe the old
    name's filter — the same inverse-rename lookup min/max uses."""
    fmt = TxnLogFormat(bloom_filter_columns=["name"])
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame(
        [("ash",), ("alder",)], "name string").coalesce(1), path)
    fmt.alter_table(path, rename_columns={"name": "label"})
    assert len(_files(fmt.read(spark, path,
                               where="label = 'alder'"))) == 1
    assert len(_files(fmt.read(spark, path,
                               where="label = 'apex'"))) == 0
    assert [r.label for r in fmt.read(
        spark, path, where="label = 'ash'").collect()] == ["ash"]


def test_bloom_skips_unindexable_and_float_literals(spark, tmp_path):
    """Double columns are never indexed (their string form is not
    canonical across engines) and float literals never probe — both
    stay range-pruned only, never wrong."""
    fmt = TxnLogFormat(bloom_filter_columns=["v", "name"])
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame(
        [("n1", 1.5), ("n2", 2.5)], "name string, v double")
        .coalesce(1), path)
    (stats,) = [c["stats"] for c in fmt._commits(path)
                if c.get("stats")]
    (per,) = stats.values()
    assert len(per["v"]) == 4        # no bloom on the double column
    assert len(per["name"]) == 5
    # float literal on the string-bloomed table: probe declines, range
    # handles it; results stay correct
    got = fmt.read(spark, path, where="v = 1.5")
    assert [r.name for r in got.collect()] == ["n1"]


def test_bloom_all_null_file_proves_absence(spark, tmp_path):
    fmt = TxnLogFormat(bloom_filter_columns=["name"])
    path = str(tmp_path / "t")
    fmt.append(spark.createDataFrame(
        [(None, 1), (None, 2)], "name string, k long").coalesce(1),
        path)
    fmt.append(spark.createDataFrame(
        [("ash", 3)], "name string, k long").coalesce(1), path)
    got = fmt.read(spark, path, where="name = 'ash'")
    assert [r.k for r in got.collect()] == [3]
    assert len(_files(got)) == 1  # the all-null file is pruned


@pytest.mark.slow
def test_bloom_composes_with_batch_source_pushdown(spark, tmp_path):
    """The DSv2 batch source's pushFilters prunes through the SAME
    _clause_excluded_files tier as read(where=...) — bloom filters must
    prune equality pushdowns there too."""
    from datalake_ingestion_system_spark.sources.txnlog_stream import (
        TxnLogDataSource)

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat(bloom_filter_columns=["name"])
    path = str(tmp_path / "t")
    for names in (["apple", "avocado"], ["almond", "aster"]):
        fmt.append(spark.createDataFrame(
            [(n,) for n in names], "name string").coalesce(1), path)
    df = (spark.read.format("txnlog").option("pushdown", "true")
          .load(path))
    # absent-but-in-range value: bloom pruning leaves zero files
    assert df.filter(df.name == "apex").collect() == []
    got = df.filter(df.name == "aster").collect()
    assert [r.name for r in got] == ["aster"]

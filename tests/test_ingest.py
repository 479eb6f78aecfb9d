"""End-to-end batch ingestion tests: routing totality, idempotence,
partition overwrite, typed casts (reference D:274-358 semantics)."""

import pyspark.sql.functions as F
import pytest

from datalake_ingestion_system_spark.plans import ingest as ing
from datalake_ingestion_system_spark.sources import landing as land
from datalake_ingestion_system_spark.sources import registry


def run(spark, fx, **kw):
    conf = registry.load_registry(spark, fx["mapping"])
    return ing.ingest(spark, fx["landing"], fx["storing"], conf,
                      fx["state"], fx["quarantine"], **kw)


def test_routing_totality(spark, landing):
    """Every landed file ends in exactly one routing bucket."""
    rep = run(spark, landing)
    # 7 files: 2 customer OK, 1 sales UNMATCH (5 cols vs 6), 1 unknown feed
    # OUTOFCONFIG, 1 bad name IRREGULAR, 1 impossible date IRREGULAR,
    # 1 zero-byte EMPTY
    assert rep.processed == 2
    assert rep.unmatch == 1
    assert rep.outofconfig == 1
    assert rep.irregular == 2
    assert rep.empty == 1
    assert rep.total == 7
    assert rep.status == "SUCCEEDED"


def test_storing_layout_and_partitions(spark, landing):
    run(spark, landing)
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    # two snapshot dates → two partitions; layouts merged by mergeSchema read
    dates = {str(r[0]) for r in df.select("TRANSFERRED_DATE").distinct().collect()}
    assert dates == {"2019-06-01", "2019-06-15"}
    d1 = df.filter(F.col("TRANSFERRED_DATE") == "2019-06-01")
    assert d1.count() == 3
    assert "千代田" in {r.CUST_NAME for r in d1.collect()}
    # second layout has EMAIL column
    merged = (spark.read.option("mergeSchema", True)
              .parquet(landing["storing"] + "/daily/CUSTOMER_MASTER"))
    assert "EMAIL" in merged.columns


def test_quarantine_schema(spark, landing):
    run(spark, landing)
    q = spark.read.parquet(landing["quarantine"])
    assert q.columns == ["FILENAME", "HEADER_LIST", "HEADER_CNT",
                        "META_HEADER_LIST", "META_HEADER_CNT",
                        "START_EXEC_TIME", "TYPE"]
    by_type = {r.TYPE: r.FILENAME for r in q.collect()}
    assert by_type["UNMATCH"] == "SALES_LOG_20190601_040000.CSV.GZ"
    assert by_type["OUTOFCONFIG"] == "UNKNOWN_FEED_20190601_050000.CSV.GZ"
    assert set(q.filter(F.col("TYPE") == "IRREGULAR")
                .select("FILENAME").toPandas().FILENAME) == \
        {"badname.CSV.GZ", "CUSTOMER_MASTER_20190699_023000.CSV.GZ"}


@pytest.mark.slow
def test_idempotent_rerun(spark, landing):
    rep1 = run(spark, landing)
    rep2 = run(spark, landing)
    # second run sees nothing new (state skips OK+EMPTY; quarantined files
    # re-route but rewrite only quarantine rows, not data)
    assert rep2.processed == 0
    assert rep2.empty == 0
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    assert df.count() == 5  # unchanged


def test_typed_ingest(spark, landing):
    rep = run(spark, landing, typed=True)
    assert rep.processed == 2
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    assert dict(df.dtypes)["CUST_ID"] == "bigint"
    assert df.filter(F.col("CUST_ID") == 3).count() == 1


def test_discover_grammar(spark, landing):
    inv = land.discover(spark, landing["landing"])
    rows = {r.filename: (r.table, r.snapshot_date) for r in inv.collect()}
    assert rows["CUSTOMER_MASTER_20190601_023000.CSV.GZ"][0] == "CUSTOMER_MASTER"
    assert str(rows["CUSTOMER_MASTER_20190601_023000.CSV.GZ"][1]) == "2019-06-01"
    assert rows["badname.CSV.GZ"] == (None, None)
    # impossible date parses to NULL, not garbage
    assert rows["CUSTOMER_MASTER_20190699_023000.CSV.GZ"][1] is None


@pytest.mark.slow
def test_partition_overwrite_on_reprocess(spark, landing, tmp_path):
    """Reprocessing a file replaces exactly its partition (K1 semantics)."""
    run(spark, landing)
    # wipe state → same files pending again, with changed data for one date
    import gzip
    import shutil
    shutil.rmtree(landing["state"])
    with gzip.open(landing["landing"] +
                   "/CUSTOMER_MASTER_20190601_023000.CSV.GZ", "wt") as f:
        f.write("7,Zed,EAST\n")
    run(spark, landing)
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    d1 = df.filter(F.col("TRANSFERRED_DATE") == "2019-06-01")
    assert d1.count() == 1  # replaced, not appended
    assert df.filter(F.col("TRANSFERRED_DATE") == "2019-06-15").count() == 2


@pytest.mark.slow
def test_max_files_per_run_drains_backlog(spark, landing):
    """Bounded driver memory (VERDICT r1): each pass takes only the N oldest
    pending files; idempotent re-runs drain the backlog to convergence."""
    reps = [run(spark, landing, max_files_per_run=2) for _ in range(4)]
    assert all(r.total <= 2 for r in reps)
    # the 7-file fixture fully drains within 4 capped passes…
    assert sum(r.processed for r in reps) == 2
    assert sum(r.empty for r in reps) == 1
    # …and data matches an uncapped single pass
    df = spark.read.parquet(landing["storing"] + "/daily/CUSTOMER_MASTER")
    assert df.count() == 5
    # quarantined files are re-evaluated every pass (by design), so a fully
    # drained lake still routes them — but processes nothing new
    rep = run(spark, landing, max_files_per_run=10)
    assert rep.processed == 0 and rep.empty == 0


@pytest.mark.slow
def test_cand_paths_collect_is_bounded_by_cap(spark, landing, monkeypatch):
    """VERDICT r4 item 8: the driver-side candidate-path collect must never
    exceed max_files_per_run entries — the asserted driver-memory bound."""
    observed = []
    real_stats = land.file_stats

    def spy_stats(spark_, paths, *a, **kw):
        observed.append(len(paths))
        return real_stats(spark_, paths, *a, **kw)
    monkeypatch.setattr(ing.landing, "file_stats", spy_stats)
    for _ in range(4):
        run(spark, landing, max_files_per_run=2)
    assert observed and all(n <= 2 for n in observed)


@pytest.mark.slow
def test_uncapped_large_backlog_warns_toward_streaming(spark, landing,
                                                       monkeypatch):
    """An un-capped batch run over a backlog beyond the soft cap must warn
    (pointing at streaming.ingest_stream), not silently collect unboundedly."""
    monkeypatch.setattr(ing, "DRIVER_LIST_SOFT_CAP", 3)
    with pytest.warns(ResourceWarning, match="streaming.ingest_stream"):
        run(spark, landing)  # 7 pending > 3
    # drained lake: 4 quarantined files stay pending by design (config-fix
    # retries) — at cap 4 the backlog is not "large", so no warning
    monkeypatch.setattr(ing, "DRIVER_LIST_SOFT_CAP", 4)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error", ResourceWarning)
        run(spark, landing)

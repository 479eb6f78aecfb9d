"""Bounded-error nets for the by-design-approximate queries.

These three registry entries have no SQL oracle (approximation / append-mode
semantics are engine-specific), so the correctness net is an error bound
against the exact computation, not a hash match.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.queries.relational import QUERIES as RQ
from datalake_ingestion_system_spark.queries.streaming_q import QUERIES as SQ

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_5pct(spark):
    got = {r.l_returnflag: r.approx_parts for r in
           RQ["q_approx_count_distinct"](spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {r[0]: r[1] for r in
             (li.groupBy("l_returnflag")
              .agg(F.countDistinct("l_partkey").alias("nd")).collect())}
    assert set(got) == set(exact)
    for k in got:
        assert abs(got[k] - exact[k]) / exact[k] < 0.05, (k, got[k], exact[k])


def test_percentile_approx_within_tolerance(spark):
    got = RQ["q_percentile_approx"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    for row in got:
        sub = o.filter(F.col("o_orderpriority") == row.o_orderpriority)
        for c, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            exact = sub.agg(
                F.expr(f"percentile(o_totalprice, {q})")).head()[0]
            # accuracy 10000 ⇒ rank error ≤ n/10000; translate loosely to
            # a 2% value tolerance on this distribution
            assert abs(row[c] - exact) / exact < 0.02, \
                (row.o_orderpriority, c, row[c], exact)


@pytest.mark.slow
def test_watermark_append_emits_subset_of_batch_windows(spark):
    emitted = SQ["q_stream_watermark_late_data"](spark, SF).collect()
    assert emitted, "bounded stream should seal at least one window"
    # events.parquet carries TIMESTAMP(NANOS); mirror catalog.load's fix
    from datalake_ingestion_system_spark.catalog import load
    e = load(spark, SF, "events")
    batch = {(r[0], r[1]): r[2] for r in
             (e.groupBy(F.window("ts", "15 minutes").start.alias("ws"),
                        "event_type")
              .agg(F.count("*").alias("n"))
              .select("ws", "event_type", "n").collect())}
    for r in emitted:
        key = (r.window_start, r.event_type)
        assert key in batch, f"emitted window {key} not in batch result"
        assert r.n_events == batch[key], \
            f"sealed window {key}: {r.n_events} != batch {batch[key]}"


def test_hll_sketch_rollup_within_5pct(spark):
    from datalake_ingestion_system_spark.queries.llmops import QUERIES as LQ
    got = {r.event_type: r.est_users
           for r in LQ["q_hll_sketch_rollup"](spark, SF).collect()}
    from datalake_ingestion_system_spark.catalog import load
    e = load(spark, SF, "events")
    exact = {r[0]: r[1] for r in
             e.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("nd")).collect()}
    exact["__ALL__"] = e.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k in got:
        assert abs(got[k] - exact[k]) / exact[k] < 0.05, (k, got[k], exact[k])
    # merged sketch must estimate the same cardinality as a direct global
    # sketch (mergeability, the whole point)
    direct = e.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id")).cast("long")).head()[0]
    assert got["__ALL__"] == direct


def test_kmv_estimates_within_sketch_error(spark):
    """KMV with k=64 has RSE ~ 1/sqrt(k-2) ~ 12.7%; a 3-sigma net (40%)
    must hold for every per-type estimate, and the union estimate must
    bound-check against the exact click|purchase user union.  (Hash
    parity with DuckDB is the oracle's job — this net catches estimator
    regressions the hash can't, e.g. an off-by-one in the k-th slot.)"""
    from datalake_ingestion_system_spark.queries.llmops import QUERIES as LQ

    rows = {r.set_label: r for r in
            LQ["q_kmv_distinct_sketch"](spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/events.parquet")
    exact = {r[0]: r[1] for r in
             (e.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("nd")).collect())}
    for t, nd in exact.items():
        est = rows[t].est_distinct
        assert abs(est - nd) / nd < 0.40, (t, est, nd)
    exact_union = (e.filter(F.col("event_type").isin("click", "purchase"))
                   .select("user_id").distinct().count())
    est_union = rows["click|purchase:union"].est_distinct
    assert abs(est_union - exact_union) / exact_union < 0.40
    # intersection estimate stays within the union (sanity, not a bound)
    inter = rows["click|purchase:intersect"].est_distinct
    assert inter is None or 0 <= inter <= est_union * 1.5

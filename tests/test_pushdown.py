"""Plan-shape assertions: pushdown/pruning must actually reach the scan.

The scale contract (SURVEY §4.2) is that filters and projections are
evaluated by the parquet reader, not after a full materialization — at
100 TB the difference is the job.  These tests pin that contract so a
refactor that silently breaks pushdown (e.g. wrapping scans in an opaque
UDF stage) fails CI, not production.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    df = (li.filter(F.col("l_shipdate") >= "1995-01-01")
          .filter(F.col("l_quantity") < 24)
          .select("l_orderkey", "l_quantity"))
    plan = _explain(df)
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].split("]")[0], \
        "quantity predicate not pushed to the scan"


def test_column_pruning_reaches_read_schema(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = _explain(df)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema, \
        "scan reads all columns for a 2-column projection"


def test_partition_pruning(spark, tmp_path):
    src = spark.range(100).withColumn(
        "TRANSFERRED_DATE",
        F.when(F.col("id") % 2 == 0, "2024-01-01").otherwise("2024-01-02"))
    src.write.partitionBy("TRANSFERRED_DATE").parquet(str(tmp_path / "t"))
    df = (spark.read.parquet(str(tmp_path / "t"))
          .filter(F.col("TRANSFERRED_DATE") == "2024-01-01"))
    plan = _explain(df)
    # the date predicate must appear as a partition filter, not a data filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "TRANSFERRED_DATE" in pf
    assert df.count() == 50


def test_broadcast_join_for_small_dim(spark):
    o = spark.read.parquet(f"{SF001}/orders.parquet")
    n = spark.read.parquet(f"{SF001}/nation.parquet")
    c = spark.read.parquet(f"{SF001}/customer.parquet")
    j = (o.join(c, o.o_custkey == c.c_custkey)
          .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    plan = _explain(j)
    assert "BroadcastHashJoin" in plan


def test_bm25_topn_plans_as_take_ordered(spark):
    """BM25's global top-N must be TakeOrderedAndProject (per-partition
    heads), never a single-task global window over all matching docs."""
    from datalake_ingestion_system_spark.catalog import load
    from datalake_ingestion_system_spark.operators.ranking import bm25_scores
    d = load(spark, SF001, "documents")
    out = bm25_scores(d, "doc_id", "text", ["spark", "shuffle"], top_n=10)
    plan = _explain(out)
    assert "TakeOrderedAndProject" in plan
    # the final row_number window runs AFTER the limit (top_n rows only)
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")


def test_pii_redaction_single_scan(spark):
    """All six regexp expressions (3 counts + 3 replaces) must evaluate in
    one projection over ONE scan — rule count grows the expression, not
    the pass count."""
    from datalake_ingestion_system_spark.catalog import load
    from datalake_ingestion_system_spark.operators import text as text_ops
    d = load(spark, SF001, "documents")
    import re
    plan = _explain(text_ops.redact_pii(d, "text"))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_minhash_verifiable_no_python_stage(spark):
    """The verifiable (md5) MinHash path must stay JVM-side: no
    BatchEvalPython / ArrowEvalPython stage anywhere in the plan."""
    from datalake_ingestion_system_spark.catalog import load
    from datalake_ingestion_system_spark.operators import dedup
    d = load(spark, SF001, "documents")
    sigs = dedup.minhash_signatures(d, "doc_id", "text", 32, 3,
                                    token_hash="md5")
    plan = _explain(sigs)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rfm_approx_has_no_single_partition_window(spark):
    """VERDICT r5 item 4: q_rfm_segmentation's three global ntile windows
    are a single-task sort funnel; the registered scale default
    q_rfm_segmentation_approx must plan WITHOUT any Window operator (and
    without the SinglePartition exchange one would require) — thresholds
    broadcast, bucketing stays a codegen projection."""
    from datalake_ingestion_system_spark.queries.relational import (
        QUERIES as RQ)
    df = RQ["q_rfm_segmentation_approx"](spark, SF001)
    plan = _explain(df)
    assert "Window" not in plan, "approx RFM must not use window functions"
    # the exact form (kept for oracle parity) DOES window — sanity contrast
    exact = _explain(RQ["q_rfm_segmentation"](spark, SF001))
    assert "Window" in exact


def test_rfm_approx_matches_exact_off_boundary(spark):
    """The approx variant equals exact ntile wherever no quartile-boundary
    tie is involved: per-bucket user totals agree on every axis up to the
    users sitting exactly on a threshold value (ntile splits ties by rank,
    thresholds collapse them).  On the test corpus the segment populations
    must agree within the tied-user count per axis."""
    import pyspark.sql.functions as F
    from datalake_ingestion_system_spark.queries.relational import (
        QUERIES as RQ)
    approx = RQ["q_rfm_segmentation_approx"](spark, SF001)
    exact = RQ["q_rfm_segmentation"](spark, SF001)
    n_approx = approx.agg(F.sum("n_users")).head()[0]
    n_exact = exact.agg(F.sum("n_users")).head()[0]
    assert n_approx == n_exact  # same user universe, just re-bucketed
    # marginal distribution per axis: all four quartile buckets populated
    # in both forms, and no bucket swallows a majority beyond what ties
    # explain (sf0.001 has only ~15 users, so tied discrete recencies make
    # buckets lumpy — the bound is deliberately loose; hash-exactness vs
    # the DuckDB oracle is asserted by verify_local, not here)
    for df in (approx, exact):
        for axis in ("r_q", "f_q", "m_q"):
            marg = {r[axis]: r["n"] for r in
                    df.groupBy(axis).agg(F.sum("n_users").alias("n")).collect()}
            assert set(marg) == {1, 2, 3, 4}, (axis, marg)
            assert max(marg.values()) <= 0.6 * n_exact, (axis, marg)


def test_contamination_shingle_work_not_inlined_into_filters(spark):
    """Catalyst's InferFiltersFromGenerate turns a plain explode into a
    `size(shingles) > 0` filter and pushes it below the repartition
    exchange with the WHOLE shingle expression inlined — recomputing the
    CPU-heavy pass on the unspread map side (measured 8.4s -> 1.1s at
    sf0.1 after switching to explode_outer).  Pin the fix: no Filter node
    in the plan may contain the shingle regexp."""
    from datalake_ingestion_system_spark.queries.llmops import QUERIES as LQ
    plan = _explain(LQ["q_ngram_contamination"](spark, SF001))
    for block in plan.split("\n\n"):
        if block.strip().startswith("(") and ") Filter" in block.splitlines()[0]:
            assert "regexp_extract_all" not in block, (
                "shingle expression inlined into a Filter:\n" + block)

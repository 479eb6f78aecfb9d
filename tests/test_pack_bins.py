"""Distributed prefix-sum bin packing (VERDICT r6 item 1).

``pack_bins_prefix`` must (a) be bit-identical to the window-cumsum
``pack_bins`` on every shape — partitioned, global, skewed one-huge-source —
and (b) plan WITHOUT any SinglePartition exchange, so packing never funnels
a source (or the whole corpus) through one task.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.catalog import load
from datalake_ingestion_system_spark.functions.textfns import token_count
from datalake_ingestion_system_spark.operators import text as text_ops

SF001 = "/root/testdata/sf0.001"


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def _weighted(spark):
    d = load(spark, SF001, "documents")
    return d.select("doc_id", "source", token_count("text").alias("_tok"))


def test_prefix_equals_window_partitioned(spark):
    w = _weighted(spark)
    a = text_ops.pack_bins(w, "doc_id", "_tok", 2000, part_col="source")
    b = text_ops.pack_bins_prefix(w, "doc_id", "_tok", 2000,
                                  part_col="source", num_buckets=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_prefix_equals_window_global(spark):
    w = _weighted(spark)
    a = text_ops.pack_bins(w, "doc_id", "_tok", 2000, allow_global=True)
    b = text_ops.pack_bins_prefix(w, "doc_id", "_tok", 2000, num_buckets=5)
    assert (sorted(map(tuple, a.select("doc_id", "weight", "bin").collect()))
            == sorted(map(tuple, b.collect())))


def test_prefix_skewed_single_source(spark):
    """The motivating 100-TB shape: ~all rows in ONE source.  The window
    form would run that source through one task; the prefix form must
    still match it exactly (including the tiny tail source)."""
    w = _weighted(spark).withColumn(
        "source", F.when(F.col("doc_id") % 50 == 0, F.col("source"))
                   .otherwise(F.lit("the_big_one")))
    a = text_ops.pack_bins(w, "doc_id", "_tok", 500, part_col="source")
    b = text_ops.pack_bins_prefix(w, "doc_id", "_tok", 500,
                                  part_col="source", num_buckets=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_prefix_bucket_boundary_invariance(spark):
    """Exactness must not depend on where the range boundaries fall:
    different bucket counts give identical assignments."""
    w = _weighted(spark)
    r3 = text_ops.pack_bins_prefix(w, "doc_id", "_tok", 1000,
                                   part_col="source", num_buckets=3)
    r11 = text_ops.pack_bins_prefix(w, "doc_id", "_tok", 1000,
                                    part_col="source", num_buckets=11)
    assert (sorted(map(tuple, r3.collect()))
            == sorted(map(tuple, r11.collect())))


def test_prefix_handles_null_part_and_null_weights(spark):
    """Review finding: a NULL part value is its own pack group in the
    window form (Window.partitionBy groups NULLs together) — the prefix
    form's offset join must be null-safe, not silently drop those rows;
    NULL weights contribute nothing to either cumsum."""
    w = _weighted(spark).withColumn(
        "source", F.when(F.col("doc_id") % 7 == 0, F.lit(None))
                   .otherwise(F.col("source"))) \
        .withColumn(
        "_tok", F.when(F.col("doc_id") % 11 == 0, F.lit(None))
                 .otherwise(F.col("_tok")))
    a = text_ops.pack_bins(w, "doc_id", "_tok", 1000, part_col="source")
    b = text_ops.pack_bins_prefix(w, "doc_id", "_tok", 1000,
                                  part_col="source", num_buckets=6)
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb) == w.count()  # no silent row loss
    key = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, ra), key=key) \
        == sorted(map(tuple, rb), key=key)


def test_prefix_plan_has_no_single_partition(spark):
    """VERDICT r6 item 1 'done' criterion: the plan shows no
    single-partition-per-source window.  Every Window partitions by
    (part, _bkt); the only exchanges are the range partitioning, the
    balanced hash shuffle, and the broadcast of the offset table —
    never SinglePartition."""
    w = _weighted(spark)
    plan = _explain(text_ops.pack_bins_prefix(w, "doc_id", "_tok", 2000,
                                              num_buckets=5))
    assert "SinglePartition" not in plan
    assert "BroadcastExchange" in plan  # offsets join back broadcast
    # contrast: the global window form DOES funnel into one partition
    legacy = _explain(text_ops.pack_bins(w, "doc_id", "_tok", 2000,
                                         allow_global=True))
    assert "SinglePartition" in legacy

"""Bucketed-table materialization for shuffle-free co-located joins.

The reference's lake has no physical clustering beyond date partitions
(SURVEY §4.1) — every Athena fact⋈fact join re-shuffles both sides.  At
100 TB the shuffle IS the bottleneck, so the engine exposes Spark's native
bucketing: write both tables bucketed (and optionally sorted) on the join
key with the SAME bucket count, and Catalyst plans the join with zero
Exchange on either side (sort-merge directly over bucket files).

Bucket-count sizing: one bucket ≈ one target task; at 100 TB with
~256 MB/task that is O(100k) buckets for the biggest fact, fewer for dims.
Bucket counts must divide evenly (identical is simplest) for exchange-free
joins; AQE cannot coalesce bucketed scans, so do not over-bucket small
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str | list[str],
                   buckets: int, sort: bool = True,
                   path: str | None = None) -> None:
    """Materialize ``df`` as a parquet table bucketed (and sorted) by
    ``key`` into ``buckets`` files per partition, registered in the session
    catalog (bucket metadata lives in the catalog, so readers must go
    through ``spark.table``, not ``read.parquet``)."""
    keys = [key] if isinstance(key, str) else key
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With
    bucketing aligned, the physical plan has NO Exchange on either side —
    assert via ``tests/test_bucketing.py``."""
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_clustered(df: DataFrame, path: str, cluster_cols: list[str],
                    n_files: int | None = None) -> None:
    """Range-clustered parquet write: ``repartitionByRange`` on the cluster
    columns + ``sortWithinPartitions`` so each output file covers a narrow,
    (mostly) disjoint range of the cluster key.

    This is the data-skipping play: parquet footers carry per-file/row-group
    min-max, so a later ``WHERE cluster_col BETWEEN ...`` scan prunes most
    files without bucketing's catalog dependency.  The linear-order
    counterpart of Z-ordering — right when queries filter on one key (or a
    prefix); multi-dimensional workloads want ``z_order_key`` below
    (interleaved-bits sort key) as the cluster column instead.
    """
    rep = (df.repartitionByRange(n_files, *cluster_cols) if n_files
           else df.repartitionByRange(*cluster_cols))
    (rep.sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite").parquet(path))


def z_order_key(cols: list, bits: int = 16):
    """Bit-interleaved (Morton / Z-order) sort key over 2+ non-negative int
    columns, each already scaled to ``[0, 2^bits)``.

    ``write_clustered`` on this key gives MULTI-dimensional data skipping:
    a file covers a compact hyper-rectangle, so range predicates on ANY of
    the interleaved columns prune files via parquet min-max — the property
    a linear sort only has for its leading column.  Pure shift/or integer
    expressions (flat codegen); for value domains wider than 2^bits, rank
    or quantile-bucket the column first (the standard Delta OPTIMIZE ZORDER
    preprocessing).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            c = F.col(c) if isinstance(c, str) else c
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(1)
            key = key.bitwiseOR(F.shiftleft(bit, b * n + j))
    return key

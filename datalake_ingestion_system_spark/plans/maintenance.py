"""Lake maintenance: schema-evolution merge, user-zone replication,
DDL export, config backup (reference jobs SYNC_BUCKET_* and OUTPUT_METADATA_*
plus the layout-merge pass of the main job).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import TableFormat

#: Maintenance shares the ingest default (commit-ordered parquet); pass a
#: transactional format to route every maintenance write through its log.
_DEFAULT_FORMAT = TableFormat()


def merge_evolved_table(spark: SparkSession, table_dir: str,
                        out_dir: str,
                        partition_col: str = "TRANSFERRED_DATE",
                        fmt: TableFormat = _DEFAULT_FORMAT) -> int:
    """Schema-evolution merge: re-read every partition of a layout-changed
    table with schema union (all historical layouts, missing columns null)
    and rewrite to the ``*_LAYOUTCHANGED`` location — reference D:237-248.
    Returns rows written."""
    df = fmt.read_merged(spark, table_dir)
    fmt.overwrite_partitions(df, out_dir, partition_col)
    return fmt.read(spark, out_dir).count()


def replicate_to_user_zone(spark: SparkSession, storing_dir: str,
                           group_mapping: DataFrame,
                           user_root: str,
                           layout_changed: DataFrame | None = None,
                           fmt: TableFormat = _DEFAULT_FORMAT,
                           dst_fmt: TableFormat | None = None) -> list[str]:
    """Storing→user-zone replication driven by the group mapping table
    (SYNC_BUCKET_STORING_TO_USER_DAILY_JOB.PY:101-125).

    The reference shelled out to ``aws s3 sync --delete`` per row from 10
    driver threads; a Spark overwrite write has the same mirror semantics
    (target ends exactly equal to source).  Layout-changed tables replicate
    from their ``*_LAYOUTCHANGED`` directory (S:111-113).

    ``dst_fmt`` (default: same as ``fmt``) lets the user zone transcode —
    e.g. a parquet lake mirrored into an ORC consumer zone.
    """
    dst_fmt = dst_fmt or fmt
    changed = set()
    if layout_changed is not None:
        changed = {r[0] for r in layout_changed.select("TABLE").collect()}
    written = []
    for row in group_mapping.collect():  # config-scale loop (not data-scale)
        table, group, feq, bucket = (row["TABLE"], row["GROUP"],
                                     row["FEQ"], row["USER_BUCKET"])
        src_table = f"{table}_LAYOUTCHANGED" if table in changed else table
        src = f"{storing_dir}/{feq}/{src_table}"
        dst = f"{user_root}/{bucket}/{group}/{feq}/{table}"
        dst_fmt.overwrite_table(fmt.read(spark, src), dst)
        written.append(dst)
    return written


def merge_upsert(spark: SparkSession, path: str, updates: DataFrame,
                 key_cols: list[str],
                 fmt: TableFormat = _DEFAULT_FORMAT) -> int:
    """MERGE INTO semantics (upsert by key): rows of ``updates`` replace
    current rows sharing their key; unmatched update rows insert; all other
    current rows survive.  The SCD1 'latest wins' maintenance write Delta
    expresses as ``MERGE INTO``, here as one left-anti + union through the
    TableFormat seam — works on the parquet default and transactionally on
    ``TxnLogFormat`` (whose staged write never touches the files the plan
    is still reading).  Returns the merged row count.

    The merged frame is materialized (``localCheckpoint``) BEFORE the
    overwrite: the parquet default rewrites the directory the plan reads
    from, and a lazy plan would race its own overwrite.  Schema evolution:
    new update columns are unioned in, old rows take null (mergeSchema
    read semantics on the way out).
    """
    try:
        current = fmt.read(spark, path)
    except Exception:  # first write: the table does not exist yet
        updates = updates.localCheckpoint(eager=True)
        fmt.overwrite_table(updates, path)
        return updates.count()
    merged = (
        current.join(updates.select(*key_cols).distinct(),
                     key_cols, "left_anti")
        .unionByName(updates, allowMissingColumns=True)
        .localCheckpoint(eager=True)
    )
    fmt.overwrite_table(merged, path)
    return merged.count()


def export_ddl(spark: SparkSession, database: str | None = None) -> DataFrame:
    """DDL snapshot of every catalog table — replaces the reference's Athena
    ``SHOW CREATE TABLE`` poll loop (OUTPUT_METADATA_DDL_WEEKLY_JOB.PY:51-89)
    with native Spark SQL."""
    tables = spark.catalog.listTables(database) if database else \
        spark.catalog.listTables()
    rows = []
    for t in tables:
        if t.tableType == "TEMPORARY" or t.isTemporary:
            continue
        name = f"{t.database}.{t.name}" if t.database else t.name
        ddl = spark.sql(f"SHOW CREATE TABLE {name}").head()[0]
        rows.append((name, ddl, time.strftime("%Y-%m-%d %H:%M:%S")))
    return spark.createDataFrame(
        rows or [], "table string, ddl string, exported_at string")


def backup_config(conf: DataFrame, backup_root: str,
                  ts: str | None = None,
                  fmt: TableFormat = _DEFAULT_FORMAT) -> str:
    """Timestamped config snapshot (S:94-97's ``aws s3 sync`` backup)."""
    ts = ts or time.strftime("%Y%m%d_%H%M%S")
    out = f"{backup_root}/conf_{ts}"
    fmt.overwrite_table(conf, out)
    return out


def compact_table(spark: SparkSession, table_dir: str,
                  target_file_bytes: int = 128 * 1024 * 1024,
                  partition_col: str | None = None,
                  codec: str | None = None) -> tuple[int, int]:
    """Small-file compaction: rewrite a table directory so each output file
    is ~``target_file_bytes`` (the reference hard-codes ``repartition(1)`` /
    ``repartition(5)`` — K4 — which is wrong in both directions at scale).

    File count is sized from the actual on-disk bytes; with a partition
    column the rewrite repartitions BY the partition value so each output
    partition directory is compacted independently (no cross-partition
    shuffle of unrelated data).  Returns (files_before, files_after).

    In-place rewrite via an adjacent temp dir + atomic-ish swap: readers of
    the old path are broken only for the duration of two renames, and a
    crash leaves either the old or the new directory intact (same protocol
    as ingest's state commit; Delta/Iceberg would make this a metadata swap).
    """
    import os
    import shutil

    fs_files = []
    for root, _dirs, files in os.walk(table_dir):
        fs_files += [os.path.join(root, f) for f in files
                     if f.endswith(".parquet")]
    before = len(fs_files)
    total = sum(os.path.getsize(f) for f in fs_files)
    n_out = max(1, round(total / target_file_bytes))

    df = spark.read.parquet(table_dir)
    tmp = table_dir.rstrip("/") + "__compact_tmp"
    # codec=None keeps the session default (snappy); compaction is the
    # natural place to TRANSCODE cold data to a denser codec (zstd ~30%
    # smaller than snappy at similar scan speed — the modern answer to the
    # reference's hard-coded gzip, D:123-124, which decodes ~3x slower)
    writer = df.repartition(n_out, partition_col).write \
        if partition_col else df.repartition(n_out).write
    if codec:
        writer = writer.option("compression", codec)
    if partition_col:
        writer.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    else:
        writer.mode("overwrite").parquet(tmp)

    old = table_dir.rstrip("/") + "__compact_old"
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old)

    after = sum(len([f for f in files if f.endswith(".parquet")])
                for _r, _d, files in os.walk(table_dir))
    return before, after


def refresh_rollup(spark: SparkSession, fact_dir: str, rollup_dir: str,
                   partition_col: str, group_cols: list[str],
                   aggs: dict[str, str],
                   changed_partitions: list[str] | None = None) -> int:
    """Incrementally maintain a materialized rollup of a partitioned fact.

    The rollup is grouped by ``[partition_col] + group_cols`` and partitioned
    on disk by ``partition_col``, so refreshing after new/reprocessed fact
    partitions touches ONLY those partitions: the fact read prunes to the
    changed dates (partition filter → no full scan) and the write replaces
    just the matching rollup directories (dynamic partition overwrite) —
    at 100 TB the daily refresh cost is proportional to the day, not the
    lake.  ``changed_partitions=None`` rebuilds everything (first build).

    ``aggs`` maps output column → SQL aggregate over the fact (e.g.
    ``{"revenue": "sum(l_extendedprice)"}``).  Returns partitions written.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(fact_dir)
    if changed_partitions is not None:
        df = df.filter(F.col(partition_col).isin(changed_partitions))
    agg_exprs = [F.expr(sql).alias(name) for name, sql in aggs.items()]
    rolled = df.groupBy(partition_col, *group_cols).agg(*agg_exprs)

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (rolled.repartition(partition_col)
         .write.mode("overwrite").partitionBy(partition_col)
         .parquet(rollup_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return rolled.select(partition_col).distinct().count()


def expire_partitions(spark: SparkSession, table_dir: str,
                      cutoff: str,
                      partition_col: str = "TRANSFERRED_DATE") -> list[str]:
    """Retention enforcement: drop date partitions strictly older than
    ``cutoff`` (ISO date string) from a ``partition_col=value`` layout.

    Works at partition granularity — O(|partitions|) driver-side directory
    ops, zero data read/rewrite (the property that makes retention viable
    at 100 TB: deleting a day is a directory unlink, not a job).  Returns
    the dropped partition values.  On an object store the same walk maps
    to prefix-delete batches; with a transactional format use its native
    ``DELETE WHERE`` instead (see sinks.py).
    """
    import datetime
    import os
    import shutil

    cut = datetime.date.fromisoformat(cutoff)
    prefix = f"{partition_col}="
    dropped = []
    if not os.path.isdir(table_dir):
        return dropped
    for name in sorted(os.listdir(table_dir)):
        if not name.startswith(prefix):
            continue
        try:
            value = datetime.date.fromisoformat(name[len(prefix):])
        except ValueError:
            continue  # non-date partition value — never touch it
        if value < cut:
            shutil.rmtree(os.path.join(table_dir, name))
            dropped.append(name[len(prefix):])
    return dropped


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 8, bits: int = 8) -> None:
    """Z-order clustered rewrite (Delta ``OPTIMIZE ZORDER BY`` analogue):
    lay the table out along a space-filling curve over ``cols`` so
    parquet min/max stats stay TIGHT on every z-ordered column at once —
    single-column sort gives perfect pruning on one column and none on
    the others; bit-interleaving trades a little per-column tightness for
    pruning on all of them.

    Each column is quantized to ``2**bits`` uniform buckets between its
    min and max (two scalars per column; swap in percentile_approx edges
    for heavily skewed columns), bucket bits are interleaved into the
    z-value, and the write is ``repartitionByRange(n_files, z)`` +
    ``sortWithinPartitions(z)`` — ranges of z land contiguously in files,
    which is exactly what makes the per-file stats narrow.  Readers need
    nothing special: plain parquet scans skip row groups via the stats.
    """
    from ..catalog import zorder_key

    z = zorder_key(df, cols, bits)
    if z is None:  # empty table: nothing to cluster, plain write
        df.write.mode("overwrite").parquet(path)
        return
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))

"""Lake maintenance: schema-evolution merge, user-zone replication,
DDL export, config backup (reference jobs SYNC_BUCKET_* and OUTPUT_METADATA_*
plus the layout-merge pass of the main job).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_evolved_table(spark: SparkSession, table_dir: str,
                        out_dir: str,
                        partition_col: str = "TRANSFERRED_DATE") -> int:
    """Schema-evolution merge: re-read every partition of a layout-changed
    table with ``mergeSchema`` (union of all historical layouts, missing
    columns null) and rewrite to the ``*_LAYOUTCHANGED`` location —
    reference D:237-248.  Returns rows written."""
    df = (spark.read.option("mergeSchema", True).parquet(table_dir))
    (df.repartition(partition_col)
       .write.mode("overwrite").partitionBy(partition_col).parquet(out_dir))
    return spark.read.parquet(out_dir).count()


def replicate_to_user_zone(spark: SparkSession, storing_dir: str,
                           group_mapping: DataFrame,
                           user_root: str,
                           layout_changed: DataFrame | None = None) -> list[str]:
    """Storing→user-zone replication driven by the group mapping table
    (SYNC_BUCKET_STORING_TO_USER_DAILY_JOB.PY:101-125).

    The reference shelled out to ``aws s3 sync --delete`` per row from 10
    driver threads; a Spark overwrite write has the same mirror semantics
    (target ends exactly equal to source).  Layout-changed tables replicate
    from their ``*_LAYOUTCHANGED`` directory (S:111-113).
    """
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
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
        written.append(dst)
    return written


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
                  ts: str | None = None) -> str:
    """Timestamped config snapshot (S:94-97's ``aws s3 sync`` backup)."""
    ts = ts or time.strftime("%Y%m%d_%H%M%S")
    out = f"{backup_root}/conf_{ts}"
    conf.write.mode("overwrite").parquet(out)
    return out

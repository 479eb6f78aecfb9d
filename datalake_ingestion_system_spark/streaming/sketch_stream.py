"""Streaming mergeable-sketch maintenance (foreachBatch KMV union).

The streaming counterpart of ``q_kmv_distinct_sketch``
(``queries/llmops.py``): each micro-batch's distinct keys are hashed and
folded into a persistent bottom-k (KMV) sketch table — per set, the k
smallest portable md5 hashes seen so far — published as ONE atomic
commit per epoch through the bundled ``TxnLogFormat``.

Why this shape matters at 100 TB: KMV union is "k smallest of the merged
slot lists", so the maintained state is O(k) PER SET regardless of
stream length, the merge is associative/commutative/idempotent, and the
final sketch is bit-identical to the batch sketch over the union of all
inputs — which is exactly what makes the streaming query
oracle-checkable (DuckDB replays the batch computation) instead of
rows-only.  Contrast HLL, whose register state Spark does not expose for
this kind of cross-engine replay.

Replay safety: ``foreachBatch`` may re-deliver an epoch after a crash;
folding the same keys into the sketch twice is a no-op (set union), so a
replayed epoch converges — the same exactly-once-by-idempotence contract
as the CDC stream (``cdc_stream.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# shared sketch primitives — ONE definition for the batch query, the
# streaming fold, and the oracles (operators/dedup.py), so hash width or
# collision-semantics fixes can never drift between consumers
from ..operators.dedup import kmv_bottom_k as bottom_k
from ..operators.dedup import kmv_hash
from ..sinks import TxnLogFormat

__all__ = ["kmv_hash", "bottom_k", "start_kmv_stream"]


def start_kmv_stream(spark: SparkSession, keys: DataFrame,
                     table_path: str, set_col: str, key_col: str,
                     checkpoint_dir: str, k: int = 64,
                     fmt: TxnLogFormat | None = None,
                     available_now: bool = True,
                     txn_app: str | None = None):
    """Start the sketch-maintenance stream; returns the StreamingQuery.

    ``keys`` is a streaming DataFrame carrying ``set_col`` (the sketch
    partition, e.g. event_type) and ``key_col`` (the distinct-counted
    value, e.g. user_id).  The sketch table at ``table_path`` holds
    (set_col, h) rows, at most k per set."""
    fmt = fmt or TxnLogFormat()

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return  # empty epoch: no commit, no table churn
        fresh = batch.select(
            F.col(set_col), kmv_hash(F.col(key_col)).alias("h"))
        try:
            current = fmt.read(spark, table_path)
            merged = bottom_k(current.unionByName(fresh), set_col, k)
        except FileNotFoundError:
            merged = bottom_k(fresh, set_col, k)
        # exactly-once via the commit log's idempotent-transaction dedup
        # (a redelivered epoch would also be a no-op by the union's
        # idempotence — the txn skip just avoids the wasted rewrite).
        # Pass a fresh ``txn_app`` after wiping the checkpoint dir, or
        # the restarted epochs 0..N silently skip (same contract as
        # cdc_stream / Delta txnAppId).
        if isinstance(fmt, TxnLogFormat):
            fmt.overwrite_table(merged, table_path,
                                txn_app=txn_app or f"kmv:{checkpoint_dir}",
                                txn_version=epoch_id)
        else:  # degrade gracefully for seam formats without txn kwargs
            fmt.overwrite_table(merged, table_path)

    # continuous mode gets an explicit pacing trigger (same contract as
    # cdc_stream): the default ASAP trigger would publish a full commit +
    # stage dir per micro-batch as fast as batches arrive — unbounded
    # log/stage churn for a table whose content changes at most k rows
    # per set per epoch
    return (keys.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**({"availableNow": True} if available_now
                        else {"processingTime": "10 seconds"}))
            .start())

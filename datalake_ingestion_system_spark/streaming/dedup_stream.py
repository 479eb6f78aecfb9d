"""Streaming near-dup ingestion (foreachBatch incremental MinHash).

The streaming counterpart of ``operators.dedup.incremental_minhash_dedup``:
each micro-batch of documents is near-dup-checked against the persistent
SIGNATURE store (yesterday's corpus, text long gone) and within itself;
the batch's verified pairs land in a pairs table as one idempotent
transaction per epoch, and the batch's novel signatures accumulate into
the store — so the next epoch (or tomorrow's run) dedups against
everything ever accepted.  This is the continuous-ingestion shape of an
LLM training-data pipeline: documents stream in, duplicates are flagged
exactly once, and the state that grows is O(num_hashes) longs per unique
doc, never the corpus text.

Replay safety (the contract shared by ``cdc_stream``/``sketch_stream``):
a redelivered epoch recomputes the SAME pairs — the store's copies of the
batch's own ids are superseded by the batch's identical deterministic
signatures, so no self-pairs and no drift — and the pairs append is
deduped by the commit log's (app, version) idempotent-transaction skip,
while the store append is id-novel-only (a replayed batch appends
nothing).  Crash between the two appends replays convergently in either
order.

Reference parity: the reference has no dedup at all beyond full-row
config-arity checks (README.md:21 quarantine); this is the capability a
100 TB lake actually needs at ingest time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import incremental_minhash_dedup
from ..sinks import TxnLogFormat

__all__ = ["start_near_dup_stream"]


def start_near_dup_stream(spark: SparkSession, docs: DataFrame,
                          state_path: str, pairs_path: str,
                          checkpoint_dir: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          num_hashes: int = 32, bands: int = 8,
                          threshold: float = 0.5,
                          verifiable: bool = False,
                          fmt: TxnLogFormat | None = None,
                          available_now: bool = True,
                          txn_app: str | None = None):
    """Start the near-dup ingestion stream; returns the StreamingQuery.

    ``docs`` is a streaming DataFrame carrying ``id_col`` and
    ``text_col``.  After the stream drains, ``pairs_path`` holds every
    verified near-dup pair whose LATER side arrived on this stream
    (id_a, id_b, n_agree, est_jaccard), exactly once; ``state_path``
    holds the signature store."""
    fmt = fmt or TxnLogFormat()

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return  # empty epoch: no commit, no table churn
        pairs, _stats = incremental_minhash_dedup(
            batch.select(id_col, text_col), state_path,
            id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
            verifiable=verifiable, fmt=fmt)
        # pin: consumed for the emptiness probe AND the append
        pairs = pairs.localCheckpoint(eager=True)
        if not pairs.head(1):
            return  # no pairs this epoch: nothing to publish
        fmt.append(pairs, pairs_path,
                   txn_app=txn_app or f"neardup:{checkpoint_dir}",
                   txn_version=epoch_id)

    return (docs.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**({"availableNow": True} if available_now
                        else {"processingTime": "10 seconds"}))
            .start())

"""Slowly-changing-dimension Type 2 over the txnlog format.

The CDC tier's missing consumer shape: ``cdc_stream`` keeps a
latest-wins CURRENT table, the CDF mirror replicates changes — but a
warehouse dimension usually needs HISTORY: every attribute version with
its validity interval (Kimball SCD Type 2; Delta users hand-roll it
with a two-clause MERGE per batch).

Design — append-only version rows, validity DERIVED at read:

- :func:`scd2_append` writes each change batch as plain version rows
  ``(key, attrs..., valid-from order value[, op])`` — ONE atomic append
  commit, O(batch) regardless of dimension size.  No row is ever
  rewritten, so there is nothing a concurrent writer can conflict with
  beyond the ordinary commit race, and replays are idempotent through
  the txn watermark like every other append.
- :func:`scd2_view` derives the SCD2 shape with one window pass:
  ``_valid_to`` = the key's next version's valid-from (NULL = open) and
  ``_is_current`` (open and not a tombstone).
- :func:`scd2_current` is the current-snapshot projection.

Why not stored ``_valid_to`` columns?  Closing the predecessor row
in-place is what makes hand-rolled SCD2 merges O(touched files) of
REWRITE per batch and serializes writers on the hot current rows.  At
lakehouse scale the dimension read is a broadcast-sized window pass,
while ingest is the hot path — so this stores the immutable facts
(version rows) and derives the mutable view, the same
event-sourcing trade the txn log itself makes.  A dimension queried far
more often than it changes can still materialize ``scd2_view`` with an
ordinary CTAS.

Determinism contract: one version per ``(key, order value)`` —
:func:`scd2_append` de-duplicates within the batch deterministically
(latest by the tiebreaker columns) and the view's window is keyed on
the order value, so replays and retries converge bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sinks import TxnLogFormat


def scd2_append(spark: SparkSession, path: str, changes: DataFrame,
                key: str, order_col: str,
                fmt: TxnLogFormat | None = None,
                txn_app: str | None = None,
                txn_version: int | None = None) -> None:
    """Append one change batch as version rows (one atomic commit).

    ``changes`` carries ``key``, ``order_col`` (the version's
    valid-from value — event time, CDC LSN, batch date), and the
    dimension attributes; duplicates on ``(key, order_col)`` collapse
    deterministically (max over the remaining columns' struct).  Pass
    ``txn_app``/``txn_version`` for exactly-once replays, the append
    contract."""
    fmt = fmt or TxnLogFormat()
    others = [c for c in changes.columns if c not in (key, order_col)]
    deduped = (changes
               .groupBy(key, order_col)
               .agg(F.max(F.struct(*others)).alias("_v"))
               .select(key, order_col, "_v.*"))
    kwargs = {}
    if txn_app is not None:
        kwargs = {"txn_app": txn_app, "txn_version": txn_version}
    fmt.append(deduped, path, **kwargs)


def scd2_view(versions: DataFrame, key: str, order_col: str,
              op_col: str | None = None) -> DataFrame:
    """The SCD2 shape over version rows: adds ``_valid_to`` (the key's
    next valid-from; NULL = open interval) and ``_is_current`` (open
    and, when ``op_col`` is given, not a tombstone — a key whose latest
    version is a delete has NO current row, but its history remains).

    One window pass, partitioned by the key — at 100 TB the dimension
    is the broadcast side; the window never touches fact data."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    out = versions.withColumn("_valid_to",
                              F.lead(order_col).over(w))
    cur = F.col("_valid_to").isNull()
    if op_col is not None:
        cur = cur & (F.coalesce(F.col(op_col) != F.lit("D"),
                                F.lit(True)))
    return out.withColumn("_is_current", cur)


def scd2_current(versions: DataFrame, key: str, order_col: str,
                 op_col: str | None = None) -> DataFrame:
    """The current snapshot: each key's open, non-tombstone version."""
    return (scd2_view(versions, key, order_col, op_col)
            .filter(F.col("_is_current"))
            .drop("_valid_to", "_is_current"))


def scd2_as_of(versions: DataFrame, key: str, order_col: str,
               as_of, op_col: str | None = None) -> DataFrame:
    """Point-in-time dimension lookup: each key's version in effect at
    ``as_of`` (valid-from <= as_of < valid-to) — the join shape fact
    pipelines use to attach dimension attributes as of the fact's
    event time."""
    v = scd2_view(versions, key, order_col, op_col)
    hit = ((F.col(order_col) <= F.lit(as_of))
           & (F.col("_valid_to").isNull()
              | (F.col("_valid_to") > F.lit(as_of))))
    out = v.filter(hit)
    if op_col is not None:
        # NULL op = not a tombstone (the same coalesce rule as
        # scd2_view — CDC feeds often set op only on deletes)
        out = out.filter(F.coalesce(F.col(op_col) != F.lit("D"),
                                    F.lit(True)))
    return out.drop("_valid_to", "_is_current")


def start_scd2_stream(spark: SparkSession, changes: DataFrame,
                      path: str, key: str, order_col: str,
                      checkpoint_dir: str,
                      fmt: TxnLogFormat | None = None,
                      txn_app: str | None = None,
                      available_now: bool = True):
    """Streaming SCD2 ingest — the ``cdc_stream`` counterpart for
    history-keeping dimensions: each micro-batch of change records
    appends as version rows via :func:`scd2_append`, exactly-once
    through the commit log's idempotent-transaction dedup (epoch id =
    txn version, Delta sink txnAppId parity — a redelivered epoch is
    SKIPPED, not re-appended).  Because ingest is append-only there is
    no read-modify-write window at all: concurrent readers always see
    a complete set of version rows, and ``scd2_view`` stays correct
    mid-stream.  Returns the StreamingQuery.

    The WIPED-CHECKPOINT footgun applies exactly as in
    ``cdc_stream.start_cdc_upsert_stream``: a reset checkpoint restarts
    epoch ids at 0 while the old (app, epoch) records remain in the
    log — pass a fresh ``txn_app`` when reprocessing."""
    fmt = fmt or TxnLogFormat()
    app = txn_app or f"scd2:{checkpoint_dir}"

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return  # empty epoch: no commit
        scd2_append(spark, path, batch, key, order_col, fmt=fmt,
                    txn_app=app, txn_version=epoch_id)

    return (changes.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**({"availableNow": True} if available_now
                        else {"processingTime": "10 seconds"}))
            .start())

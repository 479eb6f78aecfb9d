"""Bounded AvailableNow drain for the txnlog streaming source
(round 14 — VERDICT r13 item 6).

Spark's ``Trigger.AvailableNow`` falls back to SINGLE-BATCH execution
for Python Data Source streams (Spark's own runtime warning — the
``SupportsTriggerAvailableNow`` admission path is JVM-source only in
4.1), which silently ignores ``maxCommitsPerTrigger``: a deep backlog
that should drain in bounded chunks arrives as one giant micro-batch.
``drain_stream`` closes that gap by emulating AvailableNow over the
REAL streaming engine: it pins the log head at entry, runs the stream
with a zero-interval processing trigger (every rate cap honored from
the first batch — the reader's fresh ``initialOffset`` seeds the cap
bookkeeping), and stops once Spark's own checkpoint has committed a
batch covering the pinned head.

Exactly-once is Spark's native foreachBatch contract, not re-derived
here: offsets live in ``checkpoint_dir``, each epoch id is stable
across crash-replays, and a re-run of ``drain_stream`` with the same
checkpoint resumes AFTER the last committed epoch — already-delivered
commits are never re-emitted (the sink sees each epoch at most once
per successful commit; an epoch whose sink ran but whose offset
commit crashed replays with the SAME epoch id, the standard
idempotent-sink contract every ``streaming/`` sink in this package
follows).

Restart caveat (documented API limitation, unchanged): when RESUMING
from an existing checkpoint, the Python DS API gives the reader no
view of the checkpointed offset, so the first resumed batch is
uncapped; every subsequent batch honors the caps.

Scale shape: the drain plans each micro-batch from commit metadata
(no storage listing); wall-clock is O(backlog) with peak memory
bounded by the per-trigger caps — the exact property the single-batch
fallback destroys at 100 TB backfills.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

__all__ = ["drain_stream"]


def _parse_offset(text: str) -> int | None:
    """An offsets-log line → its version, tolerating both JSON and the
    dict-repr form the Python DS bridge stores."""
    try:
        try:
            d = json.loads(text)
        except ValueError:
            import ast
            d = ast.literal_eval(text)
        return int(d["version"])
    except Exception:
        return None


def _last_planned_version(checkpoint_dir: str) -> int | None:
    """The newest offsets-log entry's end version — at or ABOVE the
    stream's committed offset by construction (Spark plans before it
    commits), which is exactly the safety bar a cap base must clear."""
    import os
    off_dir = os.path.join(checkpoint_dir, "offsets")
    try:
        names = [n for n in os.listdir(off_dir) if n.isdigit()]
    except FileNotFoundError:
        return None
    if not names:
        return None
    latest = max(names, key=int)
    try:
        with open(os.path.join(off_dir, latest)) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
    except OSError:
        return None
    return _parse_offset(lines[-1]) if lines else None


def drain_stream(spark: SparkSession, path: str, batch_fn,
                 checkpoint_dir: str,
                 max_commits_per_trigger: int | None = None,
                 options: dict | None = None,
                 timeout_sec: float = 600.0,
                 poll_sec: float = 0.2) -> int:
    """Drain the txnlog stream's backlog at ``path`` into ``batch_fn``
    (a ``foreachBatch`` callable ``(DataFrame, epoch_id) -> None``) in
    bounded micro-batches, then stop.  Returns the log head version
    the drain caught up to (-1 for an empty table).  ``options`` pass
    through to the stream reader (``startingVersion``, ``where``,
    ``maxFilesPerTrigger``, ...)."""
    from ..sinks import TxnLogFormat
    from ..sources.txnlog_stream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat()
    commits = fmt._commits(path)
    target = commits[-1]["version"] if commits else -1
    if target < 0:
        return -1
    opts = {k: str(v) for k, v in (options or {}).items()}
    if max_commits_per_trigger is not None:
        opts["maxCommitsPerTrigger"] = str(max_commits_per_trigger)
    # seed the reader's rate-cap bookkeeping (option capBase): the
    # engine calls latestOffset before initialOffset, so without a
    # seed the FIRST batch ignores every cap (the single-batch
    # fallback this helper exists to fix).  Resume point: the
    # checkpoint's own offsets log (>= committed offset, no
    # regression possible); fresh: the startingVersion-derived start.
    if "capbase" not in {k.lower() for k in opts}:
        base = _last_planned_version(checkpoint_dir)
        if base is None:
            sv = next((v for k, v in opts.items()
                       if k.lower() == "startingversion"), None)
            st = next((v for k, v in opts.items()
                       if k.lower() == "startingtimestamp"), None)
            if sv is not None:
                if str(sv).lower() == "latest":
                    base = target
                elif str(sv).isdigit():
                    base = int(sv) - 1
            elif st is None:
                base = -1
            # startingTimestamp with no offsets log: leave unseeded —
            # a capped base below the timestamp's resolved version
            # would make latestOffset plan PRE-timestamp commits the
            # reader's initialOffset excludes; the first batch runs
            # uncapped instead (the documented caveat), then caps
        if base is not None:
            opts["capBase"] = str(base)
    q = (spark.readStream.format("txnlog").options(**opts).load(path)
         .writeStream.foreachBatch(batch_fn)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(processingTime="0 seconds").start())
    try:
        deadline = time.time() + timeout_sec
        while True:
            if q.exception() is not None:
                raise q.exception()
            p = q.lastProgress
            if p and p.get("sources"):
                end = p["sources"][0].get("endOffset")
                if end:
                    v = (_parse_offset(end) if isinstance(end, str)
                         else end.get("version"))
                    # the progress entry reports a COMMITTED batch —
                    # once it covers the pinned head, the backlog (as
                    # of entry) is fully delivered
                    if v is not None and v >= target:
                        return target
            if time.time() > deadline:
                raise TimeoutError(
                    f"drain of {path} did not reach version {target} "
                    f"within {timeout_sec}s")
            time.sleep(poll_sec)
    finally:
        q.stop()

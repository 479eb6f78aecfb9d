"""Incrementally-maintained materialized aggregates (round 16).

A MATERIALIZED AGGREGATE is a txnlog table holding ``GROUP BY`` results
over a source txnlog table, plus a spec (group keys, aggregate
expressions, optional filter, last refreshed source version) stored in
the MV table's ``user_properties``.  ``refresh`` advances it to the
source head INCREMENTALLY:

1. read the source CHANGE FEED for ``(last_version, head]`` — inserts,
   delete preimages, and both update images all carry the group key of
   a group whose aggregate may have moved;
2. the DISTINCT keys in that delta are the DIRTY GROUPS — everything
   else in the MV is untouched;
3. recompute ONLY the dirty groups from the source snapshot pinned
   ``AS OF head`` (consistent even while writers race ahead), and
4. MERGE the recomputed rows into the MV: changed groups update, new
   groups insert, vanished groups delete (the merge's
   not-matched-by-source clause scoped to the dirty keys).

Because step 3 RECOMPUTES from base data instead of combining deltas,
ANY aggregate expression is maintainable — ``count(DISTINCT ...)``,
``avg``, ``percentile_approx`` — not just the commutative-monoid
subset classic additive IVM supports, and deletes/updates need no
retraction algebra.  The cost is O(rows in dirty groups), not O(table):
the published re-aggregate-dirty-groups strategy (e.g. the
"higher-order IVM" fallback in DBSP/Materialize literature).

Scale shape (100 TB): when the dirty-key set is small (the common
trickle-refresh case) the keys ship as an IN-literal predicate into
``TxnLogFormat.read(where=...)`` — min/max stats, bloom filters, and
partition transforms prune untouched FILES, so a refresh touching 10
groups reads ~10 groups' worth of files.  Past ``prune_key_limit`` the
recompute falls back to a broadcast-or-shuffle semi-join over the full
scan (one pass, no driver materialization).  Refresh is IDEMPOTENT —
re-running a crashed refresh recomputes the same dirty groups to the
same values — so the data merge and the spec bump need no cross-commit
atomicity.

Reference parity: the reference pipeline re-runs full Athena GROUP BY
queries per day over re-crawled data (README.md:34,:51 — there is no
incremental tier at all); this module is the Spark-first replacement a
100 TB deployment needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import TxnLogFormat

#: user_properties key carrying the MV spec JSON
MV_SPEC_PROP = "mv_spec"

#: dirty-key cardinality up to which keys ship as an IN-literal
#: predicate (file pruning via stats/bloom/partition transforms);
#: beyond it the recompute semi-joins instead
PRUNE_KEY_LIMIT = 1024


def _spec(fmt: TxnLogFormat, mv_path: str) -> dict:
    props = fmt._resolve_properties(fmt._commits(mv_path))
    raw = (props.get("user_properties") or {}).get(MV_SPEC_PROP)
    if not raw:
        raise ValueError(
            f"{mv_path} is not a materialized aggregate — no "
            f"{MV_SPEC_PROP!r} user property (create one with "
            "matview.create_materialized_aggregate)")
    return json.loads(raw)


def _aggregate(df: DataFrame, spec: dict) -> DataFrame:
    if spec.get("where"):
        df = df.filter(spec["where"])
    return df.groupBy(*spec["keys"]).agg(
        *[F.expr(x).alias(a) for a, x in spec["aggs"].items()])


def create_materialized_aggregate(
        spark: SparkSession, source_path: str, mv_path: str,
        group_keys: list[str], aggregates: dict[str, str],
        where: str | None = None) -> int:
    """Build the initial full aggregate of ``source_path`` at its
    current head and record the spec; returns the pinned source
    version.  ``aggregates`` maps output alias -> SQL aggregate
    expression (any Spark aggregate).  The SOURCE must have the change
    feed enabled (``change_data_feed=True``) — refresh plans its dirty
    set from it."""
    fmt = TxnLogFormat(checkpoint_interval=None)
    src = os.path.abspath(source_path)
    commits = fmt._commits(src)
    if not commits:
        raise FileNotFoundError(f"no committed source table at {src}")
    if not fmt._resolve_properties(commits).get("change_data_feed"):
        raise ValueError(
            f"source {src} does not record a change feed — run "
            "set_properties(change_data_feed=True) on it first; "
            "refresh plans dirty groups from table_changes")
    if os.path.isdir(fmt._log_dir(mv_path)):
        # review fix: DROP MATERIALIZED VIEW leaves the stored
        # aggregate on disk (external-table semantics) — a re-CREATE
        # at the same location would APPEND a second full aggregate
        # (duplicate group rows, and the next refresh's merge aborts
        # on the one-row-per-key guard)
        raise ValueError(
            f"a txnlog table already exists at {mv_path} — drop its "
            "data (vacuum retention 0 after delete, or remove the "
            "directory) or pick a fresh location")
    if not group_keys or not aggregates:
        raise ValueError("need at least one group key and one aggregate")
    overlap = set(group_keys) & set(aggregates)
    if overlap:
        raise ValueError(
            f"aliases {sorted(overlap)} are both group keys and "
            "aggregate outputs")
    head = commits[-1]["version"]
    snap = fmt.read(spark, src, as_of_version=head)
    # canonicalize key case onto the stored column names (review fix:
    # DataFrame resolution is case-insensitive, but the refresh-time
    # Row lookups and the parquet fast path are not)
    canon = {c.lower(): c for c in snap.columns}
    missing = [k for k in group_keys if k.lower() not in canon]
    if missing:
        raise ValueError(
            f"group key column(s) {missing} not in the source schema "
            f"{snap.columns}")
    group_keys = [canon[k.lower()] for k in group_keys]
    spec = {"source": src, "keys": list(group_keys),
            "aggs": dict(aggregates), "where": where,
            "last_version": head}
    _refuse_null_keys(
        (snap.filter(where) if where else snap).select(*group_keys))
    fmt.append(_aggregate(snap, spec), mv_path)
    fmt.set_properties(
        None, mv_path,
        user_properties={MV_SPEC_PROP: json.dumps(spec)})
    return head


def read(spark: SparkSession, mv_path: str) -> DataFrame:
    """The materialized rows as of the last refresh."""
    return TxnLogFormat().read(spark, mv_path)


def _refuse_null_keys(keyed: DataFrame) -> None:
    """A NULL group-key value cannot round-trip the single-commit
    merge apply (SQL equality never matches NULL: changed groups would
    duplicate instead of update, vanished ones would survive the
    not-matched-by-source tuple-IN).  Refuse loudly — exclude NULLs in
    the spec's ``where``, or materialize a coalesced key column on the
    source (generated columns serve exactly this)."""
    cond = None
    for k in keyed.columns:
        c = keyed[k].isNull()
        cond = c if cond is None else cond | c
    if keyed.filter(cond).limit(1).count():
        raise ValueError(
            f"NULL value in group key column(s) {keyed.columns} — "
            "materialized aggregates require non-null keys; filter "
            "them in the spec's where clause or aggregate a "
            "coalesced generated column instead")


def _key_predicate(keys: list[str], rows: list) -> str | None:
    """Dirty keys as an IN-literal predicate for file pruning — single
    key only (tuple-IN literals do not reach the stats tier); composite
    keys prune on the FIRST key column.  Returns None when a value is
    not literal-embeddable (then the recompute filters via the
    semi-join alone).  NULL keys cannot reach here — refresh refuses
    them before building the predicate."""
    lits = {_key_literal(r[0]) for r in rows}
    if None in lits:
        return None
    return f"{keys[0]} IN ({', '.join(sorted(lits))})"


def _key_literal(v) -> str | None:
    """One key value as a SQL literal, or None when not embeddable."""
    if isinstance(v, bool) or not isinstance(v, (int, float, str)):
        return None
    if isinstance(v, str):
        if "'" in v or "\\" in v:
            return None
        return "'" + v + "'"
    return repr(v)


def _in_literal(keys: list[str], rows: list) -> str | None:
    """``key IN (...)`` / ``(k1, k2) IN ((..), ...)`` over collected
    key tuples — None when any value is not literal-embeddable."""
    tuples = []
    for r in rows:
        lits = [_key_literal(r[i]) for i in range(len(keys))]
        if any(x is None for x in lits):
            return None
        tuples.append(lits)
    if len(keys) == 1:
        return (f"{keys[0]} IN "
                f"({', '.join(sorted(t[0] for t in tuples))})")
    body = ", ".join("(" + ", ".join(t) + ")" for t in tuples)
    return f"({', '.join(keys)}) IN ({body})"


def _append_only_dirs(window: list, keys: list[str],
                      src: str) -> list[str] | None:
    """The window's staged data dirs IF every commit is a plain
    append whose recorded schema carries every group key under its
    current name — else None (the change-feed path handles rewrites,
    DVs, overwrites, alters, hive layouts, and folded checkpoints).
    Conservative by construction: any unexpected shape falls back."""
    if not window:
        return None
    dirs = []
    for c in window:
        if c.get("action") != "append" or c.get("transform") \
                or c.get("pcol") or not c.get("dir") \
                or not c.get("schema"):
            return None
        try:
            names = {f["name"] for f in
                     json.loads(c["schema"])["fields"]}
        except (ValueError, KeyError, TypeError):
            return None
        if not set(keys) <= names:
            return None
        dirs.append(os.path.join(src, c["dir"]))
    return dirs


def refresh(spark: SparkSession, mv_path: str,
            prune_key_limit: int = PRUNE_KEY_LIMIT) -> dict:
    """Advance the MV to the source head; returns refresh metrics.
    Idempotent: a crash between the data merge and the spec bump makes
    the next refresh recompute the same dirty groups to the same
    values (recomputation reads base data, never combines deltas).

    Cost discipline (the canary in ``bench.py`` tracks it): the change
    feed evaluates ONCE — a single grouped pass yields each dirty key
    with a removal flag (could this group have shrunk?).  Small dirty
    sets collect to the driver: the recompute scan prunes files via an
    IN-literal, and the vanished-group merge clause scopes to the
    REMOVAL keys as literals (stats-prunable on the MV side) — or is
    dropped entirely for append-only windows, the trickle-refresh
    common case.  Past ``prune_key_limit`` the grouped delta persists
    and the recompute semi-joins the full scan."""
    from .tables import ensure_registered

    fmt = TxnLogFormat(checkpoint_interval=None)
    spec = _spec(fmt, mv_path)
    src, keys = spec["source"], spec["keys"]
    last = spec["last_version"]
    head = fmt._commits(src)[-1]["version"]
    if head <= last:
        return {"refreshed_to": last, "dirty_groups": 0, "mode": "noop"}

    window = [c for c in fmt._commits(src)
              if last < c["version"] <= head]
    fast_dirs = _append_only_dirs(window, keys, src)
    fast = fast_dirs is not None and not spec.get("where")
    if fast:
        # APPEND-ONLY window fast path (the trickle-refresh common
        # case): the dirty keys are exactly the keys in the staged
        # files, read directly by the JVM parquet scan — no change-
        # feed machinery, no Python workers in the hot loop.  Appends
        # remove nothing, so no group can vanish (_rm = 0 throughout).
        grouped = (spark.read.parquet(*fast_dirs).select(*keys)
                   .groupBy(*keys).agg(F.lit(0).alias("_rm")))
    else:
        ensure_registered(spark)
        delta = (spark.read.format("txnlog")
                 .option("readChangeFeed", "true")
                 .option("startingVersion", str(last + 1))
                 .option("endingVersion", str(head)).load(src))
        if spec.get("where"):
            # the spec filter narrows the dirty set symmetrically: an
            # update moving a row OUT of the filter set still dirties
            # its old group (the preimage row passes), one moving it
            # IN dirties the new group (the postimage passes); rows
            # never in the set never dirty anything
            delta = delta.filter(spec["where"])
        rm_flag = F.col("_change_type").isin(
            "delete", "update_preimage").cast("int")
        grouped = delta.groupBy(*keys).agg(F.max(rm_flag).alias("_rm"))
    # persist BEFORE the probe: past the limit the semi-join path
    # reuses the grouped delta three more times (null check, count,
    # removal view) — without the cache the change feed would fully
    # re-evaluate in exactly the large-dirty-set case (review fix).
    # The append-only fast path SKIPS the cache (round 17, guide §5):
    # its grouped plan is one cheap parquet scan of the staged files,
    # so the trickle-refresh common case no longer pays a cache write
    # in its probe job (unpersist on a non-persisted frame is a no-op).
    if not fast:
        grouped = grouped.persist()
    probe = grouped.limit(prune_key_limit + 1).collect()
    if not probe:
        grouped.unpersist()
        _bump(fmt, mv_path, spec, head)
        return {"refreshed_to": head, "dirty_groups": 0,
                "mode": "noop"}
    pruned = len(probe) <= prune_key_limit
    nmbs, dview = None, None
    import hashlib

    # deterministic per-MV view name (round 17 — plan-text stability):
    # a per-call uuid made every semi-join refresh plan textually
    # unique; refreshes of the same MV can reuse compiled plan shapes.
    # Concurrent refreshes of the SAME MV are already a write conflict.
    dname = f"__mv_rm_{hashlib.md5(mv_path.encode()).hexdigest()[:12]}"
    mpw = None
    if pruned:
        if any(r[k] is None for r in probe for k in keys):
            grouped.unpersist()
            raise ValueError(
                f"NULL value in group key column(s) {keys} — "
                "materialized aggregates require non-null keys; "
                "filter them in the spec's where clause or aggregate "
                "a coalesced generated column instead")
        n_dirty = len(probe)
        # merge-side pruning (round 16, perf): the dirty keys are
        # already collected, so hand merge its key-prune predicate
        # instead of letting it re-derive the same thing with one more
        # distinct-collect job; per-key IN conjuncts, each implied by
        # key ∈ dirty keys ⊇ recomputed keys (the merge contract)
        parts = []
        for k in keys:
            lits = {TxnLogFormat._prune_literal(r[k]) for r in probe}
            if None in lits:
                parts = []
                break
            parts.append(f"{k} IN ({', '.join(sorted(lits))})")
        mpw = " AND ".join(parts) or None
        # EXACT single-key predicate (round 16, perf): when the one
        # group key renders as faithful SQL literals (ints / safe
        # strings — _prune_literal's round-trip guarantee), the
        # read-side row filter alone selects exactly the dirty groups'
        # rows, so the broadcast semi-join below is redundant — and
        # skipping it removes a driver-built DataFrame whose pickled
        # rows re-spawn Python workers on every downstream evaluation
        # of the recompute plan (measured: the dominant refresh cost).
        exact = (len(keys) == 1 and mpw is not None
                 and all(isinstance(r[keys[0]], (int, str))
                         and not isinstance(r[keys[0]], bool)
                         for r in probe))
        snap = fmt.read(spark, src, as_of_version=head,
                        where=(mpw if exact
                               else _key_predicate(keys, probe)))
        if exact:
            dirty = None
        else:
            # Arrow path (round 16, perf): the list-of-rows form builds
            # a pickled RDD that re-runs Python workers on EVERY action
            # consuming the join (measured ~3x per action); local_df
            # ships the keys as one Arrow batch, row fallback included.
            from .localrel import local_df
            dirty = F.broadcast(local_df(
                spark, [tuple(r[k] for k in keys) for r in probe],
                snap.select(*keys).schema))
        rm_rows = [r for r in probe if r["_rm"]]
        if rm_rows:
            # only groups that LOST rows can vanish; literals let the
            # merge's target-side scan stats-prune
            nmbs = _in_literal(keys, rm_rows)
            if nmbs is None:  # un-embeddable value: subquery fallback
                dview = dname
                spark.createDataFrame(
                    [tuple(r[k] for k in keys) for r in rm_rows],
                    snap.select(*keys).schema
                ).createOrReplaceTempView(dview)
        mode = "pruned"
    else:
        try:
            _refuse_null_keys(grouped.select(*keys))
        except ValueError:
            grouped.unpersist()
            raise
        n_dirty = grouped.count()
        snap = fmt.read(spark, src, as_of_version=head)
        dirty = grouped.select(*keys)
        dview = dname
        grouped.filter("_rm = 1").select(*keys) \
               .createOrReplaceTempView(dview)
        mode = "semi-join"
    if dview is not None:
        key_tuple = ("(" + ", ".join(keys) + ")" if len(keys) > 1
                     else keys[0])
        nmbs = (f"{key_tuple} IN "
                f"(SELECT {', '.join(keys)} FROM {dview})")
    if dirty is None:
        recomputed = _aggregate(snap, spec)
    else:
        cond = None
        for k in keys:
            c = snap[k].eqNullSafe(dirty[k])
            cond = c if cond is None else cond & c
        recomputed = _aggregate(snap.join(dirty, cond, "left_semi"),
                                spec)
    try:
        metrics = fmt.merge(
            spark, mv_path, recomputed, key=list(keys),
            # vanished groups: removal keys absent from the recompute
            not_matched_by_source_delete_condition=nmbs,
            _key_prune_where=mpw)
    finally:
        if dview is not None:
            spark.catalog.dropTempView(dview)
        grouped.unpersist()
    _bump(fmt, mv_path, spec, head)
    return {"refreshed_to": head, "dirty_groups": n_dirty,
            "mode": mode, **{k: metrics.get(k) for k in
                             ("updated", "inserted", "deleted")}}


def _bump(fmt: TxnLogFormat, mv_path: str, spec: dict,
          head: int) -> None:
    fmt.set_properties(
        None, mv_path,
        user_properties={MV_SPEC_PROP: json.dumps(
            {**spec, "last_version": head})})


def refresh_stream(spark: SparkSession, mv_path: str,
                   checkpoint_dir: str,
                   trigger_sec: float | None = None,
                   prune_key_limit: int = PRUNE_KEY_LIMIT):
    """CONTINUOUS maintenance: attach a Structured-Streaming query to
    the SOURCE table's commit stream whose only job is to trigger an
    idempotent :func:`refresh` per micro-batch — the streaming analogue
    of Databricks' scheduled materialized-view refresh, with the
    txnlog stream as the scheduler.  The batch DataFrame itself is
    never acted on (refresh replans its own window from the log, and
    is idempotent + spec-version-gated), so the trigger costs plan
    time only; ``ignoreChanges`` is set so UPDATE/DELETE/compaction
    commits keep triggering instead of failing the stream — the
    change-feed path inside refresh handles them exactly.

    Returns the live ``StreamingQuery`` (stop it with ``q.stop()``;
    ``q.processAllAvailable()`` barriers a test to caught-up)."""
    from .sources.txnlog_stream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    fmt = TxnLogFormat(checkpoint_interval=None)
    spec = _spec(fmt, mv_path)

    def _on_batch(df, epoch_id):
        refresh(spark, mv_path, prune_key_limit=prune_key_limit)

    w = (spark.readStream.format("txnlog")
         .option("ignoreChanges", "true")
         .load(spec["source"])
         .writeStream.foreachBatch(_on_batch)
         .option("checkpointLocation", checkpoint_dir))
    if trigger_sec is not None:
        w = w.trigger(processingTime=f"{trigger_sec} seconds")
    return w.start()

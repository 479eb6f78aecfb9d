"""Branches / tags / write-audit-publish (round 14 — VERDICT r13
item 4).

Iceberg refs parity on the txnlog format: a BRANCH is a hardlink clone
under ``<table>/_txn_refs/<name>`` (the state-fold portability
``clone`` proves — reference parity note: the reference has no
transactional tier at all; this is the engine's Delta/Iceberg-class
north star), a TAG is an immutable version pin, and
``publish_branch`` is the WAP fast-forward: ONE atomic squash commit
(action ``checkpoint`` — the state-reset shape every resolver already
replays) that makes the audited branch state the main head while every
pre-publish version stays time-travelable.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datalake_ingestion_system_spark.sinks import (ConcurrentWriteError,
                                                   TxnLogFormat)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    fmt = TxnLogFormat(checkpoint_interval=None)
    fmt.append(spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")), path)
    fmt.append(spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")), path)
    return {"path": path, "fmt": fmt}


def test_branch_isolation_then_publish_both_eras(spark, tbl):
    """The full WAP loop: write to a branch (main untouched), audit the
    branch read, publish atomically, and query BOTH eras afterwards."""
    fmt, path = tbl["fmt"], tbl["path"]
    fork = fmt.create_branch(path, "audit")
    assert fork == 1
    bp = fmt.ref_path(path, "audit")
    # WRITE: append + targeted delete on the branch only
    fmt.append(spark.range(100, 103).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")), bp)
    fmt.delete_where(spark, bp, "k = 0")
    # isolation: main is byte-identical to pre-branch
    assert fmt.read(spark, path).count() == 15
    # AUDIT: the branch read is the staged state
    audit = fmt.read(spark, path, ref="audit")
    assert audit.count() == 17
    assert audit.filter("k = 0").count() == 0
    # PUBLISH: fast-forward main
    v = fmt.publish_branch(path, "audit")
    assert v == 2
    main = fmt.read(spark, path)
    assert main.count() == 17
    assert main.filter("k = 0").count() == 0
    assert main.filter("k >= 100").count() == 3
    # both eras queryable: the pre-publish version is one travel away
    old = fmt.read(spark, path, as_of_version=fork)
    assert old.count() == 15
    assert old.filter("k = 0").count() == 1
    # history carries the publish record with its audit trail
    pub = [h for h in fmt.history(path) if h.get("publish_ref")]
    assert pub and pub[0]["publish_ref"] == "audit"
    assert pub[0]["publish_span"] == [2, 3]


def test_publish_is_strict_fast_forward(spark, tbl):
    """An interleaved main commit after the fork must abort the publish
    (ConcurrentWriteError) — WriteSerializable conflict semantics; the
    branch stays intact for a re-branch-and-reapply."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "wap")
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")),
        fmt.ref_path(path, "wap"))
    # interloper on main
    fmt.append(spark.range(1).select(
        (F.col("id") + 500).alias("k"), F.col("id").alias("v")), path)
    with pytest.raises(ConcurrentWriteError, match="fast-forward"):
        fmt.publish_branch(path, "wap")
    # branch unharmed, main holds only its own commits
    assert fmt.read(spark, path, ref="wap").count() == 16
    assert fmt.read(spark, path).count() == 16


def test_publish_noop_and_repeated_wap_rounds(spark, tbl):
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "r")
    # nothing staged: no-op, main head unchanged
    assert fmt.publish_branch(path, "r") == 1
    assert fmt.read(spark, path).count() == 15
    # round 1
    bp = fmt.ref_path(path, "r")
    fmt.append(spark.range(200, 202).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp)
    v1 = fmt.publish_branch(path, "r")
    assert fmt.read(spark, path).count() == 17
    # publishing again with nothing new staged is a no-op
    assert fmt.publish_branch(path, "r") == v1
    # round 2 on the SAME branch (ref re-pointed at the publish)
    fmt.append(spark.range(300, 301).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp)
    v2 = fmt.publish_branch(path, "r")
    assert v2 > v1
    assert fmt.read(spark, path).count() == 18
    assert fmt.read(spark, path, as_of_version=v1).count() == 17


def test_published_version_markers_never_exceed_head(spark, tbl):
    """The squash flattens branch-era version markers to the publish
    version: a folded entry version above main's head would become a
    stream offset pointing past the log, silently skipping later
    commits."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "m")
    bp = fmt.ref_path(path, "m")
    for i in range(3):  # branch versions 2, 3, 4 — all above fork+1
        fmt.append(spark.range(i, i + 1).select(
            (F.col("id") + 1000).alias("k"), F.col("id").alias("v")),
            bp)
    v = fmt.publish_branch(path, "m")
    raw = os.path.join(path, "_txn_log", f"{v:012d}.json")
    with open(raw) as f:
        rec = json.load(f)
    assert rec["action"] == "checkpoint"
    assert all(e["version"] <= v for e in rec["state"]["live"])
    assert all(sv <= v for sv, _ in rec["stats"].values())


def test_publish_additive_branch_schema_evolution(spark, tbl):
    """Round 15 (VERDICT r14 item 3): an ADD COLUMN branch publishes —
    the real WAP add-a-column flow: ALTER on the branch (with a
    default), backfill/stage AFTER it, publish — main's schema evolves
    atomically, pre-branch rows read the frozen default, staged rows
    their stored values, and the fork era stays time-travelable with
    the OLD schema."""
    fmt, path = tbl["fmt"], tbl["path"]
    fork = fmt.create_branch(path, "s")
    bp = fmt.ref_path(path, "s")
    fmt.alter_table(bp, add_columns={"extra": "int"},
                    column_defaults={"extra": 7})
    fmt.append(spark.range(100, 102).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit(1).alias("extra")), bp)
    v = fmt.publish_branch(path, "s", drop=True)
    main = fmt.read(spark, path)
    assert main.columns == ["k", "v", "extra"]
    assert main.count() == 17
    got = {r.k: r.extra for r in main.collect()}
    assert got[0] == 7 and got[100] == 1 and got[101] == 1
    # fork era: old two-column schema
    old = fmt.read(spark, path, as_of_version=fork)
    assert old.columns == ["k", "v"] and old.count() == 15
    # main still writable post-evolution and reads consistently
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        F.lit(2).alias("extra")), path)
    assert fmt.read(spark, path).count() == 18
    assert v == fork + 1


def test_publish_refuses_non_additive_and_data_before_alter(spark, tbl):
    """The refusals that REMAIN (and must stay loud): renames / drops /
    widenings cannot flatten, and an additive alter with data staged
    BEFORE it in the same round would mis-mark the pre-alter files."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "s")
    bp = fmt.ref_path(path, "s")
    fmt.alter_table(bp, rename_columns={"v": "w"})
    with pytest.raises(ValueError, match="renamed, dropped"):
        fmt.publish_branch(path, "s")
    fmt.drop_ref(path, "s")
    fmt.create_branch(path, "s2")
    bp2 = fmt.ref_path(path, "s2")
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp2)
    fmt.alter_table(bp2, add_columns={"extra": "int"})
    with pytest.raises(ValueError, match="BEFORE its ADD COLUMN"):
        fmt.publish_branch(path, "s2")
    # main untouched and still writable after both refusals
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")), path)
    assert fmt.read(spark, path).count() == 16


def test_publish_additive_multi_round_wap(spark, tbl):
    """Two additive WAP rounds on the SAME kept branch: round 2's
    alter must not re-apply to round 1's published files (era map
    through publish_history), and each round's defaults land on
    exactly the rows that predate its alter."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "w")
    bp = fmt.ref_path(path, "w")
    fmt.alter_table(bp, add_columns={"a1": "int"},
                    column_defaults={"a1": 1})
    fmt.append(spark.range(100, 101).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        F.lit(10).alias("a1")), bp)
    v1 = fmt.publish_branch(path, "w")          # round 1
    fmt.alter_table(bp, add_columns={"a2": "int"},
                    column_defaults={"a2": 2})
    fmt.append(spark.range(200, 201).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        F.lit(10).alias("a1"), F.lit(20).alias("a2")), bp)
    v2 = fmt.publish_branch(path, "w", drop=True)  # round 2
    assert v2 == v1 + 1
    main = fmt.read(spark, path)
    assert main.columns == ["k", "v", "a1", "a2"]
    got = {r.k: (r.a1, r.a2) for r in main.collect()}
    assert got[0] == (1, 2)        # pre-branch: both defaults
    assert got[100] == (10, 2)     # round-1 row: stored a1, default a2
    assert got[200] == (10, 20)    # round-2 row: both stored


def test_tags_pin_versions_immutably(spark, tbl):
    fmt, path = tbl["fmt"], tbl["path"]
    assert fmt.create_tag(path, "v0", version=0) == 0
    assert fmt.create_tag(path, "latest") == 1
    assert fmt.read(spark, path, ref="v0").count() == 10
    assert fmt.read(spark, path, ref="latest").count() == 15
    with pytest.raises(FileExistsError, match="already exists"):
        fmt.create_tag(path, "v0", version=1)
    with pytest.raises(ValueError, match="tag"):
        fmt.read(spark, path, ref="v0", as_of_version=1)
    with pytest.raises(ValueError, match="tag"):
        fmt.publish_branch(path, "v0")
    with pytest.raises(ValueError):
        fmt.create_tag(path, "ghost", version=99)
    names = [r["name"] for r in fmt.list_refs(path)]
    assert names == ["latest", "v0"]
    fmt.drop_ref(path, "v0")
    with pytest.raises(ValueError, match="no ref"):
        fmt.read(spark, path, ref="v0")


def test_drop_branch_leaves_main_data(spark, tbl):
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "tmp")
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")),
        fmt.ref_path(path, "tmp"))
    fmt.drop_ref(path, "tmp")
    assert not os.path.isdir(fmt.ref_path(path, "tmp"))
    assert fmt.read(spark, path).count() == 15  # hardlinks: main intact
    assert fmt.list_refs(path) == []


def test_branch_survives_main_vacuum(spark, tbl):
    """Vacuum sweeps only _txn_data and the log — branch data under
    _txn_refs is structurally out of reach, and shared inodes stay
    alive through the branch's own hardlinks."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "keep")
    # replace main entirely, then vacuum with zero retention
    fmt.overwrite_table(spark.range(2).select(
        F.col("id").alias("k"), F.col("id").alias("v")), path)
    fmt.vacuum(path, retain_hours=0.0)
    assert fmt.read(spark, path, ref="keep").count() == 15


def test_publish_after_drop_then_cdf_refuses_folded_span(spark, tbl):
    """The change feed must refuse to cross a publish squash (the
    per-commit records were folded away) — same rule as clone seeds."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "cdc")
    fmt.append(spark.range(50, 52).select(
        F.col("id").alias("k"), F.col("id").alias("v")),
        fmt.ref_path(path, "cdc"))
    v = fmt.publish_branch(path, "cdc", drop=True)
    assert fmt.list_refs(path) == []
    from datalake_ingestion_system_spark import tables
    tables.ensure_registered(spark)
    with pytest.raises(Exception, match="folded|change"):
        (spark.read.format("txnlog")
         .option("readChangeFeed", "true")
         .option("startingVersion", "0")
         .load(path)).collect()
    # post-publish commits feed normally
    fmt.append(spark.range(60, 61).select(
        F.col("id").alias("k"), F.col("id").alias("v")), path)
    feed = (spark.read.format("txnlog")
            .option("readChangeFeed", "true")
            .option("startingVersion", str(v + 1)).load(path))
    assert feed.count() == 1


def test_repeated_publish_preserves_prior_round_versions(spark, tbl):
    """Review r14: a second WAP round must NOT re-stamp entries the
    first round already published — a stream committed past round 1
    would otherwise see them at a newer version and re-emit (duplicate
    delivery).  The era map rides the ref's publish_history."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "w2")
    bp = fmt.ref_path(path, "w2")
    fmt.append(spark.range(500, 502).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp)
    v1 = fmt.publish_branch(path, "w2")        # round 1
    fmt.append(spark.range(600, 601).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp)
    v2 = fmt.publish_branch(path, "w2")        # round 2
    assert (v1, v2) == (2, 3)
    raw = os.path.join(path, "_txn_log", f"{v2:012d}.json")
    with open(raw) as f:
        rec = json.load(f)
    by_version = {}
    for e in rec["state"]["live"]:
        for rf in e.get("files") or []:
            by_version.setdefault(e["version"], 0)
        by_version[e["version"]] = by_version.get(e["version"], 0) + 1
    # round-1 entries keep v1; only the new append carries v2; the
    # original main-era entries keep their real versions (0, 1)
    vs = sorted({e["version"] for e in rec["state"]["live"]})
    assert vs == [0, 1, v1, v2]
    assert rec["publish_span"] == [3, 3]  # branch commit 3 only
    # and the data is right across all three eras
    assert fmt.read(spark, path).count() == 18
    assert fmt.read(spark, path, as_of_version=v1).count() == 17
    assert fmt.read(spark, path, as_of_version=1).count() == 15


def test_racing_publishers_one_wins_atomically(spark, tbl):
    """Two threads publish DIFFERENT branches forked from the same
    version: exactly one squash claims fork+1, the loser aborts with
    ConcurrentWriteError mid-flight (the single-link version race),
    and the table is the winner's state — never a blend, never a
    partial publish."""
    import threading

    fmt, path = tbl["fmt"], tbl["path"]
    for b, lo in (("ra", 700), ("rb", 800)):
        fmt.create_branch(path, b)
        fmt.append(spark.range(lo, lo + 2).select(
            F.col("id").alias("k"), F.col("id").alias("v")),
            fmt.ref_path(path, b))
    results: dict[str, object] = {}
    barrier = threading.Barrier(2)

    def publish(b):
        try:
            barrier.wait()
            results[b] = fmt.publish_branch(path, b)
        except ConcurrentWriteError as e:
            results[b] = e

    ts = [threading.Thread(target=publish, args=(b,))
          for b in ("ra", "rb")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wins = [b for b, r in results.items() if isinstance(r, int)]
    errs = [b for b, r in results.items()
            if isinstance(r, ConcurrentWriteError)]
    assert len(wins) == 1 and len(errs) == 1, results
    got = fmt.read(spark, path)
    assert got.count() == 17  # base 15 + exactly ONE branch's 2 rows
    lo = 700 if wins[0] == "ra" else 800
    assert got.filter(f"k >= {lo} AND k < {lo + 2}").count() == 2
    other = 800 if lo == 700 else 700
    assert got.filter(f"k >= {other} AND k < {other + 2}").count() == 0


def test_crash_mid_publish_leaves_main_clean(spark, tbl, monkeypatch):
    """A publisher dying between the data-file links and the commit
    must leave main byte-identical (links are invisible until the
    record publishes — orphans are ordinary died-writer debris vacuum
    sweeps after retention), the branch intact, and a retried publish
    must succeed and converge on the same links."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "cr")
    fmt.append(spark.range(900, 903).select(
        F.col("id").alias("k"), F.col("id").alias("v")),
        fmt.ref_path(path, "cr"))

    real_commit = TxnLogFormat._commit

    def boom(self, *a, **k):
        raise RuntimeError("simulated crash after links, before commit")

    monkeypatch.setattr(TxnLogFormat, "_commit", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        fmt.publish_branch(path, "cr")
    monkeypatch.setattr(TxnLogFormat, "_commit", real_commit)
    # main unchanged: the orphan-linked dirs are not referenced by any
    # commit, so reads and history are byte-identical
    assert fmt.read(spark, path).count() == 15
    assert fmt._commits(path)[-1]["version"] == 1
    # dry-run vacuum sees the orphan dirs as ordinary debris (age
    # guard keeps them; zero retention would list them)
    orphans = fmt.vacuum(path, retain_hours=0.0, dry_run=True)
    assert orphans, "the crash-linked dirs must be sweepable"
    # the retry converges on the already-linked files and publishes
    v = fmt.publish_branch(path, "cr")
    assert fmt.read(spark, path).count() == 18
    assert fmt.read(spark, path, as_of_version=v).count() == 18


def test_branch_maintenance_matrix_compact_vacuum(spark, tbl):
    """Round 15 (VERDICT r14 item 5): compaction and vacuum interact
    safely across a branch's hardlinked inodes IN BOTH DIRECTIONS —
    compact main + vacuum branch, then compact branch + vacuum main —
    with row equality on BOTH heads after every step.  The trap being
    pinned: vacuum deletes one side's directory ENTRIES; the other
    side's hardlinks to the same inodes must keep its reads intact."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "b")
    bp = fmt.ref_path(path, "b")
    fmt.append(spark.range(100, 103).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")), bp)

    def heads():
        m = sorted((r.k, r.v) for r in fmt.read(spark, path).collect())
        b = sorted((r.k, r.v) for r in fmt.read(spark, bp).collect())
        return m, b

    main0, branch0 = heads()
    assert len(main0) == 15 and len(branch0) == 18

    # direction 1: compact MAIN (retires main's original dirs), vacuum
    # the BRANCH aggressively — branch must not sweep anything a head
    # still references, and main's compaction must not disturb it
    fmt.compact(spark, path)
    fmt.vacuum(bp, retain_hours=0)
    assert heads() == (main0, branch0)

    # ...then vacuum MAIN (deletes main's retired pre-compact dir
    # entries — the branch holds hardlinks to those same inodes)
    fmt.vacuum(path, retain_hours=0)
    assert heads() == (main0, branch0)

    # direction 2: compact the BRANCH, vacuum MAIN again, then vacuum
    # the BRANCH (sweeps the branch's own retired originals)
    fmt.compact(spark, bp)
    fmt.vacuum(path, retain_hours=0)
    assert heads() == (main0, branch0)
    fmt.vacuum(bp, retain_hours=0)
    assert heads() == (main0, branch0)

    # both sides still writable and consistent afterwards
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")), path)
    fmt.append(spark.range(1, 2).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp)
    m, b = heads()
    assert len(m) == 16 and len(b) == 19
    # publish still works after cross-side maintenance: re-branch from
    # the (compacted, vacuumed, appended) main and fast-forward
    fmt.drop_ref(path, "b")
    fmt.create_branch(path, "b2")
    bp2 = fmt.ref_path(path, "b2")
    fmt.append(spark.range(500, 501).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp2)
    fmt.publish_branch(path, "b2", drop=True)
    assert fmt.read(spark, path).count() == 17


def test_publish_checkpoint_before_alter_is_not_data(spark, tbl):
    """ADVICE r15: a checkpoint commit landing on the branch BEFORE the
    ADD COLUMN folds metadata only — it stages no files, so it must not
    trigger the data-before-alter refusal (the auto-checkpoint cadence
    can land one at any version)."""
    fmt, path = tbl["fmt"], tbl["path"]
    fork = fmt.create_branch(path, "ck")
    bp = fmt.ref_path(path, "ck")
    # a fileless metadata commit advances the branch head past the
    # fork, then an explicit checkpoint folds at that head — exactly
    # the shape an interval auto-checkpoint produces mid-branch
    fmt.set_properties(spark, bp, change_data_feed=True)
    ck_v = fmt.checkpoint(bp)
    assert ck_v == fork + 1
    fmt.alter_table(bp, add_columns={"extra": "int"},
                    column_defaults={"extra": 7})
    fmt.append(spark.range(100, 102).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit(1).alias("extra")), bp)
    v = fmt.publish_branch(path, "ck", drop=True)
    assert v == fork + 1
    main = fmt.read(spark, path)
    assert main.columns == ["k", "v", "extra"]
    assert main.count() == 17
    got = {r.k: r.extra for r in main.collect()}
    assert got[0] == 7 and got[100] == 1 and got[101] == 1
    # the genuine refusal stays loud: real data staged before the alter
    fmt.create_branch(path, "bad")
    bp2 = fmt.ref_path(path, "bad")
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        F.lit(0).alias("extra")), bp2)
    fmt.alter_table(bp2, add_columns={"more": "int"})
    with pytest.raises(ValueError, match="BEFORE its ADD COLUMN"):
        fmt.publish_branch(path, "bad")


def test_publish_refuses_data_folded_under_checkpoint(spark, tbl):
    """Round-16 review fix: data staged BEFORE the ADD COLUMN must
    refuse the publish even when a checkpoint folded the staging
    commit away — the folded live entries keep their versions, and
    the gate reads them out of the fold."""
    fmt, path = tbl["fmt"], tbl["path"]
    fmt.create_branch(path, "fold")
    bp = fmt.ref_path(path, "fold")
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")), bp)
    fmt.checkpoint(bp)  # folds the pre-alter append
    fmt.alter_table(bp, add_columns={"extra": "int"})
    with pytest.raises(ValueError, match="BEFORE its ADD COLUMN"):
        fmt.publish_branch(path, "fold")
    # main untouched and still writable
    fmt.append(spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")), path)
    assert fmt.read(spark, path).count() == 16

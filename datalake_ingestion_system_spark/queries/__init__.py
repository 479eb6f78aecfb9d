"""Named query registry — the engine's public query surface.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE_SQL: dict[str, str]`` (ANSI/DuckDB SQL over the same parquet
views).  Keys absent from ``ORACLE_SQL`` are non-SQL-expressible operators
(approximate / hash-dependent / streaming-stateful) checked rows-only.
"""

from __future__ import annotations

import glob
import json
import os

from . import functional, llmops, relational, streaming_q, tpch


# Merge order controls which queries front the dict (CI samples the first-50
# prefix for its hash-vs-oracle gate).  Rotation discipline: a query rotates
# to the BACK once the driver has recorded evidence for it — a green
# hash_match row, or (for rows-only-by-design entries) any sampled row — so
# the prefix spends its slots on entries that still lack driver evidence
# (new queries, fixed failures, rows-only entries that just gained an
# oracle).  The rotation set is computed from the CORRECTNESS_r*.json
# records at import time, so it maintains itself round over round; every
# rotated query remains registered and locally oracle-verified
# (tools/verify_local.py runs the full registry, not a sample).
_MODULE_ORDER = (llmops, streaming_q, functional, relational, tpch)

# Queries whose implementation or oracle changed AFTER their last green
# driver row belong back in the sampled prefix until re-verified.
# Round 6: the perf rework touched these green queries' implementations
# (bucketed as-of cogroup; contamination explode_outer restructure; spread
# guard in the rolling/winnow/chargram/minhash paths) — semantics are
# partitioning-independent by design and locally re-verified, but the
# driver should confirm.  q_embedding_quantize (oracle fix) and the new
# round-6 queries have no green row, so the rotation fronts them
# automatically.
_FORCE_FRONT: tuple[str, ...] = (
    # Round 9: all 14 round-8 fronted txn-path entries hold green rows
    # in CORRECTNESS_r08 and are RELEASED to the rotation.  Fronted
    # now: the same transitive closure again — round 9 rewrote read()'s
    # access path (log-level partition-value dir pruning), moved
    # checkpoint per-file stats to a parquet sidecar (_stats_entries /
    # _file_bytes_of rework), and changed the stream's planning checks
    # (data_changed flag, schema-evolution fail-loud).  The round-9b
    # session then added WriteSerializable conflict retargeting to
    # _commit (every txn fixture build rides it), factored read()'s
    # stats pruning into _clause_excluded_files, and reworked the
    # stream module (CDF planner, pushdown reader, write path) — same
    # closure, re-verified locally again (16/16 oracle-green after the
    # conflict change, 7/7 skipping queries after the pruning
    # refactor).  The round-9c session then made DELETE/UPDATE
    # file-targeted (rewrite_files + data_change flag), moved every
    # commit-recorded scan to EXPLICIT file lists (read()'s scan_target
    # shape), added the file-level vacuum sweep, and taught both stream
    # planners the compaction-vs-data-change split — the full closure
    # re-verified locally a third time (19/19 oracle-green across the
    # read-path + stream sets).  All load-bearing machinery changed
    # after these queries' last green driver row — the driver must
    # confirm.  The same session added the change_data_feed sidecar
    # (merge/delete/update record exact per-row changes; the CDF
    # planner emits them) — merge's commit record was refactored in
    # the process, so the merge-riding queries stay fronted — plus
    # bloom-filter skipping (a new branch in _provably_empty, the
    # shared pruning core: the 7 skipping queries re-verified green
    # after it), the extended history() columns, and persisted table
    # properties (_stage now resolves effective config per table —
    # every write path re-verified by the same suites + closure).
    # (--changed-since cannot see transitive sinks edits; this is the
    # manual closure.  q_partition_pruned_read, q_change_data_feed,
    # q_cdf_replica_mirror, q_txnlog_stream_sink, q_targeted_cow_read,
    # q_cdf_sidecar_changes, q_bloom_skipping_read, and
    # q_compact_where_read are new and front automatically.)
    "q_data_skipping_read", "q_dv_compact_read", "q_zorder_skipping_read",
    "q_schema_evolution_read", "q_delete_vector_read", "q_merge_upsert",
    "q_txnlog_stream_source", "q_minhash_incremental",
    "q_cdc_stream_apply", "q_rollup_incremental", "q_stream_kmv_distinct",
    "q_checkpoint_log_read", "q_small_file_compact_read",
    "q_alter_skipping_read")


def _evidence():
    """(green, sampled) query-name sets from the driver's CORRECTNESS logs."""
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    green, sampled = set(), set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            sampled.add(name)
            if isinstance(row, dict) and row.get("hash_match"):
                green.add(name)
    return green, sampled


def _rotate_to_back():
    green, sampled = _evidence()
    oracle_keys = set()
    for mod in _MODULE_ORDER:
        oracle_keys.update(getattr(mod, "ORACLE_SQL"))
    rotated = set(green) | {n for n in sampled if n not in oracle_keys}
    return rotated - set(_FORCE_FRONT)


def _merge(attr):
    merged = {}
    for mod in _MODULE_ORDER:
        merged.update(getattr(mod, attr))
    rotated = _rotate_to_back()
    for key in list(merged):
        if key in rotated:
            merged[key] = merged.pop(key)
    return merged


def all_queries():
    return _merge("QUERIES")


def all_oracle_sql():
    return _merge("ORACLE_SQL")

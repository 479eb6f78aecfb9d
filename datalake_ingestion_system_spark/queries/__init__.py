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
_FORCE_FRONT: tuple[str, ...] = (
    # Round 16: all 50 round-15 window entries hold green rows in
    # CORRECTNESS_r15 (50/50) and are RELEASED.  Fronted now: the
    # THREE new queries (q_dml_subquery, q_matview_incremental,
    # q_merge_insert_values — the mechanical --changed-since answer,
    # 3-SF green) plus the transitive closure of this round's operator
    # edits — (a) merge internals (insert_assignments touched the
    # routing-join projection, pure-insert branch, and CDF insert
    # slice: every q_merge_*), (b) the router (TT FOR-spellings,
    # plain-ref AnalysisException fallback, CREATE/REFRESH/DROP MV
    # arms, generic TBLPROPERTIES: the q_*_sql set + catalog JVM-read
    # queries), (c) publish gate checkpoint exclusion (q_wap_*,
    # q_refs_sql, q_clone_read), (d) the batch-scan anti-filter raise
    # (partition/CDF/stream consumers).  All entries below re-verified
    # green at sf0.01 this session (the three new ones at ALL THREE
    # SFs); remaining prefix slots fill with rotated-green entries.
    # Round 16 OPTIMIZATION round additions: the mechanical
    # --changed-since answer for this round's edits (all 3-SF green
    # this session) — q_clamped_running_balance (Lindley closed-form
    # rewrite), q_join_interval_config / q_transform_rewrite_read
    # (local_df Arrow-built constants) — plus the transitive closure of
    # the operator edits: localrel.local_df consumers (row-id file-base
    # table: every with_row_ids read; DSIR vocab / mixture bounds /
    # pack-bins offsets / PQ codebook), the merge _key_prune_where
    # kwarg + matview exact-IN recompute, and the DML
    # reserved-column check now reading the commit-recorded schema
    # (delete/update entry points).
    "q_clamped_running_balance", "q_join_interval_config",
    "q_transform_rewrite_read", "q_dsir_selection",
    "q_quality_classifier", "q_mixture_sample", "q_pack_bins_global",
    "q_training_shards_e2e", "q_pq_adc_topk", "q_delete_vector_read",
    "q_dv_compact_read",
    "q_dml_subquery", "q_matview_incremental", "q_merge_insert_values",
    "q_convert_parquet",
    "q_merge_upsert", "q_merge_targeted_read", "q_merge_set_columns",
    "q_merge_identity_insert", "q_merge_full_sync",
    "q_merge_schema_evolution",
    "q_sql_dml_roundtrip", "q_time_travel_sql", "q_alter_ctas_sql",
    "q_create_table_sql", "q_table_changes_sql", "q_refs_sql",
    "q_wap_publish_read", "q_wap_schema_publish",
    "q_catalog_partition_read", "q_catalog_dv_read",
    "q_catalog_table_read", "q_catalog_join_broadcast",
    "q_clone_read", "q_auto_compact_read", "q_compact_where_read",
    "q_txnlog_stream_source", "q_txnlog_stream_sink",
    "q_txnlog_stream_pushdown", "q_stream_drain",
    "q_cdf_partition_overwrite", "q_cdf_row_ids",
    "q_cdf_rowid_mirror", "q_change_data_feed")


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

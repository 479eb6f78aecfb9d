"""Measured shuffle audit: ACTUAL SQLMetrics from executed plans → SHUFFLES.md.

`tools/explain_audit.py` counts Exchange nodes in the *static* plan; this
tool runs each query and reads the executed plan's SQLMetrics through py4j
(AQE stages unwrapped), so the numbers are what really moved:

- bytes/records written per shuffle Exchange (post-AQE, i.e. what survived
  coalescing and broadcast demotion),
- memory/disk spill anywhere in the plan (any non-zero spill at sf0.1 is a
  red flag: it means partitions already exceed executor memory headroom at
  1/1000th of target scale),
- the single largest Exchange (the 100 TB bottleneck candidate).

This is the "measure, don't guess" half of the scale review: a plan can
look shuffle-minimal and still move the whole table; only the executed
metrics can show shuffled-bytes ≈ payload-actually-needed.

Streaming queries are skipped: their returned frame reads a memory-sink
table, so its execution metrics would describe the sink read, not the
stream.

Usage: python tools/shuffle_audit.py [query ...]   (default: bench headline
set minus streaming).  Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SET = [
    "q01_pricing_summary", "q03_shipping_priority",
    "q05_region_supplier_volume", "q_window_topk_per_group",
    "q_rollup_region_nation", "q_sessionization", "q_dedup_exact",
    "q_minhash_lsh_pairs", "q_cosine_topk", "q_token_stats",
    "q_bm25_search", "q_ann_ivf_topk", "q_pagerank_bipartite",
    "q_kmeans_verifiable", "q_semantic_dedup", "q_benford_leading_digit",
    "q_recursive_hierarchy_rollup", "q_variant_json_metadata",
    "q_series_interpolate", "q_session_paths", "q_clamped_running_balance",
    "q_ewma_smoothing", "q_prorate_largest_remainder", "q_ab_test_ztest",
    "q_spatial_grid_join", "q_linear_trend", "q_growth_accounting",
    "q_fifo_lot_matching",
    # round 7: distributed prefix-sum packing + the table-format headline
    "q_pack_bins_global", "q_training_shards_e2e", "q_merge_upsert",
    "q_dv_compact_read", "q_minhash_incremental", "q_data_skipping_read",
    "q_schema_evolution_read", "q_charngram_lm_score",
    # round 12: the file-targeted merge + SQL-DML + metadata-join tier
    "q_merge_targeted_read", "q_sql_dml_roundtrip",
    "q_history_manifest_join", "q_transform_evolution_read",
    # round 8: checkpointed commit log read path
    "q_checkpoint_log_read",
    # round 9: log-level partition pruning + the change data feed
    "q_partition_pruned_read", "q_change_data_feed", "q_cdf_replica_mirror",
    # round 9c: file-targeted COW, CDF sidecars, bloom skipping
    "q_targeted_cow_read", "q_cdf_sidecar_changes", "q_bloom_skipping_read",
]


def _metric_values(node) -> dict[str, int]:
    it = node.metrics().iterator()
    vals = {}
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def _walk(node, out: list):
    """Depth-first over the EXECUTED plan, unwrapping AQE stage nodes
    (QueryStageExec hides its subtree behind .plan(), AdaptiveSparkPlanExec
    behind .executedPlan())."""
    name = node.nodeName()
    out.append((name, _metric_values(node)))
    if "QueryStage" in name:
        _walk(node.plan(), out)
    elif name == "AdaptiveSparkPlan":
        _walk(node.executedPlan(), out)
    else:
        ch = node.children()
        for i in range(ch.size()):
            _walk(ch.apply(i), out)


def audit_df(df) -> dict:
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    exchanges = [m for n, m in nodes
                 if n == "Exchange" and "shuffleBytesWritten" in m]
    spills = sum(m.get("spillSize", 0) + m.get("memoryBytesSpilled", 0)
                 + m.get("diskBytesSpilled", 0) for _, m in nodes)
    return {
        "n_exchanges": len(exchanges),
        "shuffle_bytes": sum(m["shuffleBytesWritten"] for m in exchanges),
        "shuffle_records": sum(m.get("shuffleRecordsWritten", 0)
                               for m in exchanges),
        "max_exchange_bytes": max(
            (m["shuffleBytesWritten"] for m in exchanges), default=0),
        "spill_bytes": spills,
        "scan_rows": sum(m.get("numOutputRows", 0) for n, m in nodes
                         if n.startswith("Scan")),
    }


def main() -> None:
    import __spark_entry__ as e
    from datalake_ingestion_system_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shuffle-audit")
    qs = e.queries()

    rows, flags = [], []
    for name in names:
        if name not in qs:
            rows.append((name, None, "NOT REGISTERED"))
            continue
        df = qs[name](spark, sf_dir)
        n = len(df.collect())
        m = audit_df(df)
        rows.append((name, m, f"{n} rows"))
        if m["spill_bytes"]:
            flags.append(f"- {name}: SPILLED {m['spill_bytes']:,} bytes "
                         "at sf0.1 — will not survive 1000x")

    out = [f"# Measured shuffle audit (executed-plan SQLMetrics), "
           f"sf dir: {sf_dir}", "",
           "Post-AQE numbers: what actually moved, after coalescing and "
           "broadcast demotion. `max_exch` is the largest single Exchange "
           "(the scale-up bottleneck candidate).", "",
           "| query | exchanges | shuffled | records | max_exch | "
           "spill | scan rows | result |",
           "|---|---|---|---|---|---|---|---|"]
    for name, m, note in rows:
        if m is None:
            out.append(f"| {name} | — | — | — | — | — | — | {note} |")
            continue
        out.append(
            f"| {name} | {m['n_exchanges']} "
            f"| {m['shuffle_bytes'] / 1e6:.2f} MB "
            f"| {m['shuffle_records']:,} "
            f"| {m['max_exchange_bytes'] / 1e6:.2f} MB "
            f"| {m['spill_bytes']:,} | {m['scan_rows']:,} | {note} |")
    out += ["", "## Red flags", ""]
    out += flags or ["NONE — no spill anywhere; every shuffle is a "
                     "reduced/keyed payload, not a table copy."]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHUFFLES.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}; flags: {len(flags)}")


if __name__ == "__main__":
    main()

"""Dump formatted physical plans for the headline bench queries → PLANS.md.

The scale-review loop the repo works by: after correctness, read the plan
and check the things that matter at 100 TB — PushedFilters/ReadSchema on
every scan, BroadcastHashJoin for dims, partial aggregation before
exchanges, WholeStageCodegen spans, no CartesianProduct, no per-row Python.

Usage: python tools/explain_audit.py [query ...]   (default: bench set)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SET = [
    "q01_pricing_summary", "q03_shipping_priority",
    "q05_region_supplier_volume", "q_window_topk_per_group",
    "q_rollup_region_nation", "q_sessionization", "q_dedup_exact",
    "q_cosine_topk", "q_token_stats", "q_higher_order_funcs",
    "q_train_test_split", "q_profile_documents",
]

RED_FLAGS = (
    "CartesianProduct", "BatchEvalPython",  # per-row Python UDF stage
)


def main() -> None:
    import __spark_entry__ as e
    from datalake_ingestion_system_spark.session import get_spark

    names = sys.argv[1:] or BENCH_SET
    qs = e.queries()
    # VERDICT r7 item 4: reject unknown names UP FRONT instead of
    # emitting bogus "NOT REGISTERED" sections into PLANS.md (a past
    # invocation passed prose words as query names and committed them)
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"not registered queries (refusing to write PLANS.md "
                 f"sections for them): {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain-audit")
    out = ["# Physical plans (formatted), sf dir: " + sf_dir, ""]
    flags = []
    for name in names:
        df = qs[name](spark, sf_dir)
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        for flag in RED_FLAGS:
            if flag in plan:
                flags.append((name, flag))
        n_scans = plan.count("Scan parquet")
        n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        n_bcast = plan.count("BroadcastHashJoin")
        n_exch = plan.count("Exchange")
        out.append(f"## {name}")
        out.append(f"scans={n_scans} pushed_filter_scans={n_pushed} "
                   f"broadcast_joins={n_bcast} exchanges={n_exch}")
        out.append("```\n" + plan.strip() + "\n```")
        out.append("")
    out.append("## Red flags")
    out.append("NONE" if not flags else
               "\n".join(f"- {n}: {f}" for n, f in flags))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}; red flags: {flags or 'none'}")


if __name__ == "__main__":
    main()

"""Dump formatted physical plans for the headline bench queries → PLANS.md.

The scale-review loop the repo works by: after correctness, read the plan
and check the things that matter at 100 TB — PushedFilters/ReadSchema on
every scan, BroadcastHashJoin for dims, partial aggregation before
exchanges, WholeStageCodegen spans, no CartesianProduct, no per-row Python.

Usage: python tools/explain_audit.py [query ...]   (default: bench set)
       python tools/explain_audit.py --full

``--full`` (round 12 — VERDICT r11 item 4) audits EVERY registered
query into PLANS_full.md in compact form: one summary line per query
(scans / pushed-filter scans / broadcast joins / exchanges / red
flags), with full plan text emitted only for red-flagged queries.
tests/test_analytics_invariants.py asserts the full audit covers the
whole registry, so adding a query without re-running the audit fails
the suite — the coverage can't silently thin again.
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

#: (query, flag) pairs reviewed and accepted — the flag is the FEATURE,
#: not an accident; each carries the adjudication the reviewer needs
ADJUDICATED = {
    ("q_udtf_term_stats", "BatchEvalPython"):
        "UDTF capability demo (SURVEY §2 U2): the Python table "
        "function surface IS the operator being demonstrated; "
        "bounded input, not a hot-path stage",
}


def main() -> None:
    import __spark_entry__ as e
    from datalake_ingestion_system_spark.session import get_spark

    full = "--full" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--full"]
    qs = e.queries()
    names = args or (sorted(qs) if full else BENCH_SET)
    # VERDICT r7 item 4: reject unknown names UP FRONT instead of
    # emitting bogus "NOT REGISTERED" sections into PLANS.md (a past
    # invocation passed prose words as query names and committed them)
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"not registered queries (refusing to write PLANS.md "
                 f"sections for them): {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain-audit")
    hdr = ("# Compact physical-plan audit of the FULL registry"
           if full else "# Physical plans (formatted)")
    out = [f"{hdr}, sf dir: {sf_dir}", ""]
    if full:
        out += ["One line per query: scans / scans with pushed filters "
                "/ broadcast joins / exchanges; full plan text only for "
                "red-flagged queries.  Regenerate with "
                "`python tools/explain_audit.py --full` — the "
                "registry-coverage test fails when a query is added "
                "without re-auditing.", ""]
    flags = []
    errors = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            jvm = df.sparkSession._jvm
            mode = (jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # audit must not die mid-registry
            errors.append((name, repr(exc)))
            out.append(f"## {name}")
            out.append(f"ERROR building plan: {exc!r}")
            out.append("")
            continue
        myflags = [f for f in RED_FLAGS if f in plan]
        flags.extend((name, f) for f in myflags)
        n_scans = plan.count("Scan parquet")
        n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        n_bcast = plan.count("BroadcastHashJoin")
        n_exch = plan.count("Exchange")
        out.append(f"## {name}")
        out.append(f"scans={n_scans} pushed_filter_scans={n_pushed} "
                   f"broadcast_joins={n_bcast} exchanges={n_exch}"
                   + (f" RED_FLAGS={','.join(myflags)}" if myflags
                      else ""))
        if not full or myflags:
            out.append("```\n" + plan.strip() + "\n```")
        out.append("")
    out.append("## Red flags")
    open_flags = [(n, f) for n, f in flags if (n, f) not in ADJUDICATED]
    adj = [(n, f) for n, f in flags if (n, f) in ADJUDICATED]
    out.append("NONE" if not open_flags else
               "\n".join(f"- {n}: {f}" for n, f in open_flags))
    for n, f in adj:
        out.append(f"- {n}: {f} — ADJUDICATED: {ADJUDICATED[(n, f)]}")
    if errors:
        out.append("")
        out.append("## Plan-build errors")
        out.extend(f"- {n}: {err}" for n, err in errors)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "PLANS_full.md" if full else "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}; open red flags: {open_flags or 'none'} "
          f"(adjudicated: {len(adj)}); errors: {errors or 'none'}")


if __name__ == "__main__":
    main()

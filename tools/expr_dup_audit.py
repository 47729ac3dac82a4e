"""r14 expression-duplication audit: find the two defect classes this
round caught by hand, across EVERY declared query's optimized plan.

1. A Filter whose condition contains higher-order-function work —
   usually a predicate on a computed column that Catalyst pushed below
   the defining Project, substituting the whole expensive expression
   into the condition (it then evaluates again in the Project).
2. A Project whose output re-states the same HOF battery more than
   once — CodegenFallback expressions get no codegen subexpression
   elimination, so each copy evaluates per row.

Heuristics, so the output is a TRIAGE LIST, not a verdict: a Filter
legitimately built from HOFs (e.g. exists()) or a Project with two
genuinely different aggregates will show up; read the plan before
changing anything.

Usage: python tools/expr_dup_audit.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOF_MARKERS = ("aggregate(", "zip_with(", "arrays_zip(", "array_intersect(")
# transform(/filter( appear in cheap one-liners too; only count them
# when the node text is long enough to matter
LONG_HOF_MARKERS = ("transform(", "filter(", "regexp_replace(", "split(")
MIN_NODE_LEN = 400


def audit_plan(name: str, plan: str) -> list[str]:
    findings = []
    # walk the formatted plan's detail sections: "(n) NodeName" blocks
    blocks = re.split(r"\n\(\d+\) ", plan)
    for blk in blocks:
        head = blk.split("\n", 1)[0]
        body = blk
        if head.startswith("Filter"):
            cond = body
            hits = [m for m in HOF_MARKERS if m in cond]
            if not hits and len(cond) > MIN_NODE_LEN:
                hits = [m for m in LONG_HOF_MARKERS if cond.count(m) >= 2]
            if hits and len(cond) > MIN_NODE_LEN:
                findings.append(
                    f"filter-hof: Filter condition carries {sorted(set(hits))} "
                    f"({len(cond)} chars) — likely a pushed computed predicate"
                )
        if head.startswith("Project") or head.startswith("HashAggregate") or head.startswith("ObjectHashAggregate"):
            for m in HOF_MARKERS:
                n = body.count(m)
                if n >= 2 and len(body) > MIN_NODE_LEN:
                    # identical duplicated battery? compare the first two
                    # occurrence contexts (120 chars each)
                    idx = [i.start() for i in re.finditer(re.escape(m), body)]
                    ctx = {body[i : i + 120] for i in idx}
                    if len(ctx) < n:
                        findings.append(
                            f"dup-battery: {head.split()[0]} states {m} x{n} "
                            f"with {len(ctx)} distinct contexts"
                        )
    return findings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from prohap_spark.queries import queries
    from prohap_spark.session import get_spark

    spark = get_spark("expr-dup-audit")
    qs = queries()
    names = args.names or sorted(qs)
    n_flagged = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            phys = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        findings = audit_plan(name, phys)
        if findings:
            n_flagged += 1
            print(f"FLAG {name}:")
            for f in findings:
                print(f"     - {f}")
    print(f"\n{n_flagged} flagged of {len(names)}")
    spark.stop()


if __name__ == "__main__":
    main()

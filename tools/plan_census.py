"""r14: plan-shape census over EVERY declared query (guide §1) — one
JSON file mapping query name -> plan_report node counts (exchanges,
join strategies, python stages, pushed filters present) at the given
SF. Driver-side only (no execution). Commit the output so plan claims
are auditable without running Spark."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r14/declared_plan_census.json"
    from prohap_spark.plans import plan_report
    from prohap_spark.queries import queries
    from prohap_spark.session import get_spark

    spark = get_spark("plan-census")
    census = {}
    for name, fn in sorted(queries().items()):
        try:
            rep = plan_report(fn(spark, sf_dir), name)
            census[name] = {
                "exchanges": rep["exchanges"],
                "broadcast_joins": rep["broadcast_joins"],
                "sortmerge_joins": rep["sortmerge_joins"],
                "shuffledhash_joins": rep["shuffledhash_joins"],
                "bnl_joins": rep["bnl_joins"],
                "python_stages": rep["python_stages"],
                "codegen_stages": rep["codegen_stages"],
                "n_pushed_filter_scans": sum(
                    1 for p in rep["pushed_filters"] if p
                ),
            }
        except Exception as e:  # noqa: BLE001
            census[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
    with open(out_path, "w") as f:
        json.dump(census, f, indent=1, sort_keys=True)
    n_err = sum(1 for v in census.values() if "error" in v)
    print(f"census: {len(census)} queries, {n_err} errors -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Measured scaling probe for the kernel-heavy domain pipelines.

Runs the ProHap and ProVar e2e pipelines over synthetic cohorts at
increasing scale (scale s = 100·s transcripts, 1000·s variant rows,
50 samples) and prints wall time + output rows per scale — evidence
for (not a guess about) how the plan behaves as data grows. Near-
linear growth means no super-linear shuffle/kernel hotspot; the
per-row cost should FALL as fixed overheads amortize.

Usage: python tools/scale_probe.py [scales...]   (default 1 4 10)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

scales = [int(a) for a in sys.argv[1:]] or [1, 4, 10]


def main() -> None:
    from prohap_spark.pipeline.synthetic import run_prohap_e2e, run_provar_e2e
    from prohap_spark.session import get_spark

    spark = get_spark("scale-probe")
    # warmup: JVM/codegen/Arrow spin-up on the smallest scale
    run_prohap_e2e(spark, scale=1).count()
    run_provar_e2e(spark, scale=1).count()

    out = {}
    for s in scales:
        t0 = time.monotonic()
        n_h = run_prohap_e2e(spark, scale=s).count()
        t1 = time.monotonic()
        n_v = run_provar_e2e(spark, scale=s).count()
        t2 = time.monotonic()
        out[s] = {
            "prohap_sec": round(t1 - t0, 3),
            "prohap_rows": n_h,
            "provar_sec": round(t2 - t1, 3),
            "provar_rows": n_v,
        }
        print(f"scale {s:3d}: prohap {t1-t0:6.2f}s ({n_h} rows)   "
              f"provar {t2-t1:6.2f}s ({n_v} rows)", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

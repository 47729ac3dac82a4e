"""r14 session-5 probe: is the residual in-bench vs isolated gap on
late-board queries (graph_triangle_count ~+0.4-0.7 s) an addressable
engine defect, or inherent single-JVM state?

Three measurements in one session (all on the bench's own builders, so
the shapes are exactly the bench's):

1. GC fraction (guide §5): JMX GarbageCollectorMXBeans sampled around
   one full board pass — is the late-pass penalty garbage collection?
2. JIT/code-cache occupancy (the session-2 codegen-class-cache finding
   one level down): CodeHeap / Metaspace pool usage + total JIT compile
   time after each of three board passes — is the JVM's COMPILED-code
   cache (default 240 MB, -XX:ReservedCodeCacheSize) thrashing the way
   Spark's 100-entry codegen SOURCE cache did before r14 sized it?
3. Context sensitivity: a subject query timed (min of 3 consecutive
   runs, fresh frame each) in a fresh session, again after the 14
   queries that precede it on the board, and again after the FULL
   board — does board context degrade a warm query's settled floor?

Usage: python tools/jvm_state_probe.py [subject_query]

r14 session-5 findings on the shared 32-core box (committed record:
plans/r14/jvm_state_probe_s5.txt; rerun this tool to reproduce):
  1. GC = 0.22-0.28 s per 35-49 s board pass (<1%, G1 young only,
     ZERO old-gen collections) — GC is NOT the mechanism.
  2. Code heaps never approach capacity (74/116 MB profiled nmethods
     after 3 passes) — no code-cache flushing; but total JIT compile
     time keeps growing (an ad-hoc fresh-session run measured 17.5 s
     -> 194.5 s after one board pass; the committed record adds
     10-34 s MORE compile time on every subsequent pass): the board's
     hundreds of generated classes keep the tiered compiler
     deoptimizing/re-promoting through every pass, forever.
  3. Subject-query timing: the settled consecutive-run floor is the
     SAME fresh, after 14 predecessors, and after the full board
     (1.25/1.07/1.13 min-of-3 in the committed record) — but the
     FIRST run after new-class-loading context reliably spikes
     (2.56/1.41/1.92 in the same record; an earlier ad-hoc run saw
     the post-board min itself stuck at 1.585 when the box was busy).
Why the bench shows it as a steady +0.4-0.7 s on late-board entries:
in the bench, consecutive runs of one query are separated by a FULL
board pass, so every bench sample IS a first-run-after-context sample
— min-of-3 cannot dodge a spike that every pass re-triggers.
Mechanism consistent with all three probes: deoptimization/recompile
churn. Pass 1 of any context is class-loading-driven (each batch of
newly loaded generated classes invalidates speculative inlining (CHA)
in compiled shared-runtime methods); in later passes the codegen
SOURCE cache (4096 entries since session 2) means no new classes load
at all, yet compile time still grows +10-34 s per pass — that
steady-state churn is profile cycling: alternating the board's ~29
query shapes keeps flipping the type profiles of hot SHARED runtime
methods (sorter/reader/shuffle loops), re-triggering deopt →
re-profile → re-JIT, charged to whichever query runs next. Not
config-addressable (the code cache is not full, GC is nil), and NOT a
Spark-level defect: at production scale each executor JVM runs far
fewer distinct query shapes per process lifetime. The bench's fixed
order + warm pass + min-of-3 protocol makes the effect identical
across rounds, so round-over-round comparison is unaffected.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def main() -> None:
    subject = sys.argv[1] if len(sys.argv) > 1 else "graph_triangle_count"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from opt_profile import build_builders

    from prohap_spark.session import get_spark

    spark = get_spark("jvm-state-probe")
    builders = build_builders(spark, sf_dir)
    mf = spark._jvm.java.lang.management.ManagementFactory

    def run(name: str) -> float:
        df = builders[name]()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def gc_ms() -> int:
        beans = mf.getGarbageCollectorMXBeans()
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )

    def pools() -> dict:
        out = {}
        beans = mf.getMemoryPoolMXBeans()
        for i in range(beans.size()):
            b = beans.get(i)
            n = b.getName()
            if "CodeHeap" in n or "Metaspace" in n or "Class" in n:
                u = b.getUsage()
                # getMax() is -1 for pools with an undefined max (e.g.
                # Metaspace without MaxMetaspaceSize) — report None
                # instead of a misleading negative capacity (r14 ADVICE)
                m = u.getMax()
                cap = None if m < 0 else round(m / 2**20, 1)
                out[n] = (round(u.getUsed() / 2**20, 1), cap)
        out["jit_total_compile_ms"] = mf.getCompilationMXBean().getTotalCompilationTime()
        return out

    order = list(builders)
    assert subject in builders, f"unknown query {subject}"

    # --- 3. context sensitivity (run FIRST so the session is fresh) ---
    run(subject)  # the subject's own warm pass
    fresh = [run(subject) for _ in range(3)]
    print(f"{subject} fresh-session min={min(fresh):.3f} all={[round(x,3) for x in fresh]}")

    pre = order[: order.index(subject)]
    for n in pre:
        run(n)
    after_pre = [run(subject) for _ in range(3)]
    print(
        f"{subject} after {len(pre)} predecessors min={min(after_pre):.3f} "
        f"all={[round(x,3) for x in after_pre]}"
    )

    for n in order[order.index(subject) + 1 :]:
        run(n)
    after_full = [run(subject) for _ in range(3)]
    print(
        f"{subject} after full board min={min(after_full):.3f} "
        f"all={[round(x,3) for x in after_full]}"
    )

    # --- 1 + 2. GC fraction and JIT occupancy over three board passes ---
    print("pools after context phase:", pools())
    for p in range(3):
        spark.catalog.clearCache()
        gc.collect()
        time.sleep(1.0)
        g0, t0 = gc_ms(), time.time()
        for n in order:
            run(n)
        wall, gcs = time.time() - t0, (gc_ms() - g0) / 1000.0
        print(
            f"pass {p + 1}: wall {wall:.2f}s gc {gcs:.2f}s ({100 * gcs / wall:.1f}%) "
            f"pools {pools()}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

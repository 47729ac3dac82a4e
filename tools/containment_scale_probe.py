"""Measured scaling probe for the substring-containment theta join
(J9) — the last join family whose scale arguments were analytic-only
(r7 verdict #5). Answers two questions with wall-clock numbers:

1. How does the BroadcastNestedLoopJoin grow along each axis?
   Per-row work is |left| x |probes| substring scans, so wall should
   be ~linear in the corpus with probes fixed, ~linear in the probe
   set with the corpus fixed, and ~quadratic when both grow — the
   cross term is the documented reason containment_join enforces
   max_probe_rows instead of trusting "small by contract".

2. What happens past the bound? The operator FAILS LOUD (ValueError
   naming the overflow) — this probe exercises that surface too. The
   alternative Catalyst has for a non-equi join with no broadcastable
   side is CartesianProduct: |left| x |probes| ROWS through the
   shuffle before the filter, which is not a slower plan but a
   different complexity class; past the bound the right move is an
   equi-join reformulation (n-gram blocking / fingerprint index), not
   a bigger broadcast.

Replication model: each replica's text gets a distinct 'R{r}|' prefix
and probes are cut from the prefixed text, so a probe can only match
its own replica's documents — matched volume grows linearly with
either axis (replicating verbatim would multiply matches
quadratically: a different workload, not a scale-up).

Usage: python tools/containment_scale_probe.py [scales...]
       (default 1 4 8; runs corpus-axis, probe-axis, and both-axes
        legs per scale, prints wall seconds + output rows)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

scales = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.containment import containment_join
    from prohap_spark.queries.registry import table
    from prohap_spark.session import get_spark

    spark = get_spark("containment-scale-probe")
    base = table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()

    def replicated(r_count: int):
        """r_count replicas, ids offset, text prefixed per replica."""
        reps = [
            base.select(
                (F.col("doc_id") + F.lit(r * n_base)).alias("doc_id"),
                F.concat(F.lit(f"R{r}|"), F.col("text")).alias("text"),
            )
            for r in range(r_count)
        ]
        out = reps[0]
        for df in reps[1:]:
            out = out.unionAll(df)
        return out

    def probes_of(docs):
        # prefix-anchored 28-char probe: carries the replica marker, so
        # cross-replica containment is impossible by construction
        return docs.where(
            (F.col("doc_id") % 10 == 0) & (F.length("text") >= 40)
        ).select(
            F.col("doc_id").alias("probe_id"),
            F.substring("text", 1, 28).alias("probe"),
        )

    def leg(name: str, corpus_r: int, probe_r: int):
        docs = replicated(corpus_r)
        pr = probes_of(replicated(probe_r))
        t0 = time.time()
        out = containment_join(
            docs, pr, "text", "probe",
            extra_cond=F.col("doc_id") != F.col("probe_id"),
            # bound enforcement is measured separately below; the count
            # would pollute the join timing here
            enforce_bound=False,
        ).groupBy("probe_id").agg(F.count(F.lit(1)).alias("n_hosts"))
        rows = out.count()
        wall = round(time.time() - t0, 2)
        print(json.dumps({
            "leg": name, "corpus_x": corpus_r, "probes_x": probe_r,
            "wall_sec": wall, "out_rows": rows,
        }))

    # warmup (absorbs codegen/JIT so the 1x rows carry signal)
    leg("warmup", 1, 1)
    for s in scales:
        leg("corpus_axis", s, 1)
        leg("probe_axis", 1, s)
        leg("both_axes", max(1, s // 2), max(1, s // 2))

    # the enforced bound fails loud, naming the overflow
    try:
        containment_join(
            base, probes_of(base), "text", "probe", max_probe_rows=3
        )
        print(json.dumps({"leg": "bound", "ok": False,
                          "err": "MISSING — bound did not trip"}))
    except ValueError as e:
        print(json.dumps({"leg": "bound", "ok": True, "err": str(e)[:90]}))
    spark.stop()


if __name__ == "__main__":
    main()

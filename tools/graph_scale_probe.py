"""Measured scaling probe for the graph kernels (r6 verdict #6: the
triangle/PageRank/CC trio was the only operator family with no probe
table).

Generates a deterministic POWER-LAW digraph — sources drawn
log-uniformly over the node ids (degree ~ 1/rank, one mega-hub at the
low ids), destinations uniform — at increasing edge counts, and times:

- triangle_count: the r7 degree-ordered rewrite. The probe also
  computes the wedge volume BOTH ways (sum of C(out_deg, 2) under
  degree orientation vs id orientation) so the table shows the
  actual blow-up the orientation avoids, not just wall clock.
- pagerank_micro (6 rounds) and connected_components: per-round
  shuffle-join kernels whose wall should grow ~linearly in edges.

Usage: python tools/graph_scale_probe.py [replicas...]  (default 1 8 32)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

BASE_EDGES = 30_000
N_NODES = 20_000
replicas = [int(a) for a in sys.argv[1:]] or [1, 8, 32]


def powerlaw_edges(spark, r: int):
    """m = BASE_EDGES * r hash-deterministic edges: src log-uniform
    (P(node <= x) ~ ln x — a Zipf-1 degree profile with a hub whose
    degree grows linearly in m), dst uniform, self-loops dropped."""
    m = BASE_EDGES * r
    e = spark.range(m).select(
        F.col("id"),
        (F.abs(F.xxhash64(F.col("id"), F.lit("src"))) % 1_000_000).alias("us"),
        (F.abs(F.xxhash64(F.col("id"), F.lit("dst"))) % N_NODES).alias("dst"),
    )
    # log-uniform: node = floor(exp(u * ln N)) in [1, N)
    src = F.floor(
        F.exp(F.col("us") / F.lit(1_000_000.0) * F.lit(float(__import__("math").log(N_NODES))))
    ).cast("long")
    return (
        e.select(src.alias("src"), F.col("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def wedge_volume(arcs) -> int:
    """sum over tails of C(out_deg, 2) — the row count the wedge join
    materializes before closure filtering."""
    row = (
        arcs.groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.expr("d * (d - 1) div 2")).alias("w"))
        .collect()[0]
    )
    return int(row["w"] or 0)


def main() -> None:
    from prohap_spark.operators.graph import (
        connected_components,
        oriented_arcs,
        pagerank_micro,
        triangle_count,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("graph-scale-probe")
    # warmup
    triangle_count(powerlaw_edges(spark, 1)).count()

    out = {}
    for r in replicas:
        edges = powerlaw_edges(spark, r).localCheckpoint()
        row = {"edges": edges.count()}

        # wedge volumes: degree orientation vs the id orientation the
        # r6 implementation used (C(out_deg,2) with u<v arcs)
        row["wedges_degree"] = wedge_volume(oriented_arcs(edges))
        und = (
            edges.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        row["wedges_id"] = wedge_volume(und)

        t0 = time.monotonic()
        tri = triangle_count(edges)
        row["tri_vertices"] = tri.count()
        row["tri_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["pagerank_rows"] = pagerank_micro(edges, n_iter=6).count()
        row["pagerank_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["cc_rows"] = connected_components(edges).count()
        row["cc_sec"] = round(time.monotonic() - t0, 3)

        out[r] = row
        print(
            f"x{r:2d}: edges {row['edges']:8d}  "
            f"wedges deg/id {row['wedges_degree']}/{row['wedges_id']} "
            f"(x{row['wedges_id'] / max(1, row['wedges_degree']):.1f} saved)  "
            f"tri {row['tri_sec']:6.2f}s  "
            f"pagerank {row['pagerank_sec']:6.2f}s  cc {row['cc_sec']:6.2f}s",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

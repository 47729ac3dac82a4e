"""Measure the persisted-LSH-index probe economics (r14): does the
bucket-partitioned postings layout actually prune the disk read, and
what does the probe cost vs re-bucketing the corpus per query?

Method: index the sf0.1 embeddings corpus (write_lsh_index, 12 tables
x 4 planes — the registered gate's parameters), then

- count the postings partitions on disk vs the partitions a 10-query
  probe's driver-side bucket list selects (the pruning ratio);
- wall-time A: direct lsh_ann_topk (re-buckets the corpus);
- wall-time B: lsh_ann_topk_from_index (reads only probed buckets);
- assert A == B values (the materialization contract, also pinned in
  pytest + the shared-oracle driver gate).

Prints ONE JSON line. Honest expectations: at sf0.1 (~2k vectors) the
corpus re-bucketing is cheap, so wall times mostly measure fixed
Spark overhead — the PRUNING RATIO is the scale claim (buckets read
scales with n_queries x n_tables, not with corpus size), the walls
just confirm the probe path isn't pathological at small scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.similarity import (
        lsh_ann_topk,
        lsh_ann_topk_from_index,
        write_lsh_index,
    )
    from prohap_spark.queries.registry import table
    from prohap_spark.session import get_spark

    spark = get_spark()
    e = table(spark, SF_DIR, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    c = e.where(F.col("vec_id") >= 10)

    tmp = tempfile.mkdtemp(prefix="lsh_probe_")
    path = os.path.join(tmp, "lsh")
    try:
        t0 = time.time()
        write_lsh_index(
            c, "vec_id", "embedding", path,
            n_planes=4, n_tables=12, quantize_micro=True,
        )
        t_index = time.time() - t0

        n_parts = sum(
            1 for d in os.listdir(os.path.join(path, "postings"))
            if d.startswith("bucket=")
        )
        # the probe's driver-side bucket list (what the isin filter
        # prunes the read to)
        from prohap_spark.operators.similarity import hyperplane_bucket_expr

        buckets = F.array(
            *[
                F.concat(
                    F.lit(f"{t}:"),
                    hyperplane_bucket_expr(
                        "embedding", 4, seed=f"hp{t}", quantize_micro=True
                    ),
                )
                for t in range(12)
            ]
        )
        probe_buckets = {
            r["b"]
            for r in q.select(F.explode(buckets).alias("b")).distinct().collect()
        }

        t0 = time.time()
        direct = sorted(
            tuple(r)
            for r in lsh_ann_topk(
                q, c, "vec_id", "vec_id", "embedding",
                k=5, n_planes=4, n_tables=12,
                score_decimals=6, quantize_micro=True,
            ).collect()
        )
        t_direct = time.time() - t0

        t0 = time.time()
        via_index = sorted(
            tuple(r)
            for r in lsh_ann_topk_from_index(
                q, path, "vec_id", k=5, score_decimals=6
            ).collect()
        )
        t_probe = time.time() - t0

        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "corpus_vectors": c.count(),
                    "postings_partitions_on_disk": n_parts,
                    "partitions_probed": len(probe_buckets),
                    "prune_ratio": round(len(probe_buckets) / max(n_parts, 1), 4),
                    "index_build_s": round(t_index, 2),
                    "direct_wall_s": round(t_direct, 2),
                    "probe_wall_s": round(t_probe, 2),
                    "values_match": direct == via_index,
                    "n_result_rows": len(direct),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

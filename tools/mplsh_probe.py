"""Multi-probe LSH recall/cost probe: measures, at sf0.1, what each
additional probe actually buys (recall vs the brute-force top-5) and
costs (candidate pairs scored) — the numbers behind the mp leg's
100 TB story, re-measurable every round.

Multi-probe's pitch (Lv et al. 2007): probing the lowest-|margin| bit
flips of the QUERY bucket buys the recall of extra tables without
growing the corpus index. The probe quantifies that trade on the real
embeddings table: for n_probes in 0..3, recall@5 against brute force
and the candidate count (= dot products paid). Interpretation for a
cluster: candidates are the shuffle+score volume; the corpus index
stays one bucket/table/vector regardless of n_probes, so recall is
bought with query-side fan-out only — the cheap side at 100 TB, where
queries are millions and the corpus is billions.

Usage: python tools/mplsh_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.similarity import (
        cosine_topk,
        hyperplane_bucket_expr,
        hyperplane_probe_buckets,
        lsh_ann_topk,
    )
    from prohap_spark.queries.registry import table
    from prohap_spark.session import get_spark

    spark = get_spark("mplsh-probe")
    e = table(spark, SF_DIR, "embeddings")
    q = e.where(F.col("vec_id") < 100)
    c = e.where(F.col("vec_id") >= 100)
    n_planes, n_tables, k = 4, 12, 5

    truth = {
        (r["vec_id"], r["vec_id_c"])
        for r in cosine_topk(
            q, c.withColumnRenamed("vec_id", "vec_id_c"),
            "vec_id", "vec_id_c", "embedding", k=k, score_decimals=6,
        ).collect()
    }

    for n_probes in (0, 1, 2, 3):
        # candidate volume: distinct (q, c) pairs sharing >=1 bucket
        buckets = F.array(*[
            F.concat(F.lit(f"{t}:"), hyperplane_bucket_expr(
                "embedding", n_planes, seed=f"hp{t}", quantize_micro=True))
            for t in range(n_tables)
        ])
        if n_probes > 0:
            # NB: closure-bind the prefix — a two-parameter transform
            # lambda means (element, index) to pyspark (the
            # similarity.py:350 pitfall)
            def _prefixed(t: int):
                prefix = F.lit(f"{t}:")
                return F.transform(
                    hyperplane_probe_buckets(
                        "embedding", n_planes, seed=f"hp{t}",
                        n_probes=n_probes, quantize_micro=True),
                    lambda b: F.concat(prefix, b),
                )

            qb = F.flatten(F.array(*[_prefixed(t) for t in range(n_tables)]))
        else:
            qb = buckets
        qx = q.select(F.col("vec_id").alias("qid"), F.explode(qb).alias("b"))
        cx = c.select(F.col("vec_id").alias("cid"), F.explode(buckets).alias("b"))
        n_cand = cx.join(F.broadcast(qx), "b").select("qid", "cid").distinct().count()

        t0 = time.monotonic()
        got = {
            (r["qid"], r["cid"])
            for r in lsh_ann_topk(
                q, c, "vec_id", "vec_id", "embedding", k=k,
                n_planes=n_planes, n_tables=n_tables,
                score_decimals=6, quantize_micro=True, n_probes=n_probes,
            ).toDF("qid", "cid", "cosine", "rank").collect()
        }
        wall = time.monotonic() - t0
        print(json.dumps({
            "n_probes": n_probes,
            "recall_at_5": round(len(got & truth) / len(truth), 4),
            "candidates": n_cand,
            "topk_wall_s": round(wall, 2),
        }))

    spark.stop()


if __name__ == "__main__":
    main()

"""Segmented-IVF ingest economics probe (r14): the pytest pin proves
append_ivf_segment is CORRECT (probe-through-segments == from-scratch
at the frozen quantizer); this probe measures that it is CHEAP — the
trgm_append_probe protocol applied to the ANN index. Fixed ~500-vector
delta against a base inflated ×1/×4/×16 (sf0.1 embeddings duplicated
under distinct ids):

- rebuild (write_ivf_index over base ∪ delta) must grow with base:
  the corpus-sized assignment pass plus a full cells rewrite;
- segment append must stay FLAT: the delta is assigned against the
  frozen quantizer and written alone — O(|delta|) CPU and I/O.

Usage: python tools/ivf_segment_probe.py
Prints one JSON line; numbers land in NOTES_ROUND14.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main():
    from pyspark.sql import functions as F

    from prohap_spark.operators.similarity import (
        append_ivf_segment,
        train_centroids_kmeans,
        write_ivf_index,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("ivf_segment_probe")
    base_dir = f"/tmp/prohap_ivfseg_{os.getpid()}"
    e0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = train_centroids_kmeans(
        e0, "vec_id", "embedding", k=12, n_iter=4
    )
    results = {}
    try:
        for mult in (1, 16, 64):
            corpus = e0
            for i in range(1, mult):
                corpus = corpus.unionByName(
                    e0.select(
                        (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                        "embedding",
                    )
                )
            corpus = corpus.localCheckpoint(eager=True)
            n_base = corpus.count()
            delta = e0.select(
                (F.col("vec_id") + F.lit(990_000_000)).alias("vec_id"),
                "embedding",
            ).limit(500).localCheckpoint(eager=True)

            path = f"{base_dir}/ivf_x{mult}"
            t0 = time.monotonic()
            write_ivf_index(corpus, cents, "vec_id", "embedding", path)
            build_wall = time.monotonic() - t0

            t0 = time.monotonic()
            append_ivf_segment(spark, path, delta)
            segment_wall = time.monotonic() - t0

            t0 = time.monotonic()
            write_ivf_index(
                corpus.unionByName(delta),
                cents,
                "vec_id",
                "embedding",
                f"{base_dir}/ivf_rebuild_x{mult}",
            )
            rebuild_wall = time.monotonic() - t0

            results[f"x{mult}"] = {
                "n_base_vectors": n_base,
                "build_s": round(build_wall, 2),
                "append_segment_500_s": round(segment_wall, 2),
                "rebuild_s": round(rebuild_wall, 2),
            }
        print(json.dumps({"sf_dir": SF_DIR, "delta_vectors": 500, **results}))
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

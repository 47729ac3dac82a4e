"""Incremental trigram-index economics probe (r13): the delta_ingest
gate proves append_trigram_index is CORRECT (merged index reproduces
brute contains() over the full corpus); this probe measures that it is
CHEAP — append wall vs full-rebuild wall as the BASE grows with the
delta fixed, on a corpus inflated by duplicating documents with
distinct ids.

Expected shape: rebuild wall grows with base size; append wall tracks
the (fixed) delta + the union/dedup of posting rows — the
exact_key_index / column_stats_partials economics applied to the text
index.

Usage: python tools/trgm_append_probe.py
Prints one JSON line; numbers land in NOTES_ROUND13.md.
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

    from prohap_spark.operators.trgm import (
        append_trigram_index,
        build_trigram_index,
        write_trigram_index,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("trgm_append_probe")
    base_dir = f"/tmp/prohap_trgmappend_{os.getpid()}"
    d0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    results = {}
    try:
        for mult in (1, 4, 16):
            corpus = d0
            for i in range(1, mult):
                corpus = corpus.unionByName(
                    d0.select(
                        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                        "text",
                    )
                )
            corpus = corpus.localCheckpoint(eager=True)
            n_base = corpus.count()
            delta = d0.select(
                (F.col("doc_id") + F.lit(990_000_000)).alias("doc_id"), "text"
            ).limit(500).localCheckpoint(eager=True)

            path = f"{base_dir}/idx_x{mult}"
            t0 = time.monotonic()
            write_trigram_index(
                build_trigram_index(corpus, "doc_id", "text"), path
            )
            build_wall = time.monotonic() - t0

            t0 = time.monotonic()
            append_trigram_index(spark, path, delta, "doc_id", "text")
            append_wall = time.monotonic() - t0

            t0 = time.monotonic()
            write_trigram_index(
                build_trigram_index(
                    corpus.unionByName(delta), "doc_id", "text"
                ),
                f"{base_dir}/idx_rebuild_x{mult}",
            )
            rebuild_wall = time.monotonic() - t0

            # the segmented path (r13): ingest writes ONLY the delta's
            # postings as a new segment — wall must stay flat in base
            from prohap_spark.operators.trgm import append_trigram_segment

            seg_base = f"{base_dir}/idx_seg_x{mult}"
            write_trigram_index(
                build_trigram_index(corpus, "doc_id", "text"), seg_base
            )
            t0 = time.monotonic()
            append_trigram_segment(spark, seg_base, delta, "doc_id", "text")
            segment_wall = time.monotonic() - t0

            results[f"x{mult}"] = {
                "n_base_docs": n_base,
                "build_s": round(build_wall, 2),
                "append_flat_500_s": round(append_wall, 2),
                "append_segment_500_s": round(segment_wall, 2),
                "rebuild_s": round(rebuild_wall, 2),
            }
        print(json.dumps({"sf_dir": SF_DIR, "delta_docs": 500, **results}))
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

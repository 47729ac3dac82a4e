"""Bloom file-skipping probe (r13): measured prune rates at sf0.1.

Lays lineitem out as ~64 files hash-scattered on l_orderkey (the
WORST case for min/max skipping — every file spans the whole key
domain), builds the per-file Bloom words, and measures:

- zone-map prune rate for point lookups (expected: keeps everything);
- Bloom prune rate for 20 present keys (survivors contain the true
  file(s); extra survivors are fp);
- Bloom prune rate for 20 absent keys (survivors are pure fp);
- artifact size (rows = files x words) vs corpus size.

Usage: python tools/bloomskip_scale_probe.py [sf_dir]
Prints one JSON line; numbers land in NOTES_ROUND13.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    from pyspark.sql import functions as F

    from prohap_spark.operators.zonemap import (
        build_bloom_skip,
        build_zone_map,
        prune_files,
        prune_files_bloom,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("bloomskip_probe")
    base = f"/tmp/prohap_bsprobe_{os.getpid()}"
    path = f"{base}/li"
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        # hash-scatter: neighboring keys in different files
        li.withColumn("h", F.xxhash64("l_orderkey")).repartitionByRange(
            64, "h"
        ).drop("h").write.mode("overwrite").parquet(path)

        zm = build_zone_map(spark, path, ["l_orderkey"]).cache()
        n_files = zm.count()
        keys_per_file = (
            li.select("l_orderkey").distinct().count() + n_files - 1
        ) // n_files

        keys = [
            r["l_orderkey"]
            for r in li.select("l_orderkey").distinct().limit(2000).collect()
        ]
        rng = random.Random(7)
        present = rng.sample(keys, 20)
        mx = max(keys)
        absent = [mx + 1 + i * 7919 for i in range(20)]
        zm_kept = [len(prune_files(zm, "l_orderkey", k, k)) for k in present[:5]]

        # the sizing rule is operators/bloom_join.py::bloom_plan applied
        # PER FILE: m from keys-per-file and the fp target, not folklore
        from prohap_spark.operators.bloom_join import bloom_plan

        plan = bloom_plan(keys_per_file, fp_target=1e-3)
        sweep = {}
        for m_bits in (4096, 65536, int(plan["m_bits"])):
            bm = build_bloom_skip(
                spark, path, "l_orderkey", k=3, m_bits=m_bits
            ).cache()
            n_words = bm.count()
            p_kept = [len(prune_files_bloom(bm, k, k=3, m_bits=m_bits)) for k in present]
            a_kept = [len(prune_files_bloom(bm, k, k=3, m_bits=m_bits)) for k in absent]
            sweep[str(m_bits)] = {
                "bytes_per_file": (n_words // max(n_files, 1)) * 8,
                "present_kept_avg": sum(p_kept) / len(p_kept),
                "absent_kept_avg": sum(a_kept) / len(a_kept),
                "absent_kept_max": max(a_kept),
            }
            bm.unpersist()

        print(json.dumps({
            "sf_dir": SF_DIR,
            "n_files": n_files,
            "keys_per_file": keys_per_file,
            "bloom_plan": plan,
            "zonemap_point_lookup_kept": zm_kept,
            "m_sweep": sweep,
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

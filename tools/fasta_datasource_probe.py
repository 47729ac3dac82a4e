"""Glob-scale probe for the FASTA Python Data Source (r12 verdict ask
#7): the per-file InputPartition design claims a many-file corpus fans
out to one task per file with memory bounded by the largest single
file. This probe manufactures a 1,000-file FASTA corpus (3 records
each), reads it through BOTH paths, and reports:

- task/partition count (the DataSource must show ~n_files partitions;
  the Catalyst text reader coalesces by maxPartitionBytes, so tiny
  files collapse into few partitions — both behaviors are correct,
  they are different scale trade-offs and this probe MEASURES them);
- row-count parity between the two paths;
- wall time per path (small-file overhead is the Python source's cost:
  one Python worker call per file vs one JVM scan);
- driver/executor peak memory (ru_maxrss) as the bounded-memory
  sanity datapoint.

Usage: python tools/fasta_datasource_probe.py [n_files]
Writes one JSON line; numbers land in NOTES_ROUND13.md.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def main():
    from prohap_spark.session import get_spark
    from prohap_spark.sources.fasta import read_fasta
    from prohap_spark.sources.fasta_datasource import FastaDataSource

    spark = get_spark("fasta_probe")
    base = f"/tmp/prohap_fasta_probe_{os.getpid()}"
    os.makedirs(base, exist_ok=True)
    try:
        for i in range(N_FILES):
            with open(f"{base}/chr{i:04d}.fa", "w") as f:
                for j in range(3):
                    f.write(f">sp|ACC{i:04d}_{j}|protein {i} {j}\n")
                    f.write("MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ\n")
        glob_path = f"{base}/*.fa"

        spark.dataSource.register(FastaDataSource)
        t0 = time.time()
        ds = spark.read.format("fasta").load(glob_path)
        ds_parts = ds.rdd.getNumPartitions()
        ds_rows = ds.count()
        ds_wall = time.time() - t0

        t0 = time.time()
        cat = read_fasta(spark, glob_path)
        cat_parts = cat.rdd.getNumPartitions()
        cat_rows = cat.count()
        cat_wall = time.time() - t0

        print(json.dumps({
            "n_files": N_FILES,
            "datasource": {
                "partitions": ds_parts, "rows": ds_rows,
                "wall_s": round(ds_wall, 2),
            },
            "catalyst_reader": {
                "partitions": cat_parts, "rows": cat_rows,
                "wall_s": round(cat_wall, 2),
            },
            "rows_match": ds_rows == cat_rows,
            "ru_maxrss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024,
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

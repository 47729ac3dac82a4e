"""Deletion-vector economics probe (r14): the sink_deleted /
sink_materialized gate legs prove delete_keys + read_current +
materialize_deletes are CORRECT (vector-subtract == physical-rewrite
== the batch filter); this probe measures the trade they exist to buy:

- delete_keys wall must be O(k) in the KEY COUNT and flat in the
  table size (it writes one small parquet + marker, touches no epoch);
- read_current pays the anti-join read tax, growing with table size
  but staying a small multiple of the raw committed read;
- materialize_deletes is the full-rewrite cost the vector DEFERS —
  linear in table size, which is exactly why it belongs in a
  maintenance window and not on the delete path.

At 100 TB the first number is the one that matters: a GDPR-style
delete of 10^4 keys costs the same whether the table holds 10^6 or
10^12 rows.

Usage: python tools/delete_vector_probe.py
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

    from prohap_spark.session import get_spark
    from prohap_spark.streaming.sink import (
        delete_keys,
        idempotent_batch_writer,
        materialize_deletes,
        read_committed,
        read_current,
    )

    spark = get_spark("delete_vector_probe")
    base_dir = f"/tmp/prohap_delprobe_{os.getpid()}"
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.monotonically_increasing_id().alias("rid"),
        "l_orderkey",
        "l_extendedprice",
    )
    results = {}
    try:
        for mult in (1, 4, 16):
            corpus = li
            for i in range(1, mult):
                corpus = corpus.unionByName(
                    li.select(
                        (F.col("rid") + F.lit(i * 100_000_000_000)).alias("rid"),
                        "l_orderkey",
                        "l_extendedprice",
                    )
                )
            out = f"{base_dir}/sink_x{mult}"
            w = idempotent_batch_writer(out)
            # 8 epochs, hash-split — the shape a micro-batch stream leaves
            for e in range(8):
                w(corpus.where(F.pmod(F.col("rid"), F.lit(8)) == e), e)
            n_rows = read_committed(spark, out).count()

            dels = (
                read_committed(spark, out)
                .select("rid")
                .where(F.pmod(F.col("rid"), F.lit(1000)) == 7)
                .localCheckpoint(eager=True)
            )
            k = dels.count()

            t0 = time.monotonic()
            delete_keys(spark, out, dels)
            delete_wall = time.monotonic() - t0

            t0 = time.monotonic()
            n_cur = read_current(spark, out).count()
            current_wall = time.monotonic() - t0

            t0 = time.monotonic()
            n_raw = read_committed(spark, out).count()
            raw_wall = time.monotonic() - t0

            t0 = time.monotonic()
            materialize_deletes(spark, out)
            materialize_wall = time.monotonic() - t0
            assert read_committed(spark, out).count() == n_cur == n_rows - k

            results[f"x{mult}"] = {
                "n_rows": n_rows,
                "n_delete_keys": k,
                "delete_keys_s": round(delete_wall, 2),
                "read_current_s": round(current_wall, 2),
                "read_raw_s": round(raw_wall, 2),
                "materialize_s": round(materialize_wall, 2),
            }
            assert n_raw == n_rows  # pre-materialize raw keeps history
        print(json.dumps({"sf_dir": SF_DIR, **results}))
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Bloom semi-join reduction probe: measures, at sf0.1, what the
runtime filter actually buys and costs as m scales — the numbers
behind j13's 100 TB story, re-measurable every round.

For each m in the sweep: build the urgent-orders filter, time the
map-side prefilter of lineitem, and report selectivity (rows passing /
rows scanned), the false-positive rate among non-matching rows, and
the filter's physical size (words × 8 bytes). The exact semi-join is
timed once as the baseline. Interpretation for a cluster: the
prefilter's LOCAL cpu cost replaces SHUFFLE volume — rows dropped
map-side never cross the network; at a 20% match rate and ~0% FP the
join's exchange shrinks 5×, which local[32] wall (no network) cannot
show. Prints one JSON line per m.

Usage: python tools/bloom_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.functions.sketches import bloom_build
    from prohap_spark.operators.bloom_join import (
        bloom_pass_expr,
        bloom_words_dense,
    )
    from prohap_spark.queries.registry import table
    from prohap_spark.session import get_spark

    spark = get_spark("bloom-probe")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey")
    dim = table(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    keys = dim.select(F.col("o_orderkey").cast("string").alias("__bk")).distinct()
    n_keys = keys.count()
    n_fact = li.count()
    exact_keys = dim.select(F.col("o_orderkey").alias("__ek")).distinct()

    t0 = time.time()
    n_match = li.join(
        exact_keys, F.col("l_orderkey") == F.col("__ek"), "left_semi"
    ).count()
    t_exact = time.time() - t0

    for log_m in (14, 17, 19):
        m = 1 << log_m
        t0 = time.time()
        words = bloom_words_dense(bloom_build(keys, "__bk", 4, m), m)
        t_build = time.time() - t0
        expr = bloom_pass_expr(F.col("l_orderkey").cast("string"), words, 4, m)
        t0 = time.time()
        n_pass = li.where(expr).count()
        t_probe = time.time() - t0
        fp_rate = (n_pass - n_match) / max(n_fact - n_match, 1)
        print(json.dumps({
            "m_bits": m,
            "bits_per_key": round(m / n_keys, 1),
            "filter_kb": round(len(words) * 8 / 1024, 1),
            "build_sec": round(t_build, 2),
            "probe_sec": round(t_probe, 2),
            "exact_semi_sec": round(t_exact, 2),
            "n_fact": n_fact,
            "n_pass": n_pass,
            "n_match": n_match,
            "selectivity": round(n_pass / n_fact, 4),
            "fp_rate": round(fp_rate, 5),
        }))
    spark.stop()


if __name__ == "__main__":
    main()

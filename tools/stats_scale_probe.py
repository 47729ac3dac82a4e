"""Incremental-stats economics probe: measures, at sf0.1, what the
operators/stats.py artifact buys — the numbers behind the
table_stats_board 100 TB story, re-measurable every round.

Compares (a) one full ANALYZE pass over lineitem with (b) per-shard
partial builds + a merge-only refresh, and reports the artifact's
actual state size. Interpretation for a cluster: at 100 TB the
"full pass" column is the one you can no longer afford — the
incremental column's merge input is K shard artifacts of <=64
register rows + |cols| basic rows EACH, so a stats refresh after one
new shard reads kilobytes, not the corpus.

Usage: python tools/stats_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NUM = ["l_orderkey", "l_quantity", "l_extendedprice"]
STR = ["l_returnflag", "l_linestatus"]


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.stats import (
        column_stats_partials,
        finish_stats,
        merge_stats,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("stats-probe")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(*NUM, *STR)
    n_rows = li.count()

    t0 = time.monotonic()
    fb, fr = column_stats_partials(li, NUM, STR)
    full = finish_stats(fb, fr).collect()
    full_wall = time.monotonic() - t0

    for k in (2, 8):
        shards = [li.where(F.col("l_orderkey") % k == p) for p in range(k)]
        t0 = time.monotonic()
        partials = [column_stats_partials(s, NUM, STR) for s in shards]
        # materialize each shard's state (what per-ingest jobs persist)
        states = [
            ([tuple(r) for r in b.collect()], [tuple(r) for r in r_.collect()])
            for b, r_ in partials
        ]
        build_wall = time.monotonic() - t0

        t0 = time.monotonic()
        mb, mr = merge_stats(*partials)
        merged = finish_stats(mb, mr).collect()
        merge_wall = time.monotonic() - t0

        state_rows = sum(len(b) + len(r_) for b, r_ in states)
        same = sorted(map(tuple, merged)) == sorted(map(tuple, full))
        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "shards": k,
                    "full_pass_wall_s": round(full_wall, 2),
                    "shard_builds_wall_s": round(build_wall, 2),
                    "merge_refresh_wall_s": round(merge_wall, 2),
                    "total_state_rows": state_rows,
                    "merged_equals_full_pass": same,
                }
            )
        )

    spark.stop()


if __name__ == "__main__":
    main()

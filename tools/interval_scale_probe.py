"""Measured scaling probe for the binned interval join (J1) — the
largest carried non-e2e bench entry had analytic scale arguments but
no probe table until r7.

Replicates orders (intervals) and lineitem (points) R× with each
replica's PRICE RANGE shifted into its own disjoint band (+r·10⁸
cents): data grows linearly and replicas cannot cross-match, so the
matched-pair volume and the bin-key cardinality both grow linearly
too — the honest model of "the same workload, R times bigger".
(Replicating verbatim would instead make every replica's orders match
every replica's lineitems — a quadratically DENSER join, which is a
different workload, not a scale-up.)

Two legs per scale:

- ``materialized``: replicas written to parquet and read back, so the
  planner sees HONEST scan stats — the production path (real data
  arrives from files with real sizes).
- ``inflight_hint``: replicas generator-fanned in the same plan with
  ``join_hint='shuffle_hash'``. The first r7 run of this probe ran the
  in-flight leg UNHINTED and caught a planner-stats hazard: Catalyst
  sizes generator output at ~1x its input, so the exploded interval
  side (3 bins x R replicas off a small scan) was statically planned
  as a BROADCAST hash join — 143.6 s at 32x vs 16.0 s on the shuffle
  path, and AQE cannot demote a statically chosen broadcast (no
  shuffle boundary to measure). That finding is now the documented
  reason ``interval_join`` grew its ``join_hint`` parameter.

Prints wall seconds + output rows per scale. Expected shape: both
legs grow sublinearly (fixed overheads amortize) to ~linearly; any
super-linear bend means the bin fan-out or the shuffle stopped
scaling.

Usage: python tools/interval_scale_probe.py [scales...] (default 1 8 32)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

scales = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
SF_DIR = "/root/testdata/sf0.1"
BAND = 100_000_000  # cents: disjoint per-replica price band


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.interval_join import interval_join
    from prohap_spark.queries.registry import table
    from prohap_spark.session import get_spark

    spark = get_spark("interval-scale-probe")

    def replicas(reps: int):
        r = F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(reps - 1).cast("bigint"))
        ).alias("__r")
        o = (
            table(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_totalprice", r)
            .select(
                (F.col("o_orderkey") + F.col("__r") * F.lit(10**10)).alias("o_orderkey"),
                (
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                    + F.col("__r") * F.lit(BAND)
                ).alias("lo"),
            )
            .withColumn("hi", F.col("lo") + 5000)
        )
        li = (
            table(spark, SF_DIR, "lineitem")
            .select("l_extendedprice", r)
            .select(
                (
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    + F.col("__r") * F.lit(BAND)
                ).alias("price_cents"),
            )
        )
        return o, li

    def grouped(o, li, hint=None):
        joined = interval_join(
            li, o,
            point_col="price_cents", start_col="lo", end_col="hi",
            bin_size=2500, strategy="binned", closed="left", join_hint=hint,
        )
        return joined.groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("price_cents").alias("sum_price_cents"),
        )

    grouped(*replicas(1)).write.format("noop").mode("overwrite").save()  # warmup
    out = {}
    tmp = tempfile.mkdtemp(prefix="ij_probe_")
    try:
        for s in scales:
            spark.catalog.clearCache()
            o, li = replicas(s)
            o.write.mode("overwrite").parquet(f"{tmp}/orders_x{s}")
            li.write.mode("overwrite").parquet(f"{tmp}/points_x{s}")
            om = spark.read.parquet(f"{tmp}/orders_x{s}")
            lim = spark.read.parquet(f"{tmp}/points_x{s}")
            t0 = time.monotonic()
            grouped(om, lim).write.format("noop").mode("overwrite").save()
            mat_wall = time.monotonic() - t0
            t0 = time.monotonic()
            grouped(o, li, hint="shuffle_hash").write.format("noop").mode("overwrite").save()
            hint_wall = time.monotonic() - t0
            n = grouped(om, lim).count()
            out[s] = {
                "materialized_wall_sec": round(mat_wall, 3),
                "inflight_hint_wall_sec": round(hint_wall, 3),
                "out_rows": n,
            }
            print(
                f"x{s:3d}: materialized {mat_wall:7.2f}s  "
                f"inflight+hint {hint_wall:7.2f}s  {n} grouped rows",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

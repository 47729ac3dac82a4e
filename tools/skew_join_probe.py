"""Measured probe for JOIN-side key skew — the one brief-named shuffle
hazard (salting / AQE skew-join) that had correctness tests but no
wall-clock table. Three legs over the same skewed workload:

1. ``smj_skew_off``  — sort-merge join with AQE's skew split DISABLED:
   the unmitigated baseline; the hot key's rows land in ONE reducer
   task and the stage runs at straggler speed.
2. ``smj_skew_on``   — AQE skew split enabled. NOTE ON THRESHOLDS:
   AQE only splits a partition over BOTH skewedPartitionFactor x
   median AND skewedPartitionThresholdInBytes (default 256 MB). A
   local probe's hot partition is tens of MB, so the probe lowers the
   byte thresholds proportionally (8 MB / 4 MB advisory) — the same
   geometry a 100 TB run hits at the DEFAULTS; without this, local
   measurements silently test nothing.
3. ``salted``        — operators/skew.py salted_join (replicate the
   small side n_salts times, salt the big side, join on key+salt):
   the explicit fallback for shapes AQE cannot split (e.g. the skewed
   side feeding further same-key windows, or non-SMJ plans).

Broadcast is disabled throughout: with a broadcastable small side
there IS no shuffle skew — broadcasting is always the first
mitigation; this probe measures the regime where the small side is
too big (stand-in: threshold -1).

Workload: lineitem at sf0.1 replicated Rx, with ~60% of rows remapped
to ONE hot key (deterministic xxhash pick) and the rest spread over
50k keys; the small side is the key table with a payload, and the
join stage fuses md5 work per joined row (without it the probe is
map-side-bound and measures nothing — see the in-code note). Output
fully materialized through the noop sink; each leg cross-checks its
row count (the mitigation must be value-neutral).

Measured (sf0.1 base, local[32], this box):

| leg | 8x (4.8M rows) | 32x (19.2M rows) |
|---|---|---|
| smj_skew_off (unmitigated) | 10.7 | 40.1 |
| smj_skew_on (AQE split)    |  2.2 |  6.8 |
| salted (n_salts=32)        |  4.6 |  8.9 |

The unmitigated leg grows LINEARLY in hot-key rows (the stage runs
at single-straggler speed); AQE's split restores ~6x at 32x, and
salting restores ~4.5x — it pays the small-side x32 replication and
the big-side salt hash, which is why it is the FALLBACK (for plans
AQE cannot split), not the default. Mitigation hierarchy, measured:
broadcast > AQE skew split > salted join > nothing.

TWO non-obvious findings this probe itself surfaced, kept here
because they generalize:
- Conf targeting: the first run set the knobs on the PARENT session
  while table() builds frames on the isolated engine CHILD session —
  a DataFrame plans under ITS OWN session's conf, so every leg
  silently ran as a BroadcastHashJoin (no shuffle, no skew, three
  near-identical numbers that LOOKED like "skew doesn't matter").
- Reduce-side work: with a trivial post-join projection the 32-way-
  parallel map side dominates and the straggler hides in noise; the
  hazard is only visible when the join stage carries real per-row
  work — which at 100 TB it always does.

Usage: python tools/skew_join_probe.py [replicas...] (default 4 8)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

replicas = [int(a) for a in sys.argv[1:]] or [4, 8]
SF_DIR = "/root/testdata/sf0.1"
HOT_SHARE = 6  # of 10 -> ~60% of big-side rows on the hot key
N_KEYS = 50_000
N_SALTS = 32


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.skew import salted_join
    from prohap_spark.queries.registry import engine_session, table
    from prohap_spark.session import get_spark

    spark = get_spark("skew-join-probe")
    # CONF GOES ON THE SESSION THE FRAMES EXECUTE UNDER: table() builds
    # DataFrames on the isolated engine CHILD session, and a DataFrame
    # plans with its own session's conf — the first run of this probe
    # set these knobs on the parent and silently measured a
    # BroadcastHashJoin on every leg (threshold never applied, no
    # shuffle, no skew, three near-identical numbers). The same trap
    # applies to any deployment that tweaks SQL confs around engine-
    # built frames.
    conf = engine_session(spark).conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # scale AQE's skew geometry down to probe sizes (see module doc)
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )

    def big_side(r_count: int):
        reps = [
            li.select(
                F.xxhash64("l_orderkey", "l_linenumber", F.lit(r)).alias("__h"),
                F.col("l_extendedprice").alias("v"),
            )
            for r in range(r_count)
        ]
        out = reps[0]
        for df in reps[1:]:
            out = out.unionAll(df)
        return out.select(
            F.when(F.pmod("__h", F.lit(10)) < HOT_SHARE, F.lit(0))
            .otherwise(F.pmod("__h", F.lit(N_KEYS)) + 1)
            .alias("k"),
            "v",
        )

    small = (
        # built on the engine session too — a join of frames from
        # sibling sessions plans under ONE of them; keeping every input
        # on the session whose conf we set removes the ambiguity
        engine_session(spark)
        .range(0, N_KEYS + 1)
        .select(F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("w"))
    )

    def run(name: str, build, skew_on: bool, r_count: int):
        conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        df = build()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        n = df.count()
        print(json.dumps({
            "leg": name, "replicas": r_count, "wall_sec": wall, "rows": n,
        }))
        return n

    # per-joined-row work that the join stage fuses (md5 over the
    # joined tuple): without it the probe times the 32-way-parallel
    # MAP side (scan + union) and the single-reducer straggler hides
    # inside the noise — the first run of this probe did exactly that
    # (skew_off 1.37 s vs skew_on 1.46 s at 32x, both scan-bound). At
    # 100 TB the reduce side carries real downstream work by
    # definition; the md5 stands in for it.
    def proj(df):
        body = F.repeat(F.concat_ws(",", "k", "v", "w"), 4)
        return df.select(
            "k",
            F.length(F.md5(F.concat(F.md5(body), F.md5(F.reverse(body))))).alias("x"),
        )

    for r in replicas:
        big = big_side(r)
        plain = lambda: proj(big.join(small, "k"))
        salted = lambda: proj(salted_join(big, small, ["k"], n_salts=N_SALTS))
        if r == replicas[0]:
            run("warmup", plain, True, r)
        n_off = run("smj_skew_off", plain, False, r)
        n_on = run("smj_skew_on", plain, True, r)
        n_salt = run("salted", salted, False, r)
        assert n_off == n_on == n_salt, (n_off, n_on, n_salt)
    spark.stop()


if __name__ == "__main__":
    main()

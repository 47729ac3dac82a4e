"""Skew-handling utilities (SURVEY §4 / §7.1.7).

Transcript groups in the reference data vary from 0 to thousands of
variants and chr1 is ~10× chr21 — classic shuffle skew. Two levers:

1. AQE skew-join splitting (on by default in our session factory) —
   handles join-side skew transparently;
2. explicit salting for skewed AGGREGATIONS and joins where AQE can't
   help (e.g. a groupBy whose hot key overwhelms one reducer): the
   two-phase salted aggregate below, and a salted broadcast-replicate
   join for hot build keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 aggregates
    on (keys + salt) — spreading a hot key over ``n_salts`` reducers —
    phase 2 merges the partials on the true keys.

    ``aggs``: output_name -> phase-1 aggregate expression. Phase-2
    merge is sum for counts/sums, min/max for min/max — the caller
    provides decomposable aggregates only (sum/count/min/max).
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p1_{name}") for name, expr in aggs.items()]
    )
    merge = []
    for name, expr in aggs.items():
        fn = expr._jc.toString().lower()  # noqa: SLF001
        col = F.col(f"__p1_{name}")
        if fn.startswith("min"):
            merge.append(F.min(col).alias(name))
        elif fn.startswith("max"):
            merge.append(F.max(col).alias(name))
        else:  # sum / count partials merge by sum
            merge.append(F.sum(col).alias(name))
    return phase1.groupBy(*keys).agg(*merge)


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt equi-join: the small side is replicated
    ``n_salts`` times (one copy per salt), the big side gets a random-
    but-deterministic salt from its row content, and the join runs on
    (keys + salt) — a hot key's rows spread over n_salts tasks.

    Use when the small side is too big to broadcast and the key
    histogram is too skewed for a plain shuffle join; AQE's skew split
    covers most other cases.
    """
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    small_s = skewed_small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")

"""Incremental table statistics: per-shard partial stats state that
PERSISTS and MERGES losslessly — the production path behind
queries/maintenance.py::table_stats_board's docstring claim. At
100 TB nobody rescans the corpus to refresh ANALYZE output; each
ingest/shard job emits a tiny partial-state artifact and the catalog
folds them:

- basic state: one row per column — (n, n_null, min/max in a typed
  slot) — merged by sum/sum/min/max (all semilattice or additive, so
  merge order and sharding are irrelevant);
- NDV state: the HLL register table (functions/sketches.py) per
  column — ≤64 rows/column regardless of shard size, merged by
  per-register max (lossless: merged == single-pass build, pinned in
  pytest at this module's level too).

Both states build from ONE scan each (the NDV melt is a single
explode → one register aggregate for ALL profiled columns, not a
scan per column), and the artifact rides the validated-index
discipline of operators/dedup.py (manifest: count + checksum +
columns; torn writes fail loud on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.functions.sketches import (
    hll_estimate_from_registers,
    hll_merge,
    hll_registers,
)

_META = "stats_meta.json"


def column_stats_partials(
    df: DataFrame, num_cols: list[str], str_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Partial stats state for one shard. Returns (basic, regs):
    basic = (col, n, n_null, min_d, max_d, min_s, max_s) — numeric
    columns use the double slots, string columns the varchar slots;
    regs = the per-column HLL register rows. One scan for basic, one
    for regs (melt → single aggregate across ALL columns)."""
    cols = list(num_cols) + list(str_cols)
    assert cols, "profile at least one column"
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    for c in cols:
        aggs.append((n - F.count(c)).alias(f"__null_{c}"))
    for c in num_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    for c in str_cols:
        aggs.append(F.min(c).alias(f"__mins_{c}"))
        aggs.append(F.max(c).alias(f"__maxs_{c}"))
    one = df.agg(*aggs)
    ND, NS = "CAST(NULL AS DOUBLE)", "CAST(NULL AS STRING)"
    tuples = []
    for c in num_cols:
        tuples.append(
            f"'{c}', __null_{c}, __min_{c}, __max_{c}, {NS}, {NS}"
        )
    for c in str_cols:
        tuples.append(f"'{c}', __null_{c}, {ND}, {ND}, __mins_{c}, __maxs_{c}")
    basic = one.select(
        F.col("__n").alias("n"),
        F.expr(
            f"stack({len(cols)}, {', '.join(tuples)}) "
            "AS (col, n_null, min_d, max_d, min_s, max_s)"
        ),
    ).select("col", "n", "n_null", "min_d", "max_d", "min_s", "max_s")

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.col", "e.v").where(F.col("v").isNotNull())
    regs = hll_registers(melted, ["col"], "v")
    return basic, regs


def merge_stats(
    *partials: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Fold shard partial states: additive counts, semilattice
    min/max, per-register max. Merging N shards equals one pass over
    their concatenation — exactly, not approximately."""
    basics = [b for b, _ in partials]
    regs = [r for _, r in partials]
    it = iter(basics)
    b = next(it)
    for t in it:
        b = b.unionByName(t)
    merged_basic = b.groupBy("col").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("n_null").cast("long").alias("n_null"),
        F.min("min_d").alias("min_d"),
        F.max("max_d").alias("max_d"),
        F.min("min_s").alias("min_s"),
        F.max("max_s").alias("max_s"),
    )
    return merged_basic, hll_merge(*regs)


def finish_stats(basic: DataFrame, regs: DataFrame) -> DataFrame:
    """Catalog view: basic state joined with the finished NDV
    estimate — (col, n, n_null, min_d, max_d, min_s, max_s,
    ndv_hll)."""
    est = hll_estimate_from_registers(regs, ["col"]).select(
        "col", F.col("hll_est").alias("ndv_hll")
    )
    return basic.join(est, "col", "left").select(
        "col", "n", "n_null", "min_d", "max_d", "min_s", "max_s",
        F.coalesce("ndv_hll", F.lit(0)).cast("long").alias("ndv_hll"),
    )


def write_stats_artifact(
    path: str, basic: DataFrame, regs: DataFrame
) -> dict:
    """Persist both state tables under ``path`` with the validated-
    index manifests (torn writes fail loud on read)."""
    import json
    import os

    from prohap_spark.operators.dedup import write_dedup_index

    mb = write_dedup_index(basic, f"{path}/basic")
    mr = write_dedup_index(regs, f"{path}/regs")
    meta = {"basic": mb, "regs": mr}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)
    return meta


def read_stats_artifact(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Load a stats artifact, validating both manifests."""
    from prohap_spark.operators.dedup import read_dedup_index

    return (
        read_dedup_index(spark, f"{path}/basic"),
        read_dedup_index(spark, f"{path}/regs"),
    )


# ---------------------------------------------------------------------------
# planner reads: pure driver-side functions over the (tiny) stats
# artifacts — selectivity and join-cardinality estimation, the two
# numbers a cost-based decision (broadcast vs shuffle, filter-first
# vs join-first, zone-map-prune vs scan) actually consumes. Stats are
# kilobytes by design, so these are plain functions, not jobs.
# ---------------------------------------------------------------------------


def range_selectivity(
    hist_counts: list[int], domain_lo: float, domain_hi: float,
    lo: float | None, hi: float | None,
) -> float:
    """Estimated fraction of rows with value in [lo, hi] from an
    equi-width histogram over [domain_lo, domain_hi] (the
    table_stats_board hist legs), uniform-within-bucket assumption —
    the textbook estimator. None bounds are unbounded."""
    total = sum(hist_counts)
    if total == 0:
        return 0.0
    nb = len(hist_counts)
    width = (domain_hi - domain_lo) / nb
    lo = domain_lo if lo is None else max(lo, domain_lo)
    hi = domain_hi if hi is None else min(hi, domain_hi)
    if hi <= lo:
        return 0.0
    acc = 0.0
    for i, c in enumerate(hist_counts):
        b_lo = domain_lo + i * width
        b_hi = b_lo + width
        overlap = max(0.0, min(hi, b_hi) - max(lo, b_lo))
        if overlap > 0:
            acc += c * (overlap / width)
    return acc / total


def join_cardinality(n_a: int, ndv_a: int, n_b: int, ndv_b: int) -> float:
    """System-R equi-join estimate under the containment assumption:
    |A ⋈ B| ≈ n_a · n_b / max(ndv_a, ndv_b). Exact for clean FK
    joins (ndv_child_keys == ndv_parent); feed it the ndv_hll legs
    and it prices a join before any shuffle — the stats-based twin of
    functions/sketches.py::cms_join_size_estimate (which reads
    frequency sketches instead and also sees skew)."""
    if ndv_a <= 0 or ndv_b <= 0:
        return 0.0
    return n_a * n_b / max(ndv_a, ndv_b)


def suggest_zorder_dims(
    finished: DataFrame, candidates: list[str], k: int = 2
) -> list[str]:
    """Pick the ``k`` z-order dimensions from a :func:`finish_stats`
    frame: highest NDV first (ties broken by name for determinism).
    Rationale: Morton interleaving only buys multi-column pruning on
    dimensions with enough distinct values to quantize meaningfully —
    a 3-value flag column wastes its interleave bits (the
    operators/layout.py quantizer would collapse it to a constant
    prefix). Columns with NDV <= 1 are excluded outright. This is the
    stats->layout planner read the README's governance bullet names;
    the chosen dims feed write_zorder_clustered unchanged."""
    rows = {
        r["col"]: r["ndv_hll"]
        for r in finished.where(F.col("col").isin(candidates)).select(
            "col", "ndv_hll"
        ).collect()
    }
    ranked = sorted(
        ((ndv, c) for c, ndv in rows.items() if ndv and ndv > 1),
        key=lambda t: (-t[0], t[1]),
    )
    return [c for _, c in ranked[:k]]

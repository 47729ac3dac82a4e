"""Binned interval (range) join — the J1 operator from SURVEY.md §2.3.

The reference implements variant⋈exon assignment as a single-pass
sweep line over position-sorted inputs (/root/reference/src/
vcf_reader.py:31-71). That strategy is single-threaded by design;
Spark's idiomatic equivalent is a *binned* interval join:

1. explode each interval onto the fixed-width genomic bins it covers
   (``sequence(floor(start/bin) .. floor(end/bin))``),
2. assign each point its single bin,
3. equi-join on ``partition_keys + [bin]`` — an ordinary shuffled (or
   broadcast) hash join Catalyst can plan, prune, and AQE-skew-split,
4. refine with the exact range predicate.

Each point lives in exactly one bin, so no post-join dedup is needed.
At 100 TB this is the strategy that holds up: the shuffle is on a
well-distributed composite key, the per-bin fanout of intervals is
bounded by ``interval_len / bin_size + 1``, and both sides prune on
the partition keys. For small interval tables we broadcast instead
and let Catalyst run a BroadcastNestedLoopJoin with the raw predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BIN = "__ij_bin"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    partition_keys: list[str] | None = None,
    bin_size: int = 100_000,
    strategy: str = "binned",
    closed: str = "both",
    extra_pred: Column | None = None,
    join_hint: str | None = None,
) -> DataFrame:
    """Join each row of ``points`` to every row of ``intervals`` whose
    [start, end] range contains the point (1-D containment join).

    ``closed``: 'both' → start <= p <= end; 'left' → start <= p < end;
    'right' → start < p <= end; 'neither' → start < p < end.
    ``partition_keys``: equi-key columns present in BOTH inputs
    (e.g. chromosome); they become part of the join key.
    ``strategy``: 'binned' (scale path), 'broadcast' (small interval
    side → BroadcastNestedLoopJoin on the raw predicate).
    ``join_hint``: optional hint ('shuffle_hash' / 'merge') applied to
    the bin-exploded interval side. Needed when the interval side is
    generator-fanned in-flight: Catalyst sizes a generator's output at
    ~1x its input, so a side that *scans* small but *explodes* big gets
    statically planned as a broadcast — and AQE cannot demote a
    statically chosen broadcast join (no shuffle boundary to measure).
    The r7 interval scale probe measured the failure: 32x replicated
    inputs ran 143.6 s under the misestimated broadcast vs 16.0 s on
    the shuffle path. Inputs read directly from files carry honest scan
    stats and need no hint.
    """
    partition_keys = list(partition_keys or [])
    p = F.col(point_col)
    lo, hi = F.col(start_col), F.col(end_col)
    lo_ok = lo <= p if closed in ("both", "left") else lo < p
    hi_ok = p <= hi if closed in ("both", "right") else p < hi
    pred = lo_ok & hi_ok
    if extra_pred is not None:
        pred = pred & extra_pred

    if strategy == "broadcast":
        ivs = intervals
        cond = pred
        for k in partition_keys:
            ivs = ivs.withColumnRenamed(k, f"__iv_{k}")
        for k in partition_keys:
            cond = cond & (F.col(k) == F.col(f"__iv_{k}"))
        return points.join(F.broadcast(ivs), cond).drop(*[f"__iv_{k}" for k in partition_keys])

    # binned strategy
    binned_ivs = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(bin_size)).cast("long"),
                F.floor(hi / F.lit(bin_size)).cast("long"),
            )
        ),
    )
    # avoid key-name collisions: rename interval-side partition keys
    for k in partition_keys:
        binned_ivs = binned_ivs.withColumnRenamed(k, f"__iv_{k}")
    if join_hint is not None:
        binned_ivs = binned_ivs.hint(join_hint)
    binned_pts = points.withColumn(_BIN, F.floor(p / F.lit(bin_size)).cast("long"))
    cond = binned_pts[_BIN] == binned_ivs[_BIN]
    for k in partition_keys:
        cond = cond & (binned_pts[k] == binned_ivs[f"__iv_{k}"])
    out = binned_pts.join(binned_ivs, cond).where(pred)
    return out.drop(binned_pts[_BIN]).drop(binned_ivs[_BIN]).drop(
        *[f"__iv_{k}" for k in partition_keys]
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    partition_keys: list[str] | None = None,
    bin_size: int = 100_000,
    join_hint: str | None = None,
) -> DataFrame:
    """Interval-overlap join: pairs where [ls,le] and [rs,re] intersect.

    Mirrors the reference predicate ``exon.start < POS + len(REF) AND
    exon.end >= POS`` (vcf_reader.py:50-51) generalized to two interval
    sides. Deduped bin assignment: a pair is emitted only from the bin
    containing max(ls, rs), so each overlapping pair appears once.
    ``join_hint``: same escape hatch as ``interval_join`` — both sides
    here are generator-fanned, so a side that scans small but explodes
    big can be statically misplanned as a broadcast (see the
    ``interval_join`` docstring for the measured failure).
    """
    partition_keys = list(partition_keys or [])
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)

    lbin = left.withColumn(
        _BIN,
        F.explode(F.sequence(F.floor(ls / bin_size).cast("long"), F.floor(le / bin_size).cast("long"))),
    )
    rbin = right.withColumn(
        _BIN,
        F.explode(F.sequence(F.floor(rs / bin_size).cast("long"), F.floor(re_ / bin_size).cast("long"))),
    )
    for k in partition_keys:
        rbin = rbin.withColumnRenamed(k, f"__iv_{k}")
    if join_hint is not None:
        rbin = rbin.hint(join_hint)
    cond = lbin[_BIN] == rbin[_BIN]
    for k in partition_keys:
        cond = cond & (lbin[k] == rbin[f"__iv_{k}"])
    overlap = (ls <= re_) & (rs <= le)
    anchor = F.floor(F.greatest(ls, rs) / bin_size).cast("long") == lbin[_BIN]
    out = lbin.join(rbin, cond).where(overlap & anchor)
    return out.drop(lbin[_BIN]).drop(rbin[_BIN]).drop(*[f"__iv_{k}" for k in partition_keys])

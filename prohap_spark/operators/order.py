"""W2 — deterministic global identity assignment at scale.

A bare ``row_number() OVER (ORDER BY ...)`` funnels the entire table
through ONE task (Catalyst plans a single-partition sort for an
unpartitioned window) — the classic scale-killer this engine bans from
its pipelines (SURVEY §7.3.4). The scalable equivalent below keeps the
same externally-visible numbering while every stage stays
partition-parallel.

Reference analog: hex(pandas index) ids (process_haplotypes.py:365) —
irreproducible across runs; this operator pins a documented total
order instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grouped_row_number(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str = "rn",
) -> DataFrame:
    """1-based row numbers per ``partition_cols`` group under the total
    order ``order_cols`` (group + order must form a unique key for the
    numbering to be deterministic), without funneling any group through
    a single task. A plain ``row_number() OVER (PARTITION BY g ORDER BY
    k)`` puts each group in ONE task — fatal when groups are huge and
    few (e.g. per-chromosome ranks: 23 groups for the whole genome).

    1. ``repartitionByRange`` on (group, order) keys — a huge group
       spans MANY partitions, each partition covers a contiguous key
       range (sampled bounds move rows between runs, never across the
       order);
    2. local ``row_number`` within (physical partition × group) —
       parallel sorts;
    3. offsets: per-(partition, group) counts — one tiny row per
       (partition, group-fragment) — cumulated per group over the
       partition id, broadcast-joined back.

    The only narrow stage is the window over the count table:
    O(#partitions + #groups) rows (one per group-fragment) — tiny for
    the intended low-to-moderate group cardinality (chromosomes,
    transcripts); the offsets table is also broadcast, so very
    high-cardinality ``partition_cols`` should use a plain window
    (small groups fit one task) or a content-hash id instead.

    CAVEAT — input computed twice: the offsets branch and the main
    branch read the range exchange with different pruned projections,
    so Catalyst cannot reuse the exchange and the INPUT plan executes
    twice. Fine over a scan or cheap projection (the re-read is
    columnar); do NOT feed it an expensive stage (Python kernel, big
    join) — for those, prefer a content-hash id (see
    pipeline/provar.py's variant ids) or materialize the input
    first."""
    ordered = df.repartitionByRange(*partition_cols, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("__pid", *partition_cols).orderBy(*order_cols)
    numbered = ordered.withColumn("__lrn", F.row_number().over(local_w))
    # constant partition key when ungrouped: same single tiny partition,
    # but avoids the empty-partition-spec WindowExec warning
    off_parts = [F.col(c) for c in partition_cols] or [F.lit(0)]
    off_w = (
        Window.partitionBy(*off_parts)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        numbered.groupBy("__pid", *partition_cols)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            *partition_cols,
            F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__offset"),
        )
    )
    return (
        numbered.join(F.broadcast(offsets), ["__pid", *partition_cols])
        .withColumn(out_col, F.col("__offset") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__offset")
    )


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn"
) -> DataFrame:
    """1-based global row numbers under the total order ``order_cols``
    — ``grouped_row_number`` with no grouping key."""
    return grouped_row_number(df, [], order_cols, out_col)

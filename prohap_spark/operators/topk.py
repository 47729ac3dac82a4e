"""Top-k per group (§2.6 capability surplus — the reference has no
LIMIT/top-k; Spark expresses it as a rank window + filter, which the
physical planner executes with per-partition partial top-k sorts)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    partition_keys: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows of each group under a total order.

    ``order_by`` must be a total order (include a unique tiebreaker)
    for deterministic results.
    """
    w = Window.partitionBy(*partition_keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )

"""Gaps-and-islands operators — the W1 window pipeline from SURVEY.md §2.5.

The reference clusters overlapping mutations with an event sweep
(/root/reference/src/get_haplotypes.py:8-30) to detect conflicting
changes on one haplotype. The Spark-native equivalent is the classic
gaps-and-islands window pipeline: a row starts a new island iff its
start exceeds the running max end of all previous rows in the group.

Both operators are pure window/aggregate compositions — whole-stage
codegen'd, one shuffle on the partition keys, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cluster_overlapping_intervals(
    df: DataFrame,
    partition_keys: list[str],
    start_col: str,
    end_col: str,
    island_col: str = "island_id",
) -> DataFrame:
    """Assign an island id to each row; rows whose [start, end] chain
    into an overlapping run share an island (reference semantics:
    intervals are [pos, pos+len(ref)), i.e. touching-at-end does not
    overlap — pass end = start + len - 1 for closed semantics).
    """
    w = Window.partitionBy(*partition_keys).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    df = df.withColumn("__new_island", new_island)
    island = F.sum("__new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(island_col, island).drop("__new_island")


def sessionize(
    df: DataFrame,
    partition_keys: list[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Time-gap sessionization: a new session starts when the gap to the
    previous event in the group exceeds ``gap_seconds``. Batch analog of
    streaming ``session_window`` (§2.10).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*partition_keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = df.withColumn("__new_sess", new_sess)
    sess = F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(session_col, sess).drop("__new_sess")

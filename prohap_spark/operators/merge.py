"""SCD2 merge/upsert: the slowly-changing-dimension type-2 MERGE a
warehouse runs on every dimension load, expressed as pure DataFrame
joins/unions (Spark without a table format's MERGE INTO).

Semantics per batch: an update row whose tracked attributes differ
from the key's CURRENT dimension row (or whose key is new) closes the
current row (``valid_to = batch_id``, ``is_current = false``) and
inserts a fresh current row (``valid_from = batch_id``); an update
identical to the current row is a no-op; history rows are never
touched.

The 100 TB shape: history never joins — only the CURRENT slice (one
row per live key) meets the update batch, in a single key equi-join.
The changed-key set is at most update-batch-sized, so the close/keep
split is two broadcast-able semi/anti joins against it (AQE picks
broadcast when the batch is dim-sized). In a deployed lakehouse the
dimension would be stored partitioned by ``is_current`` so the scan
prunes to the current partition; the rewritten output is
current-slice + inserts, never a full-history rewrite.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    batch_id: int,
) -> DataFrame:
    """Apply one SCD2 merge batch.

    ``base`` carries (key_col, *tracked_cols, valid_from, valid_to,
    is_current); ``updates`` carries (key_col, *tracked_cols). Change
    detection is null-safe per tracked column. Returns the merged
    dimension with the same schema as ``base``."""
    cur = base.where(F.col("is_current"))
    hist = base.where(~F.col("is_current"))

    cols = [key_col, *tracked_cols]
    u = updates.select(*cols)
    c_attrs = cur.select(
        F.col(key_col).alias("__k"),
        *[F.col(t).alias(f"__c_{t}") for t in tracked_cols],
    )
    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(t).eqNullSafe(F.col(f"__c_{t}")) for t in tracked_cols],
    )
    changed = (
        u.join(c_attrs, u[key_col] == c_attrs["__k"], "left")
        .where(F.col("__k").isNull() | differs)
        .select(*cols)
    )
    changed_keys = changed.select(key_col)

    closed = cur.join(changed_keys, key_col, "left_semi").select(
        *cols,
        F.col("valid_from"),
        F.lit(batch_id).cast("int").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    untouched = cur.join(changed_keys, key_col, "left_anti").select(
        *cols, "valid_from", "valid_to", "is_current"
    )
    inserts = changed.select(
        *cols,
        F.lit(batch_id).cast("int").alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out_cols = [*cols, "valid_from", "valid_to", "is_current"]
    return (
        hist.select(*out_cols)
        .unionAll(closed)
        .unionAll(untouched)
        .unionAll(inserts)
    )

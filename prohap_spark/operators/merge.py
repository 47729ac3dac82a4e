"""SCD2 merge/upsert: the slowly-changing-dimension type-2 MERGE a
warehouse runs on every dimension load, expressed as pure DataFrame
operations (Spark without a table format's MERGE INTO).

Semantics per batch: an update row whose tracked attributes differ
from the key's CURRENT dimension row (or whose key is new) closes the
current row (``valid_to = batch_id``, ``is_current = false``) and
inserts a fresh current row (``valid_from = batch_id``); an update
identical to the current row is a no-op; history rows are never
touched.

The 100 TB shape: history never joins — only the CURRENT slice (one
row per live key) meets the update batch, in EXACTLY ONE full-outer
key equi-join; every outcome (close+insert, untouched carry, new-key
insert) is emitted from that one joined row via a per-row explode, so
no subplan is referenced — or recomputed — twice. (The first draft
split close/keep/insert with semi/anti joins against a shared
``changed`` frame; Spark re-executes unshared subplans, so the
compare join ran three times — the plan pin in tests/test_plans.py
caught it, and the explode rewrite is what made the pin's joins<=1
hold.) A full outer cannot broadcast, so the join is a sort-merge
co-partitioned on the business key — the honest shape when both the
dimension and the batch are large; in a deployed lakehouse the
dimension would be stored partitioned by ``is_current`` so the scan
prunes to the current partition, and the rewritten output is
current-slice + inserts, never a full-history rewrite.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F


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
    dimension with the same schema as ``base``.

    A batch carrying several DISTINCT updates for one key is
    collapsed to one deterministically (greatest tracked tuple, nulls
    last) BEFORE the merge — without this, every distinct row would
    insert its own ``is_current`` version and corrupt the
    one-current-row invariant. A CDC feed with real intra-batch
    ordering should pre-collapse on its own timestamp instead (or use
    ``streaming/cdc.py`` which keeps every version)."""
    if not tracked_cols:
        raise ValueError("scd2_merge needs at least one tracked column")
    cur = base.where(F.col("is_current"))
    hist = base.where(~F.col("is_current"))

    cols = [key_col, *tracked_cols]
    u = (
        updates.select(
            F.col(key_col).alias("__uk"),
            *[F.col(t).alias(f"__u_{t}") for t in tracked_cols],
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__uk").orderBy(
                    *[F.col(f"__u_{c}").desc_nulls_last() for c in tracked_cols]
                )
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    j = cur.join(u, cur[key_col] == u["__uk"], "full_outer")

    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(t).eqNullSafe(F.col(f"__u_{t}")) for t in tracked_cols],
    )
    cur_present = F.col(key_col).isNotNull()
    upd_present = F.col("__uk").isNotNull()
    changed = cur_present & upd_present & differs
    new_key = ~cur_present & upd_present

    def row(key: Column, vals: list[Column], vf: Column, vt: Column, is_cur: Column):
        return F.struct(
            key.alias(key_col),
            *[v.alias(t) for v, t in zip(vals, tracked_cols)],
            vf.cast("int").alias("valid_from"),
            vt.cast("int").alias("valid_to"),
            is_cur.alias("is_current"),
        )

    cur_vals = [F.col(t) for t in tracked_cols]
    upd_vals = [F.col(f"__u_{t}") for t in tracked_cols]
    batch = F.lit(batch_id)
    null_i = F.lit(None)

    events = F.when(
        changed,
        F.array(
            row(F.col(key_col), cur_vals, F.col("valid_from"), batch, F.lit(False)),
            row(F.col(key_col), upd_vals, batch, null_i, F.lit(True)),
        ),
    ).when(
        new_key,
        F.array(row(F.col("__uk"), upd_vals, batch, null_i, F.lit(True))),
    ).otherwise(
        # cur-only, or update identical to current: carry unchanged
        F.array(
            row(
                F.col(key_col),
                cur_vals,
                F.col("valid_from"),
                F.col("valid_to"),
                F.col("is_current"),
            )
        ),
    )

    out_cols = [*cols, "valid_from", "valid_to", "is_current"]
    merged = (
        j.select(F.explode(events).alias("__r"))
        .select(*[F.col(f"__r.{c}").alias(c) for c in out_cols])
    )
    return hist.select(*out_cols).unionAll(merged)

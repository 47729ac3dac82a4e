"""As-of (ordered probe) join — the J10 operator from SURVEY.md §2.3.

The reference bisects into per-transcript sorted allele positions
(/root/reference/peptide_annotation/src/peptides_annotate_variation.py:145-169).
The distributed equivalent is the union-and-window as-of join: tag both
sides, union on aligned schemas, and carry the last right-side payload
forward with ``last(..., ignorenulls=True)`` over an ordered window.

One shuffle on (keys, ts); no Python; scales to arbitrarily large
right sides (unlike a broadcast probe). For 'backward' semantics a
right row at the same timestamp as a left row IS visible to it
(right rows order before left rows on ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    direction: str = "backward",
    payload_prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach ``payload_cols`` from the most recent
    right row with right.ts <= left.ts (direction='backward'), or the
    nearest right row with right.ts >= left.ts (direction='forward'),
    matching on the equi-keys ``on``. Left rows with no match get nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn(_PAYLOAD, F.lit(None).cast(
        right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
    ))
    rhs = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        F.struct(*payload_cols).alias(_PAYLOAD),
    )
    # align schemas: right side gets nulls for the left-only columns
    for c in left.columns:
        if c not in on and c != ts_col:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = F.last(_PAYLOAD, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).desc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = unioned.withColumn(_PAYLOAD, carried).where(F.col(_SIDE) == 1).drop(_SIDE)
    for c in payload_cols:
        out = out.withColumn(f"{payload_prefix}{c}", F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_PAYLOAD)

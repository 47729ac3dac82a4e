"""Time-series resampling with gap fill (LOCF).

The missing member of the windowed-analytics family: regularize an
irregular event stream onto a fixed bucket grid per group — last
observation in each bucket, empty buckets carried forward from the
previous observation (locf), with a fill flag so downstream consumers
can distinguish observed from imputed. The dashboard/feature-store
staple ("daily last-known account balance") that naive groupBy(bucket)
gets wrong by silently DROPPING the empty buckets.

Spark-first shape: one aggregation to (group, bucket) grain with a
deterministic last-in-bucket (row_number over (ts, tiebreak) — never
an unordered `last()`), one per-group `sequence()` explode to
manufacture the full grid (each group's span only, not the global
min-to-max rectangle), one window `last(ignorenulls=True)` for the
carry-forward. Everything shuffles once on the group key; the grid
explode is a Generate, not a join. Engine-replayable: bucket indices
are exact integer division of epoch micros; carried values pass
through untouched (no arithmetic, so doubles hash identically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def retention_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Cohort retention — the other product-analytics staple beside
    the funnel: users are cohorted by their FIRST active bucket, and
    each (cohort, age) cell counts how many of them were active
    ``age`` buckets later. Returns (cohort long, age long,
    n_users long) with age 0 = the cohort's own size.

    Shape: one distinct to (user, bucket) grain, a min-aggregate for
    the cohort, one equi-join back on the user key (broadcast when the
    user dimension is small; co-partitioned otherwise — both sides
    already hash on the user key), one count aggregate. No window over
    the full event stream and nothing user-grain ever sorts globally."""
    bucket_us = bucket_seconds * 1_000_000
    ub = events.select(
        F.col(user_col).alias("__u"),
        F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("__b"),
    ).distinct()
    cohort = ub.groupBy("__u").agg(F.min("__b").alias("cohort"))
    return (
        ub.join(cohort, "__u")
        .select("cohort", (F.col("__b") - F.col("cohort")).alias("age"))
        .groupBy("cohort", "age")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def resample_locf(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """group_cols + (bucket long, value double, is_filled int): one row
    per group per bucket from the group's first to last observed
    bucket. value = the group's LAST observation in that bucket
    (ordered by ts then ``tiebreak_cols``), carried forward through
    empty buckets; is_filled = 1 on carried rows. Leading buckets
    before a group's first observation don't exist by construction, so
    value is never NULL."""
    tiebreak = list(tiebreak_cols or [])
    bucket_us = bucket_seconds * 1_000_000
    b = df.select(
        *group_cols,
        F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
        F.col(ts_col).alias("__ts"),
        *[F.col(c) for c in tiebreak],
        F.col(value_col).cast("double").alias("__v"),
    )
    w_last = Window.partitionBy(*group_cols, "bucket").orderBy(
        F.col("__ts").desc(), *[F.col(c).desc() for c in tiebreak]
    )
    # per_bucket feeds BOTH the span aggregate and the grid join — the
    # multiplied-subplan rule: one lazy checkpoint, one upstream scan
    per_bucket = (
        b.withColumn("__rn", F.row_number().over(w_last))
        .where(F.col("__rn") == 1)
        .select(*group_cols, "bucket", F.col("__v").alias("__obs"))
        .localCheckpoint(eager=False)
    )
    span = per_bucket.groupBy(*group_cols).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    grid = span.select(
        *group_cols,
        F.explode(F.sequence(F.col("__b0"), F.col("__b1"))).alias("bucket"),
    )
    joined = grid.join(per_bucket, [*group_cols, "bucket"], "left")
    w_ff = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *group_cols,
        "bucket",
        F.last("__obs", ignorenulls=True).over(w_ff).alias("value"),
        F.when(F.col("__obs").isNull(), 1).otherwise(0).alias("is_filled"),
    )

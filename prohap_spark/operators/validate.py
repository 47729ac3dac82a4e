"""Data-quality constraint checking and snapshot diff — the
governance surface of a 100 TB training-data pipeline: validation
gates that run BEFORE a corpus feeds a training job, and the
content-level diff that audits what changed between two pipeline
versions' outputs.

Reference parity note: the reference validates inputs ad hoc
(per-script assertions on VCF/GTF shape); these operators are the
declared engine-surplus generalization (SURVEY §2.3 surplus lane).

Scale design:
- Row-level constraints (not-null / range / accepted-values / regex)
  compile into ONE aggregate pass over the table — a map-side partial
  sum per constraint, no shuffle beyond the single-row reduce, no
  second scan per rule (the anti-pattern: one COUNT(*) query per
  constraint, N scans for N rules).
- unique / foreign-key constraints are the two that genuinely need a
  shuffle (group-by on the key; anti-join to the parent) — each is
  one exchange on the constrained key, and the FK parent side is
  DISTINCT-projected to the key column only before the join, so AQE
  broadcasts dimension-sized parents.
- ``table_diff`` digests rows to one md5 per row (column-pruned to
  key + compared columns) and FULL-OUTER-joins the two snapshots on
  the key — one shuffle each side, counts only; row text never moves
  past the digest. Engine-portable: the digest is md5 over
  '\\x1f'-joined, null-sentineled string casts, replayable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --------------------------------------------------------------------------
# row-level constraints: each helper returns (name, ok_column); the
# checker sums violations for ALL of them in one aggregate pass
# --------------------------------------------------------------------------


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Closed-interval range check. NULL passes (compose with
    :func:`not_null` when nulls are also violations)."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"accepted_values({col})",
        c.isNull() | c.isin(*values),
    )


def matches_regex(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"matches_regex({col})",
        c.isNull() | c.rlike(pattern),
    )


def check_rows(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate row-level constraints in ONE aggregate pass. Returns
    (constraint string, violations bigint, total bigint, ok boolean),
    one row per constraint. A NULL-valued predicate counts as a
    VIOLATION (SQL three-valued logic would otherwise let `~NULL ->
    otherwise(0)` pass it silently — the built-in helpers guard their
    own nulls, but the public API accepts arbitrary (name, Column)
    predicates), and an empty table reports 0 violations / ok=true
    rather than NULL (r12 ADVICE)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__total")] + [
        F.coalesce(
            F.sum(F.when(F.coalesce(ok, F.lit(False)), 0).otherwise(1)), F.lit(0)
        )
        .cast("long")
        .alias(f"__v{i}")
        for i, (_, ok) in enumerate(checks)
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', __v{i}" for i, (name, _) in enumerate(checks)
    )
    return one.select(
        F.expr(
            f"stack({len(checks)}, {pairs}) AS (constraint, violations)"
        ),
        F.col("__total").alias("total"),
    ).select(
        "constraint",
        "violations",
        "total",
        (F.col("violations") == 0).alias("ok"),
    )


def unique_violations(
    df: DataFrame, cols: list[str], name: str | None = None
) -> DataFrame:
    """Rows beyond the first in each duplicate key group (0 = the key
    is unique). One exchange on the key."""
    name = name or f"unique({','.join(cols)})"
    # fully lazy: the total rides a one-row crossJoin, never a
    # driver-side count() at plan-build time
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("total"))
    extra = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).cast("long").alias("v"))
    )
    return extra.crossJoin(tot).select(
        F.lit(name).alias("constraint"),
        F.col("v").alias("violations"),
        "total",
        (F.col("v") == 0).alias("ok"),
    )


def fk_violations(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose non-null key has no parent (referential
    integrity). Parent is DISTINCT-projected to the key before the
    anti-join, so a dimension-sized parent broadcasts under AQE."""
    name = name or f"fk({col}->{parent_col})"
    tot = child.agg(F.count(F.lit(1)).cast("long").alias("total"))
    keys = parent.select(F.col(parent_col).alias(col)).distinct()
    orphans = (
        child.where(F.col(col).isNotNull())
        .select(col)
        .join(keys, col, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    return orphans.crossJoin(tot).select(
        F.lit(name).alias("constraint"),
        F.col("v").alias("violations"),
        "total",
        (F.col("v") == 0).alias("ok"),
    )


# --------------------------------------------------------------------------
# snapshot diff
# --------------------------------------------------------------------------

_NULL_SENTINEL = "<null>"


def row_digest(df: DataFrame, cols: list[str]) -> Column:
    """md5 over '\\x1f'-joined, null-sentineled string casts of
    ``cols`` — deterministic, engine-portable (DuckDB replays the
    identical expression; concat_ws would silently SKIP nulls and
    collide ('a',NULL,'b') with ('a','b',NULL))."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols
    ]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, F.lit("\x1f"), p)
    return F.md5(joined)


def table_diff(
    a: DataFrame, b: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """Content diff of two snapshots keyed by ``key_cols``: counts of
    added / removed / changed / same rows (b relative to a). Each side
    is pruned to key+digest before the FULL OUTER join on the key —
    one shuffle per side, no row text past the digest. Keys must be
    unique per side (pre-check with :func:`unique_violations`).
    Returns (status string, n bigint) — all four statuses always
    present (0-filled), so the output shape is fixed."""
    da = a.select(*key_cols, row_digest(a, compare_cols).alias("__ha"))
    db = b.select(*key_cols, row_digest(b, compare_cols).alias("__hb"))
    j = da.join(db, key_cols, "full_outer")
    status = (
        F.when(F.col("__ha").isNull(), "added")
        .when(F.col("__hb").isNull(), "removed")
        .when(F.col("__ha") != F.col("__hb"), "changed")
        .otherwise("same")
    )
    counts = j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    statuses = F.explode(
        F.array(*[F.lit(s) for s in ("added", "removed", "changed", "same")])
    ).alias("status")
    grid = a.sparkSession.range(1).select(statuses)
    return grid.join(counts, "status", "left").select(
        "status", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )

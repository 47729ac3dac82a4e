"""Zone maps as a first-class, persistable artifact: per-FILE min/max
statistics and the file-pruning read they enable — the data-skipping
machinery (Delta/Iceberg file stats, ClickHouse marks) that turns a
selective predicate over a 100 TB table into a scan of the few files
whose [min, max] interval can contain it.

Spark's parquet reader already prunes ROW GROUPS from footers, but
only while scanning every file's footer; an EXPLICIT zone-map table
moves that decision driver-side and ahead of the scan — at 100 TB
(millions of files on object storage) footer round-trips alone cost
minutes, and the zone map is one tiny table that answers "which files
can match" with a filter. The payoff multiplies with the layout work
(operators/layout.py): z-order clustering is precisely what makes
per-file min/max TIGHT on every clustered column.

Contracts:
- :func:`build_zone_map` is ONE scan of the table (min/max/count per
  file via input_file_name()); the artifact persists under the
  validated-index manifest (operators/dedup.py) like the engine's
  other indexes.
- :func:`prune_files` is CONSERVATIVE by construction: it keeps every
  file whose interval overlaps the predicate range (NULL bounds keep
  the file — all-NULL columns have no min/max), so a pruned read
  NEVER loses a matching row; equality with the full-scan filter is
  pinned randomized in pytest.
- :func:`read_pruned` re-applies the predicate after the file cut
  (pruning is file-granular, not row-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_zone_map(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file (file, n_rows, min_<c>, max_<c> ...) — one scan."""
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("file").agg(*aggs)


def write_zone_map(zone_map: DataFrame, path: str) -> dict:
    from prohap_spark.operators.dedup import write_dedup_index

    return write_dedup_index(zone_map, path)


def read_zone_map(spark: SparkSession, path: str) -> DataFrame:
    from prohap_spark.operators.dedup import read_dedup_index

    return read_dedup_index(spark, path)


def prune_files(zone_map: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min_col, max_col] interval can intersect
    [lo, hi] (either bound may be None = unbounded). Conservative:
    NULL stats keep the file. Returns the (bounded: one row per
    file) file list for an explicit-path read."""
    keep = F.lit(True)
    if lo is not None:
        keep = keep & (
            F.col(f"max_{col}").isNull() | (F.col(f"max_{col}") >= F.lit(lo))
        )
    if hi is not None:
        keep = keep & (
            F.col(f"min_{col}").isNull() | (F.col(f"min_{col}") <= F.lit(hi))
        )
    return [r["file"] for r in zone_map.where(keep).select("file").collect()]


def read_pruned(
    spark: SparkSession,
    zone_map: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """The pruned scan: explicit-path read of the surviving files,
    predicate re-applied row-exact. An empty survivor set returns an
    empty frame with the zone-mapped table's schema (derived from any
    one file — never a scan of all of them)."""
    files = prune_files(zone_map, col, lo, hi)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    if not files:
        any_file = [r["file"] for r in zone_map.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("empty zone map")
        return spark.read.parquet(any_file[0]).where(F.lit(False))
    return spark.read.parquet(*files).where(pred)

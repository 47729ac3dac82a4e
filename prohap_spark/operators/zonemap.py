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
- :func:`build_bloom_skip` / :func:`prune_files_bloom` /
  :func:`read_pruned_eq` (r13) are the EQUALITY-predicate twin:
  per-file Bloom words for point lookups on high-NDV unclustered
  columns, where min/max intervals prune nothing. No false negatives
  by the Bloom contract; false positives cost a wasted file read,
  never a wrong row.
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


def build_bloom_skip(
    spark: SparkSession, path: str, col: str, k: int = 3, m_bits: int = 4096
) -> DataFrame:
    """Per-file Bloom filter words for EQUALITY-predicate file
    skipping: (file, word_idx int, word long) — one scan, one
    map-side-combinable bit_or aggregate (functions/sketches.py's
    62-bit engine-portable words). The complement to min/max zone
    maps: a point lookup on a high-NDV column SCATTERED across files
    (no clustering) prunes nothing by interval — every file's
    [min, max] covers the key — but its Bloom bits miss in every file
    that never saw the key, cutting the read to ~n_match + fp·n_files
    files. Delta calls this a bloom filter index; Iceberg puts the
    same words in its file metadata. NULLs are skipped (equality never
    matches NULL). Artifact size: ceil(m_bits/62) words per file —
    at m=4096, 67 BIGINTs per file, a driver-tiny table even at
    millions of files."""
    from prohap_spark.functions.sketches import (
        BLOOM_WORD_BITS,
        bloom_hash_positions,
    )

    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    pos = df.where(F.col(col).isNotNull()).select(
        "file",
        F.explode(bloom_hash_positions(F.col(col), k, m_bits)).alias("__pos"),
    )
    return (
        pos.select(
            "file",
            F.expr(f"CAST((__pos div {BLOOM_WORD_BITS}) AS INT)").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(__pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("__mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.expr("bit_or(__mask)").alias("word"))
    )


def write_bloom_skip(bloom_map: DataFrame, path: str) -> dict:
    """Persist the per-file Bloom words under the validated-index
    manifest, like :func:`write_zone_map` — the artifact a stats/
    layout job ships so point-lookup planning never rebuilds it."""
    from prohap_spark.operators.dedup import write_dedup_index

    return write_dedup_index(bloom_map, path)


def read_bloom_skip(spark: SparkSession, path: str) -> DataFrame:
    from prohap_spark.operators.dedup import read_dedup_index

    return read_dedup_index(spark, path)


def prune_files_bloom(
    bloom_map: DataFrame, value, k: int = 3, m_bits: int = 4096
) -> list[str]:
    """Files whose Bloom filter has ALL ``k`` bits of ``value`` set.
    Conservative by the Bloom contract: a file CONTAINING the value
    always survives (no false negatives); a false-positive file costs
    one wasted footer/scan, never a wrong row (read_pruned_eq
    re-applies the predicate row-exact). Driver-side decision from
    the tiny words table — the same ahead-of-the-scan economics as
    :func:`prune_files`."""
    from prohap_spark.functions.sketches import (
        BLOOM_WORD_BITS,
        bloom_hash_positions,
    )

    spark = bloom_map.sparkSession
    pos = spark.range(1).select(
        F.explode(bloom_hash_positions(F.lit(value), k, m_bits)).alias("p")
    ).collect()
    need: dict[int, int] = {}
    for r in pos:
        w, b = divmod(int(r["p"]), BLOOM_WORD_BITS)
        need[w] = need.get(w, 0) | (1 << b)
    cond = None
    for w, m in need.items():
        c = (F.col("word_idx") == w) & (
            F.col("word").bitwiseAND(F.lit(m)) == F.lit(m)
        )
        cond = c if cond is None else cond | c
    hits = (
        bloom_map.where(cond)
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == len(need))
    )
    return [r["file"] for r in hits.select("file").collect()]


def read_pruned_eq(
    spark: SparkSession,
    bloom_map: DataFrame,
    col: str,
    value,
    k: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """The Bloom-pruned point lookup: explicit-path read of the
    surviving files, equality re-applied row-exact (pruning is
    file-granular and fp-tolerant). Empty survivor set returns an
    empty frame with the table's schema from any one file."""
    files = prune_files_bloom(bloom_map, value, k, m_bits)
    if not files:
        any_file = [r["file"] for r in bloom_map.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("empty bloom skip map")
        return spark.read.parquet(any_file[0]).where(F.lit(False))
    return spark.read.parquet(*files).where(F.col(col) == F.lit(value))


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


def append_zone_map(
    spark: SparkSession, path: str, zone_map: DataFrame, cols: list[str]
) -> DataFrame:
    """Incremental zone-map maintenance (r13): per-file stats are
    FILE-independent, so ingesting new files never rescans the mapped
    corpus — scan ONLY the files absent from the existing map and
    union their rows in (the append_trigram_index /
    column_stats_partials economics applied to the skipping layer).
    Equality with a from-scratch rebuild is pinned in pytest. At
    100 TB this is the difference between a stats refresh that reads
    kilobytes-per-new-file and one that reads the table. r14
    (ADVICE): the known-file filter is a broadcast LEFT ANTI join
    against the map's own file column — never a collected isin
    literal, whose plan size grows with file count and dies at the
    advertised millions-of-files scale. No broadcast hint: at small
    map sizes AQE broadcasts it anyway, and at millions of files a
    forced broadcast of the path list would be its own blow-up."""
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    known = zone_map.select("file").distinct()
    fresh = df.join(known, "file", "left_anti")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return zone_map.unionByName(fresh.groupBy("file").agg(*aggs))


def append_bloom_skip(
    spark: SparkSession,
    path: str,
    bloom_map: DataFrame,
    col: str,
    k: int = 3,
    m_bits: int = 4096,
) -> DataFrame:
    """Incremental Bloom-skip maintenance: same economics as
    :func:`append_zone_map` — per-file words are file-independent, so
    only files missing from the existing map are scanned and hashed.
    ``(k, m_bits)`` must match the existing map (the words are
    meaningless under different parameters); append == rebuild is
    pinned in pytest."""
    from prohap_spark.functions.sketches import (
        BLOOM_WORD_BITS,
        bloom_hash_positions,
    )

    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    # left-anti against the map's file column, not a collected isin
    # list (see append_zone_map)
    known = bloom_map.select("file").distinct()
    pos = (
        df.join(known, "file", "left_anti")
        .where(F.col(col).isNotNull())
        .select(
            "file",
            F.explode(bloom_hash_positions(F.col(col), k, m_bits)).alias("__pos"),
        )
    )
    fresh = (
        pos.select(
            "file",
            F.expr(f"CAST((__pos div {BLOOM_WORD_BITS}) AS INT)").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(__pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("__mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.expr("bit_or(__mask)").alias("word"))
    )
    return bloom_map.unionByName(fresh)

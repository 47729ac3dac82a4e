"""Z-order (Morton-curve) clustering for multi-dimensional data layout.

THE data-layout lever a 100 TB store has besides partitioning and
bucketing: a table sorted on ONE column prunes scans filtered on that
column and nothing else — every file spans the full range of every
other column. Interleaving the bits of k rank-quantized columns into
one Morton key and range-clustering files on that key gives every file
a small hyper-rectangle of the k-dim space (side ~ n^(-1/k) of each
domain), so parquet footer min/max stats prune scans filtered on ANY
of the k columns. That multi-column pruning is exactly what Delta's
OPTIMIZE ZORDER BY buys; here it is a from-scratch, engine-replayable
column expression (pure integer bit algebra — a SQL oracle reproduces
every key bit-for-bit).

Pieces:
- :func:`quantize_minmax` — exact-integer rank proxy: map an integer
  column onto [0, 2^bits) by linear min/max scaling (all-bigint
  arithmetic, so any engine agrees). Skewed columns can pre-rank via
  ntile instead; the interleave doesn't care how levels were made.
- :func:`zorder_key` — interleave k quantized columns (unrolled
  bit-test sum: JVM-side whole-stage-codegen arithmetic, no UDF).
- :func:`write_zorder_clustered` — repartitionByRange on the key +
  sortWithinPartitions + parquet write: each file owns a contiguous
  z-range = a tile of the space, which is what the footer stats then
  expose to pruning.
- :func:`zorder_tile_stats` — per fixed-width z-range tile: row count
  and each dimension's min/max span. The pruning model: a filter box
  must scan only tiles whose spans intersect it — computable
  deterministically without touching a filesystem, which is what the
  registered gate hashes (file-level evidence for the actual writer
  lives in pytest, where file boundaries may be sampling-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def quantize_minmax(
    df: DataFrame, col: str, bits: int, out: str
) -> DataFrame:
    """Add ``out``: ``col`` linearly mapped onto [0, 2^bits) using the
    column's own min/max — (v - min) * 2^bits // (max - min + 1), all
    exact BIGINT arithmetic. The min/max pair is a broadcast
    one-row aggregate (one extra reduction, no shuffle of df)."""
    mm = df.agg(
        F.min(F.col(col).cast("long")).alias("__mn"),
        F.max(F.col(col).cast("long")).alias("__mx"),
    )
    # exact BIGINT `div` (never double /+floor: a quotient landing
    # within one ulp of an integer would quantize off-by-one)
    q = F.expr(
        f"(CAST({col} AS BIGINT) - __mn) * {1 << bits} div (__mx - __mn + 1)"
    )
    return df.join(F.broadcast(mm)).withColumn(out, q).drop("__mn", "__mx")


def quantize_equidepth(
    df: DataFrame,
    col: str,
    bits: int,
    out: str,
    lo: float,
    hi: float,
    n_hist: int = 4096,
) -> DataFrame:
    """Add ``out``: an EQUI-DEPTH level in [0, 2^bits) — ~equal row
    count per level — derived from the qhist histogram instead of a
    global sort (ntile/percent_rank would single-task the order-by;
    this is one map-side-combinable aggregate + a broadcast of a
    <= n_hist-row bucket→level map). The answer for SKEWED z-order
    dimensions, where min/max scaling collapses most rows into a few
    levels and the Morton tiles stop being equi-populated: level =
    floor(cum_count_BEFORE_bucket · 2^bits / n), exact BIGINT
    arithmetic, accurate to the histogram's resolution. Ties beyond a
    level's fair share cannot be split by ANY rank method — a fine
    bucket holding p·n rows occupies ~p·2^bits consecutive level ids
    starting at its cum-before position; the non-tie mass still
    spreads evenly."""
    from prohap_spark.functions.sketches import qhist_bucket, qhist_build

    hist = qhist_build(df, [], col, lo, hi, n_hist)
    cum_w = Window.orderBy("__qb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = hist.agg(F.sum("__qn").alias("__n"))
    levels = (
        hist.withColumn("__cum", F.sum("__qn").over(cum_w))
        .join(F.broadcast(tot))
        .select(
            "__qb",
            F.expr(f"(__cum - __qn) * {1 << bits} div __n").alias(out),
        )
    )
    return df.withColumn(
        "__qb", qhist_bucket(F.col(col), lo, hi, n_hist)
    ).join(F.broadcast(levels), "__qb").drop("__qb")


def zorder_key(cols: list[str], bits: int = 8) -> Column:
    """Morton key of k quantized columns (each in [0, 2^bits)): bit i
    of column j lands at position i*k + j. Unrolled literal arithmetic
    — k*bits bit-tests, fully inside whole-stage codegen."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                (F.col(c).bitwiseAND(F.lit(1 << i)) != 0).cast("long")
                * F.lit(1 << (i * k + j))
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_decode(zkey: Column, k: int, bits: int = 8) -> Column:
    """Inverse of :func:`zorder_key`: array<long> of the k quantized
    coordinates recovered from a Morton key (bit i*k+j of the key is
    bit i of coordinate j). Same unrolled literal arithmetic; the
    roundtrip decode(encode(x)) == x is property-pinned in pytest —
    the key is information-preserving, so range/tile logic can always
    recover per-dimension bounds from key bounds."""
    coords = []
    for j in range(k):
        terms = []
        for i in range(bits):
            terms.append(
                (zkey.bitwiseAND(F.lit(1 << (i * k + j))) != 0).cast("long")
                * F.lit(1 << i)
            )
        c = terms[0]
        for t in terms[1:]:
            c = c + t
        coords.append(c)
    return F.array(*coords)


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """DuckDB replay of :func:`zorder_key` (same bit placement)."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        terms.append(
            f"list_sum(list_transform(range(0, {bits}), i -> "
            f"(CASE WHEN ({c} & (CAST(1 AS BIGINT) << CAST(i AS INT))) != 0 "
            f"THEN 1 ELSE 0 END) * "
            f"(CAST(1 AS BIGINT) << CAST(i * {k} + {j} AS INT))))"
        )
    return "(" + " + ".join(terms) + ")"


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Cluster-write: quantize each dim, compute the Morton key, range
    partition into ``n_files`` and sort within each, so every parquet
    file owns a contiguous z-range (a tile of the space) and its
    footer min/max on EVERY clustered column is tight."""
    q = df
    qcols = []
    for c in cols:
        qc = f"__q_{c}"
        q = quantize_minmax(q, c, bits, qc)
        qcols.append(qc)
    keyed = q.withColumn("__zkey", zorder_key(qcols, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *qcols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_tile_stats(
    df: DataFrame, cols: list[str], bits: int = 8, tile_shift: int | None = None,
    n_tiles: int = 64,
) -> DataFrame:
    """(tile long, n long, <c>_min/<c>_max per quantized dim): carve
    the z-range into ``n_tiles`` fixed-width tiles (tile = zkey >>
    shift — deterministic, unlike sampled range boundaries) and report
    each tile's row count and per-dimension quantized span. This IS
    the file-stats table a clustered write produces, in
    engine-replayable form: a filter box scans only tiles whose spans
    intersect it."""
    k = len(cols)
    total_bits = k * bits
    if tile_shift is None:
        shift = total_bits - (n_tiles - 1).bit_length()
    else:
        shift = tile_shift
    q = df
    qcols = []
    for c in cols:
        qc = f"__q_{c}"
        q = quantize_minmax(q, c, bits, qc)
        qcols.append(qc)
    keyed = q.withColumn("__zkey", zorder_key(qcols, bits)).withColumn(
        "tile", F.expr(f"__zkey div {1 << shift}")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, qc in zip(cols, qcols):
        aggs.append(F.min(qc).alias(f"{c}_min"))
        aggs.append(F.max(qc).alias(f"{c}_max"))
    return keyed.groupBy("tile").agg(*aggs)

"""Deterministic negative sampling for contrastive / embedding
training: every query document draws K pseudo-random negatives from
the corpus, reproducibly (same corpus, same picks — no ``rand()``),
via a hash pick against a distributed dense enumeration of the corpus.

The dense index is the scalable zipWithIndex: a GLOBAL row_number over
100 TB would serialize on one task, so documents are sharded by a
content-hash bucket, numbered WITHIN each shard in parallel (the
packing cumsum idiom), and lifted to a global dense [0, N) index by
adding per-shard offsets — an aggregate of ``n_shards`` rows that
cumsums driver-side-small and broadcasts back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from prohap_spark.functions.hashing import md5_bucket


def dense_index(df: DataFrame, id_col: str, n_shards: int = 16) -> DataFrame:
    """Assign every row a dense index in [0, N) in a deterministic
    pseudo-random order (md5 of the id), without a global sort: shard
    by md5 bucket, row_number within shard, plus the shard's cumulative
    offset. Returns (id_col, idx)."""
    idc = F.col(id_col)
    c = df.select(
        idc,
        md5_bucket(idc, n_shards).cast("int").alias("__shard"),
        F.md5(idc.cast("string")).alias("__okey"),
    )
    within = (
        F.row_number().over(
            Window.partitionBy("__shard").orderBy("__okey", id_col)
        )
        - 1
    )
    w = c.select(idc, "__shard", within.alias("__within"))
    # derive counts from the numbered branch (max within + 1) instead
    # of re-aggregating c: both sides then hang off the SAME shard
    # exchange (ReuseExchange), so the input is scanned and md5'd once
    counts = w.groupBy("__shard").agg((F.max("__within") + 1).alias("__n"))
    # n_shards rows: the offset cumsum is driver-scale by construction
    off = counts.select(
        "__shard",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return w.join(F.broadcast(off), "__shard").select(
        idc, (F.col("__off") + F.col("__within")).cast("long").alias("idx")
    )


def negative_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_col: str = "qid",
    k: int = 4,
    n_shards: int = 16,
    index: DataFrame | None = None,
) -> DataFrame:
    """For each row of ``queries`` (one ``query_col`` id per row) draw
    ``k`` deterministic pseudo-random negatives from ``corpus``:
    candidate index = md5(qid ":" rank) mod N probed against the dense
    corpus enumeration. A self-collision (the pick IS the query doc)
    is dropped rather than re-drawn, so a query may yield k-1 rows —
    re-drawing would need data-dependent iteration for a ~1/N event.
    Returns (query_col, neg_rank, neg_id). One equi-join on idx; the
    corpus total is a broadcast 1-row aggregate.

    Pass ``index`` (a persisted ``dense_index`` output, columns
    (id_col, idx)) to skip re-enumerating the corpus — the same
    persisted-artifact discipline as incremental dedup's
    ``exact_key_index``/``lsh_band_index``; recompute it only when
    the corpus changes (any insert/delete shifts the enumeration)."""
    ix = index if index is not None else dense_index(corpus, id_col, n_shards)
    # count from the CHEAP side: the corpus count is a pruned scan,
    # re-counting ix would re-execute the whole enumeration subplan;
    # with a persisted index the index itself is the cheap side
    tot = (corpus if index is None else index).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    ex = queries.select(
        F.col(query_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_rank"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(query_col).cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # try_mod, not %: under ANSI mode (the Spark 4 default) an empty
    # corpus would raise REMAINDER_BY_ZERO; try_mod yields null picks
    # that simply match nothing
    cand = ex.crossJoin(F.broadcast(tot)).select(
        query_col, "neg_rank", F.try_mod(h, F.col("__cnt")).alias("__cidx")
    )
    return (
        cand.join(ix, cand["__cidx"] == ix["idx"])
        .where(F.col(id_col) != F.col(query_col))
        .select(
            query_col,
            F.col("neg_rank").cast("int").alias("neg_rank"),
            F.col(id_col).alias("neg_id"),
        )
    )


def weighted_bottom_k(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    group — the Efraimidis–Spirakis A-Res scheme with the randomness
    replaced by the codebase's md5 fraction: each row draws
    u = md5frac(id) ∈ (0,1) and keys on u^(1/w); the k LARGEST keys
    are the sample. Inclusion probability is proportional-to-weight
    in the A-Res sense (a row with 2x the weight wins ~2x as often),
    reproducible across runs/partitionings because u is content-keyed
    — no rand(), the sampling_hash_split discipline.

    Mergeable like the KMV sketch (top-k by key is a semilattice):
    union shard samples and re-take the top k — exactly equal to a
    single-pass draw, so per-shard samples compose at 100 TB. One
    window shuffle per draw; weights <= 0 are excluded (their key
    would be 0). Returns group_cols + (id, weight, sample_rank).

    The float pow makes the KEY engine-specific (pow is not correctly
    rounded), so this is a library op, not an oracle-gated query —
    the pytest pins determinism, merge-equality, and the
    weight-proportional inclusion property instead."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    scored = df.where(F.col(weight_col) > 0).select(
        *group_cols,
        F.col(id_col),
        F.col(weight_col),
        key.alias("__wk"),
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__wk").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .select(*group_cols, id_col, weight_col, "sample_rank")
    )

"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
compute the dot product JVM-side with zip_with/aggregate (no Python in
the loop), rank with a per-query window. At scale the corpus side
stays partitioned; the only shuffle is the final per-query top-k,
whose input is already cut to k rows per partition by the window's
partial top-k sort.

Scale path: LSH bucketing with deterministic random hyperplanes
(signs derived from md5(plane|dim), so results are reproducible across
engines and runs). Probing multiple buckets trades recall for cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    """Double-precision sequential dot product of two float arrays —
    JVM-side higher-order functions, deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int,
    score_decimals: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query row, the k corpus
    rows with the highest cosine similarity. Ties broken by corpus id.
    Returns (query_id, corpus_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec")
    ).withColumn("__qnorm", _norm(F.col("__qvec")))
    c = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cvec")
    ).withColumn("__cnorm", _norm(F.col("__cvec")))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qnorm") * F.col("__cnorm"))
    )
    if score_decimals is not None:
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), score_decimals))
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cosine",
            "rank",
        )
    )


def hyperplane_bucket_expr(
    vec_col: str | Column, n_planes: int = 8, seed: str = "hp", max_dim: int = 4096
) -> Column:
    """Deterministic random-hyperplane LSH bucket: bit i = sign of the
    dot product with a ±1 hyperplane whose component for dimension d is
    +1 iff the first hex digit of md5('seed|plane|d') >= '8'.

    The md5-derived signs depend only on (seed, plane, dim), so they
    are PRECOMPUTED at plan-build time into one '0'/'1' string literal
    per plane (round 2 recomputed the md5 per row × dim × plane). The
    per-row work is a single transform+aggregate over the vector with a
    constant-string lookup. Vectors longer than ``max_dim`` raise at
    plan time rather than bucketing silently wrong.
    """
    import hashlib

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def plane_bit(p: int) -> Column:
        signs = "".join(
            "1"
            if hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[0] in "89abcdef"
            else "0"
            for d in range(max_dim)
        )
        signed = F.transform(
            v,
            lambda x, i: F.when(
                F.lit(signs).substr(i + 1, F.lit(1)) == "1", x.cast("double")
            ).otherwise(-x.cast("double")),
        )
        s = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    guard = F.when(
        F.size(v) > max_dim,
        F.raise_error(F.lit(f"hyperplane_bucket_expr: vector dim exceeds max_dim={max_dim}")),
    )
    return F.coalesce(guard, F.concat(*[plane_bit(p) for p in range(n_planes)]))


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int,
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate NN: bucket both sides with random hyperplanes and
    brute force only within shared buckets — an equi-join on the bucket
    key (the 100 TB path: no cross join, shuffle keyed on well-spread
    buckets).

    Multi-table LSH: ``n_tables`` independent hyperplane sets (distinct
    seeds); a pair is a candidate if it collides in ANY table. Collision
    probability per table is (1 - θ/π)^n_planes, so recall ≈
    1-(1-p)^L — one table is near-useless for moderate-similarity
    neighbors; L tables trade linear cost for exponential recall gain.
    Each row emits one (table, bucket) key per table (a posexplode, ×L
    rows into ONE shuffle — not L separate joins), candidates dedupe on
    (query, corpus) before scoring. Returns (query_id, corpus_id,
    cosine, rank)."""
    buckets = F.array(
        *[
            F.concat(
                F.lit(f"{t}:"),
                hyperplane_bucket_expr(vec_col, n_planes, seed=f"hp{t}"),
            )
            for t in range(n_tables)
        ]
    )
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.explode(buckets).alias("__bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        F.explode(buckets).alias("__bucket"),
    )
    # candidate ids: collide in >=1 table → dedupe BEFORE the dot
    # product so each pair is scored once
    cand = c.select("__cid", "__bucket").join(
        F.broadcast(q.select("__qid", "__bucket")), "__bucket"
    ).select("__qid", "__cid").distinct()
    qv = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec")
    ).withColumn("__qnorm", _norm(F.col("__qvec")))
    cv = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cvec")
    ).withColumn("__cnorm", _norm(F.col("__cvec")))
    scored = cand.join(cv, "__cid").join(F.broadcast(qv), "__qid").withColumn(
        "cosine", _dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qnorm") * F.col("__cnorm"))
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cosine",
            "rank",
        )
    )

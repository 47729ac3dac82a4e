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


def hyperplane_bucket_expr(vec_col: str | Column, n_planes: int = 8, seed: str = "hp") -> Column:
    """Deterministic random-hyperplane LSH bucket: bit i = sign of the
    dot product with a ±1 hyperplane whose component for dimension d is
    +1 iff the first hex digit of md5('seed|plane|d') >= '8'.

    Computed fully JVM-side: per plane, sum over dimensions of
    ±vec[d], then threshold at 0. Returns a bucket string of n bits.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dim_idx = F.sequence(F.lit(0), F.size(v) - 1)

    def plane_bit(p: int) -> Column:
        signed = F.transform(
            dim_idx,
            lambda d: F.when(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}|{p}|"), d.cast("string"))), 1, 1
                ).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                F.element_at(v, (d + 1).cast("int")).cast("double"),
            ).otherwise(-F.element_at(v, (d + 1).cast("int")).cast("double")),
        )
        s = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[plane_bit(p) for p in range(n_planes)])


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate NN: bucket both sides with random hyperplanes, brute
    force only within the shared bucket (equi-join on bucket — the
    100 TB path: no cross join, shuffle keyed on well-spread buckets).
    Recall < 1 by construction; increase recall with fewer planes or
    multi-probe. Returns (query_id, corpus_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        hyperplane_bucket_expr(vec_col, n_planes).alias("__bucket"),
    ).withColumn("__qnorm", _norm(F.col("__qvec")))
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        hyperplane_bucket_expr(vec_col, n_planes).alias("__bucket"),
    ).withColumn("__cnorm", _norm(F.col("__cvec")))
    scored = c.join(F.broadcast(q), "__bucket").withColumn(
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

"""Similarity search over the embeddings table (array<float> columns):
brute-force cosine top-k (baseline), hyperplane-LSH ANN (scale path),
and exploded per-dimension centroid analytics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.operators.similarity import cosine_topk, lsh_ann_topk
from prohap_spark.queries.registry import register, table

# double-precision sequential dot product in DuckDB (mirrors F.aggregate order)
_DUCK_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_DUCK_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@register(
    "sim_bruteforce_topk",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT q.qid, c.cid,
             round({_DUCK_DOT.format(a='q.qv', b='c.cv')} /
                   ({_DUCK_NORM.format(a='q.qv')} * {_DUCK_NORM.format(a='c.cv')}), 6) AS cosine
      FROM q, c
    ),
    ranked AS (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM scored
    )
    SELECT qid, cid, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5: broadcast the query set, JVM-side
    zip_with/aggregate dot product (double precision, deterministic
    order), per-query window top-k. Scores rounded to 6 before ranking
    so rank ties resolve identically across engines."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    c = e.where(F.col("vec_id") >= 10)
    out = cosine_topk(q, c, "vec_id", "vec_id", "embedding", k=5, score_decimals=6)
    # cosine_topk echoes both id columns under their source names
    # (identical here) — rename positionally
    return out.toDF("qid", "cid", "cosine", "rank")


@register("sim_lsh_ann")  # rows-only: bucketed ANN recall is approximate by design
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH ANN: 12 independent 4-plane tables
    bucket both sides; brute force only within shared buckets (ONE
    bucket equi-join over posexploded (table, bucket) keys — no cross
    join). The 100 TB path for similarity search; recall vs the
    brute-force baseline is pinned in tests/test_operators.py
    (test_lsh_ann_recall)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    c = e.where(F.col("vec_id") >= 10)
    out = lsh_ann_topk(
        q, c, "vec_id", "vec_id", "embedding", k=5, n_planes=4, n_tables=12
    )
    return out.toDF("qid", "cid", "cosine", "rank").withColumn(
        "cosine", F.round("cosine", 6)
    )


@register(
    "emb_centroid_cosine",
    f"""
    WITH e AS (
      SELECT vec_id, label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS d
      FROM embeddings
    ),
    cent AS (
      SELECT label, d, avg(CAST(x AS DOUBLE)) AS cx FROM e GROUP BY label, d
    ),
    joined AS (
      SELECT e.vec_id, e.label,
             sum(CAST(e.x AS DOUBLE) * c.cx) AS dot,
             sqrt(sum(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE))) AS vnorm,
             sqrt(sum(c.cx * c.cx)) AS cnorm
      FROM e JOIN cent c ON e.label = c.label AND e.d = c.d
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, round(dot / (vnorm * cnorm), 4) AS centroid_cosine
    FROM joined
    """,
)
def emb_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + each vector's cosine to its centroid —
    exploded per-dimension aggregation (the clustering-adjacent
    embedding analytics shape). Rounded to 4: the per-dimension avg and
    dot are reassociated sums, so last-ulp divergence vs the oracle is
    expected and tolerated at 1e-4."""
    e = table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("d", "x")
    ).withColumn("x", F.col("x").cast("double"))
    cent = ex.groupBy("label", "d").agg(F.avg("x").alias("cx"))
    joined = (
        ex.join(cent, ["label", "d"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("cx")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("vnorm"),
            F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("cnorm"),
        )
    )
    return joined.select(
        "vec_id",
        "label",
        F.round(F.col("dot") / (F.col("vnorm") * F.col("cnorm")), 4).alias("centroid_cosine"),
    )

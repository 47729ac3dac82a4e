"""Model-based quality filtering — the classifier stage of a curation
pipeline (the GPT-3 recipe: train a linear classifier on weak labels,
keep documents the model scores as high-quality). Built on Spark
MLlib's public API (HashingTF features + LogisticRegression), so
training and scoring are both distributed: feature hashing is a
map-side transform, L-BFGS aggregates gradients tree-wise, and the
scoring pass is one broadcast of the coefficient vector.

The 100 TB shape: the model is a single dense vector of
``num_features`` coefficients (2^14 doubles here — KBs), broadcast for
scoring; no stage materializes anything corpus-sized beyond the
feature rows themselves. Weak labels come from the repo's own JVM-side
heuristic quality score (top/bottom quantile cut), so no external
labeled data is required — exactly how production quality filters
bootstrap (label a slice with heuristics or a reference corpus, train,
then score everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from prohap_spark.functions.hashing import md5_bucket


def quality_classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 14,
    label_quantile: float = 0.25,
    train_pct: int = 80,
) -> DataFrame:
    """Train a logistic-regression quality classifier on weak labels
    and score EVERY document. Returns (id_col, weak_label, is_train,
    p_good, pred_good) where weak_label is 1/0 for the top/bottom
    ``label_quantile`` of the heuristic quality score (NULL for the
    unlabeled middle), is_train marks the md5-deterministic
    ``train_pct``% training slice of the labeled set, p_good is the
    model probability, and pred_good the 0.5-threshold decision.
    Held-out quality is pinned in tests (AUC on the labeled rows NOT
    in the training slice)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    from prohap_spark.functions import quality_score_expr

    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("text"),
        quality_score_expr(text_col).alias("__q"),
        (md5_bucket(F.col(id_col), 100) < train_pct).alias("is_train"),
    )
    quantiles = base.approxQuantile("__q", [label_quantile, 1.0 - label_quantile], 0.001)
    if len(quantiles) < 2:  # approxQuantile returns [] when every __q is NULL
        raise ValueError(
            "quality_classifier_scores: no non-null quality scores to label "
            "(empty corpus or all-null text)"
        )
    lo, hi = quantiles
    if lo == hi:
        raise ValueError(
            "quality_classifier_scores: degenerate quality distribution "
            f"(both label quantiles = {lo!r}); weak top/bottom-quantile labels "
            "would collapse into one class — widen label_quantile or fix the "
            "quality signal"
        )
    labeled = base.withColumn(
        "weak_label",
        F.when(F.col("__q") >= hi, F.lit(1.0))
        .when(F.col("__q") <= lo, F.lit(0.0)),
    )

    tok = Tokenizer(inputCol="text", outputCol="__words")
    tf = HashingTF(inputCol="__words", outputCol="__features", numFeatures=num_features)
    featured = tf.transform(tok.transform(labeled))

    # L-BFGS re-reads its input every iteration; persist ONLY the
    # (features, label) projection of the labeled train slice — at
    # corpus scale that is the hashed sparse vectors (~bounded by
    # num_features per row), never the document text
    train = featured.where(
        F.col("weak_label").isNotNull() & F.col("is_train")
    ).select("__features", "weak_label").persist()
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="weak_label",
        maxIter=25,
        regParam=0.01,
        standardization=False,
    )
    try:
        model = lr.fit(train)
    finally:
        train.unpersist()

    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featured)
    p_good = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        id_col,
        F.col("weak_label").cast("int").alias("weak_label"),
        "is_train",
        F.round(p_good, 6).alias("p_good"),
        (p_good >= 0.5).alias("pred_good"),
    )

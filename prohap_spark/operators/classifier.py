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


# ---------------------------------------------------------------------------
# Integer fixed-point linear probe — the deterministic, engine-replayable
# trainer (r8). The L-BFGS model above is the production-quality filter;
# its float iterations are engine artifacts no SQL oracle can replay, which
# keeps text_quality_classifier rows-only by design. This trainer is the
# pagerank_micro/sim_kmeans_ivf device applied to model fitting: squared-
# loss gradient descent where EVERY operation is exact integer arithmetic
# both engines evaluate identically (mul, add, truncating div — Spark
# `div` == DuckDB `//` toward zero, verified on negatives), so the learned
# weights are bit-identical under any partitioning and replay as unrolled
# DuckDB CTEs. Squared loss instead of logistic is the point, not a
# shortcut: the logistic sigmoid is a transcendental — exactly the
# portability class this repo banished from value gates.
# ---------------------------------------------------------------------------


FEAT_SCALE = 1_000_000  # feature micro-units (exact for |x| < ~9e12)
PRED_SHIFT = 20  # weights live in units of 2^-PRED_SHIFT per micro-feature
W_BOUND = 1 << 40  # fail-loud divergence guard


def linear_probe_train_micro(
    df: "DataFrame",
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 8,
    lr_shift: int = 6,
) -> list[int]:
    """Train integer weights w (one per feature column, units of
    2^-PRED_SHIFT per micro-unit feature) by full-batch gradient
    descent on squared loss over micro-unit targets (label*1e6).

    Per iteration: prediction p = (sum_j f_j*w_j) div 2^PRED_SHIFT
    (micro-units), per-row residual r = p - t, per-weight gradient
    G_j = sum_rows((r * f_j) div 2^PRED_SHIFT) — the per-row div keeps
    row terms ~2^22 so corpus sums stay far inside BIGINT and the sum
    is an exact commutative integer reduction (order/partitioning
    independent) — then w_j -= (G_j div n_rows) div 2^lr_shift.
    Returns the final weights; raises if any weight escapes W_BOUND
    (a diverging learning rate must fail loud, not wrap)."""
    n_rows = df.count()
    if n_rows == 0:
        raise ValueError("linear_probe_train_micro: empty training set")
    feats = [
        F.round(F.col(c).cast("double") * F.lit(float(FEAT_SCALE)), 0)
        .cast("long")
        .alias(f"__f{j}")
        for j, c in enumerate(feature_cols)
    ]
    t = F.round(F.col(label_col).cast("double") * F.lit(float(FEAT_SCALE)), 0).cast(
        "long"
    )
    base = df.select(*feats, t.alias("__t"))
    k = len(feature_cols)

    def trunc_div(a: int, b: int) -> int:
        """Truncation-toward-zero division — what Spark `div` and
        DuckDB `//` both do (python's // floors on negatives)."""
        q = abs(a) // b
        return q if a >= 0 else -q

    w = [0] * k
    for _ in range(n_iter):
        dot = sum(
            [F.col(f"__f{j}") * F.lit(int(wj)) for j, wj in enumerate(w)],
            F.lit(0).cast("long"),
        )
        proj = base.select(
            *[F.col(f"__f{j}") for j in range(k)],
            "__t",
            dot.alias("__dot"),
        ).withColumn("__r", F.expr(f"__dot div {1 << PRED_SHIFT}") - F.col("__t"))
        grads = proj.select(
            *[
                F.expr(f"(__r * __f{j}) div {1 << PRED_SHIFT}").alias(f"__g{j}")
                for j in range(k)
            ]
        )
        row = grads.agg(
            *[F.sum(f"__g{j}").alias(f"__G{j}") for j in range(k)]
        ).collect()[0]
        for j in range(k):
            gj = int(row[f"__G{j}"] or 0)
            w[j] -= trunc_div(trunc_div(gj, n_rows), 1 << lr_shift)
            if abs(w[j]) > W_BOUND:
                raise ValueError(
                    f"linear_probe_train_micro diverged: |w[{j}]| > {W_BOUND}; "
                    "lower lr_shift's implied rate or rescale features"
                )
    return w


def linear_probe_oracle_sql(
    table: str,
    feature_exprs: list[str],
    label_expr: str,
    n_iter: int = 8,
    lr_shift: int = 6,
) -> str:
    """Unrolled DuckDB replay of :func:`linear_probe_train_micro`
    (the pagerank/bpe-train device): weight state is ONE row of k
    columns per iteration CTE; every op mirrors the Spark trainer's
    integer arithmetic exactly, including truncating division via //
    (both engines truncate toward zero — verified on negatives).
    Returns SQL selecting (j, w) — one row per learned weight."""
    k = len(feature_exprs)
    ps = 1 << PRED_SHIFT
    fcols = ", ".join(
        f"CAST(round(CAST(({e}) AS DOUBLE) * {FEAT_SCALE}) AS BIGINT) AS f{j}"
        for j, e in enumerate(feature_exprs)
    )
    parts = [
        f"base AS MATERIALIZED (\n      SELECT {fcols},\n"
        f"        CAST(round(CAST(({label_expr}) AS DOUBLE) * {FEAT_SCALE}) AS BIGINT) AS t\n"
        f"      FROM {table}\n    )",
        "nn AS (SELECT count(*) AS n FROM base)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(k))
        + ")",
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        dot = " + ".join(f"b.f{j} * w.w{j}" for j in range(k))
        parts.append(
            f"p{i} AS MATERIALIZED (\n"
            f"      SELECT b.*, (({dot}) // {ps}) - b.t AS r\n"
            f"      FROM base b CROSS JOIN w{p} w\n    )"
        )
        gsel = ", ".join(
            f"CAST(sum((r * f{j}) // {ps}) AS BIGINT) AS g{j}" for j in range(k)
        )
        parts.append(f"g{i} AS MATERIALIZED (\n      SELECT {gsel} FROM p{i}\n    )")
        wsel = ", ".join(
            f"w.w{j} - ((g.g{j} // nn.n) // {1 << lr_shift}) AS w{j}"
            for j in range(k)
        )
        parts.append(
            f"w{i} AS MATERIALIZED (\n"
            f"      SELECT {wsel} FROM w{p} w CROSS JOIN g{i} g CROSS JOIN nn\n    )"
        )
    unions = "\n      UNION ALL ".join(
        f"SELECT {j} AS j, w{j} AS w FROM w{n_iter}" for j in range(k)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    {unions}"

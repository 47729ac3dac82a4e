"""Float-environment canary board (the r12 verdict's ask #2).

`sim_embedding_board` went driver-red in r11 AND r12 while hashing
byte-equal to the local DuckDB oracle under two Spark configurations —
proof that the local harness cannot falsify the driver's engine build
(its DuckDB version is unknown; local is 1.0.0). This board converts
that guesswork into measurement: each row hashes the result of EXACTLY
ONE environment-risky floating-point primitive, so if any future round
reds this board, the mismatching row(s) name the diverging primitive
on the driver's build. Every row is deterministic by construction on a
correct IEEE-754 engine (scalar expressions, sequential folds,
order-independent integer sums) — a red here is never reassociation
noise, it is a build difference.

Probes (one row each; val_i for integer-valued results, val_d for
doubles, the other column NULL):

- cast_2p53_p1 / cast_2p53_p3 — BIGINT→DOUBLE cast above 2^53 where
  rounding is forced: 2^53+1 rounds down (exactly representable
  neighbor), 2^53+3 is a tie that round-to-even sends UP to 2^53+4.
  The class the r12 centroid-leg gate depends on.
- hugeint_sum_cast — the same cast reached through each engine's SUM
  path (DuckDB sums BIGINT into HUGEINT; Spark into LONG): a cross-row
  integer sum is order-independent, so only the final cast can differ.
- round_half_pos / round_half_neg — round-half-away-from-zero on an
  EXACT .5 double (±4.5): Spark HALF_UP vs DuckDB half-away must
  agree, the `_micro_component` quantization contract.
- micro_half_odd — the micro-unit device's worst case: 99/128 is an
  exact double and ×1e6 lands EXACTLY on 773437.5; both engines must
  round it up to 773438.
- sqrt_exact — sqrt of the r12 red's measured ssc magnitude
  (8.4e9): one correctly-rounded IEEE op on an exact integer cast.
- div_chain — the r12 red's full hashed expression shape with its
  measured accumulator magnitudes: dot/(sqrt(ssx)·sqrt(ssc)) =
  4.1e8/(sqrt(1.0e8)·sqrt(8.4e9)). If the driver reds THIS row, the
  two-round sim_embedding_board mystery is solved by name.
- seq_fold_sum — a 64-term harmonic partial sum as a PINNED-ORDER
  left fold (Spark F.aggregate vs DuckDB list_reduce): 63 dependent
  double additions, the per-list-fold class every brute/ANN gate's
  ordering uses.
- float32_widen — REAL→DOUBLE widening of 0.1 (exact in IEEE:
  0.10000000149011612), the embeddings-column ingest cast.
- round6_inexact — round(1/3, 6): the ordering-only rounding op the
  ANN gates retain.
- repr_17sig — 0.1+0.2 = 0.30000000000000004: exercises the full
  17-significant-digit fetch/normalization path (each engine's
  float→Python conversion feeds repr() in the harness).

Registered r13 mid-registry (new_waiting lane — fronts r14 per
rotation rule (a); the r13 front was already at its 50 budget with
the rule-(b) red + 6 rule-(a) boards + 44 rule-(c) obligations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.queries.registry import register

_P53 = 9007199254740992  # 2^53


def _row(spark: SparkSession, probe: str, val_i=None, val_d=None) -> DataFrame:
    ni = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    return spark.range(1).select(
        F.lit(probe).alias("probe"),
        (val_i if val_i is not None else ni).cast("long").alias("val_i"),
        (val_d if val_d is not None else nd).cast("double").alias("val_d"),
    )


@register(
    "float_env_canary",
    f"""
    WITH s AS (SELECT CAST(unnest([{_P53 + 1}, 2]) AS BIGINT) AS v)
    SELECT 'cast_2p53_p1' AS probe, CAST(NULL AS BIGINT) AS val_i,
           CAST(CAST({_P53 + 1} AS BIGINT) AS DOUBLE) AS val_d
    UNION ALL SELECT 'cast_2p53_p3', NULL,
           CAST(CAST({_P53 + 3} AS BIGINT) AS DOUBLE)
    UNION ALL SELECT 'hugeint_sum_cast', NULL,
           (SELECT CAST(sum(v) AS DOUBLE) FROM s)
    UNION ALL SELECT 'round_half_pos',
           CAST(round(CAST(4.5 AS DOUBLE), 0) AS BIGINT), NULL
    UNION ALL SELECT 'round_half_neg',
           CAST(round(CAST(-4.5 AS DOUBLE), 0) AS BIGINT), NULL
    UNION ALL SELECT 'micro_half_odd',
           CAST(round(CAST(99 AS DOUBLE) / CAST(128 AS DOUBLE)
                      * CAST(1000000 AS DOUBLE), 0) AS BIGINT), NULL
    UNION ALL SELECT 'sqrt_exact', NULL,
           sqrt(CAST(CAST(8400000000 AS BIGINT) AS DOUBLE))
    UNION ALL SELECT 'div_chain', NULL,
           CAST(CAST(410000000 AS BIGINT) AS DOUBLE) /
             (sqrt(CAST(CAST(100000000 AS BIGINT) AS DOUBLE)) *
              sqrt(CAST(CAST(8400000000 AS BIGINT) AS DOUBLE)))
    UNION ALL SELECT 'seq_fold_sum', NULL,
           list_reduce(
             list_transform(range(1, 65),
                            i -> CAST(1 AS DOUBLE) / CAST(i AS DOUBLE)),
             (a, b) -> a + b)
    UNION ALL SELECT 'float32_widen', NULL,
           CAST(CAST(0.1 AS REAL) AS DOUBLE)
    UNION ALL SELECT 'round6_inexact', NULL,
           round(CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE), 6)
    UNION ALL SELECT 'repr_17sig', NULL,
           CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)
    """,
)
def float_env_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per environment-risky float primitive — see the module
    docstring. Reads no table on purpose: every value is computed by
    the engine's own scalar/fold/sum machinery from literals, so a
    hash mismatch isolates a BUILD divergence, never data layout."""
    big = F.lit(_P53 + 1).cast("long")
    big3 = F.lit(_P53 + 3).cast("long")
    sum_cast = (
        spark.range(1)
        .select(F.explode(F.array(big, F.lit(2).cast("long"))).alias("v"))
        .agg(F.sum("v").cast("double").alias("val_d"))
        .select(
            F.lit("hugeint_sum_cast").alias("probe"),
            F.lit(None).cast("long").alias("val_i"),
            "val_d",
        )
    )
    d = F.lit(1.0)
    rows = [
        _row(spark, "cast_2p53_p1", val_d=big.cast("double")),
        _row(spark, "cast_2p53_p3", val_d=big3.cast("double")),
        sum_cast,
        _row(spark, "round_half_pos", val_i=F.round(F.lit(4.5).cast("double"), 0)),
        _row(spark, "round_half_neg", val_i=F.round(F.lit(-4.5).cast("double"), 0)),
        _row(
            spark,
            "micro_half_odd",
            val_i=F.round(
                F.lit(99).cast("double") / F.lit(128).cast("double") * F.lit(1000000.0),
                0,
            ),
        ),
        _row(spark, "sqrt_exact", val_d=F.sqrt(F.lit(8400000000).cast("double"))),
        _row(
            spark,
            "div_chain",
            val_d=F.lit(410000000).cast("double")
            / (
                F.sqrt(F.lit(100000000).cast("double"))
                * F.sqrt(F.lit(8400000000).cast("double"))
            ),
        ),
        _row(
            spark,
            "seq_fold_sum",
            val_d=F.aggregate(
                F.sequence(F.lit(1), F.lit(64)),
                F.lit(0.0),
                lambda a, i: a + d / i.cast("double"),
            ),
        ),
        _row(spark, "float32_widen", val_d=F.lit(0.1).cast("float").cast("double")),
        _row(
            spark,
            "round6_inexact",
            val_d=F.round(F.lit(1).cast("double") / F.lit(3).cast("double"), 6),
        ),
        _row(
            spark,
            "repr_17sig",
            val_d=F.lit(0.1).cast("double") + F.lit(0.2).cast("double"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out

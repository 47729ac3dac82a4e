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

r13-tail extension — ENGINE-SEMANTICS rows (val_s VARCHAR), because a
driver-build divergence need not be floating-point: every gate leans
on a handful of string/temporal primitives whose cross-engine
agreement is assumed, never probed. One row per primitive, all
verified agreeing locally (Spark 4.1.2 vs DuckDB 1.0.0):

- md5_empty — the digest idiom's degenerate input.
- sort_binary — array sort order over ['b','A','a','Z','0']: every
  string_agg(ORDER BY)/sort_array gate assumes BINARY collation
  ('0,A,Z,a,b'); a locale-collated build would re-order silently.
- substr_1based — 1-based substring indexing (the md5-window fold's
  core assumption).
- split_empty_tokens — splitting 'a  b' on ' ' keeps the interior
  empty token in BOTH engines ('a||b'); the tokenization gates'
  string_split/F.split equivalence rests on it.
- regexp_global — regexp_replace is global-by-default in Spark and
  explicit-'g' in DuckDB; the PII/token gates assume both strip ALL
  matches ('a1b2c3' -> '123').
- int_to_string — negative BIGINT casts to VARCHAR without a sign
  surprise ('x-42y'); lpad zero-fill ('007').
- date_diff_days — DATE subtraction in days (TZ-free on purpose:
  timestamps route through each session's zone, dates don't).

Registered r13 mid-registry (new_waiting lane — fronts r14 per
rotation rule (a); the r13 front was already at its 50 budget with
the rule-(b) red + 6 rule-(a) boards + 44 rule-(c) obligations).

r14-tail extension — ORACLE-DIALECT rows, because the r13 verdict's
sharpest lead on the three-round sim_embedding_board red is a DuckDB
dialect (the struct-literal-in-lambda explode), not arithmetic. The
r14 board fix retires that dialect everywhere; these rows probe it
(and its replacements) in isolation on the driver's build, so a
recurrence gets named:

- struct_lambda_explode — sum(d·xq) over
  `unnest(list_transform(range(1,4), d -> {'d': d, 'xq': d*10}))`
  (=140): the retired dialect itself. If the driver's DuckDB
  misbinds/reorders lambda-built struct fields, this row reds and
  the r11-r13 mystery is solved by name.
- gensub_zip — sum(d·x) over `generate_subscripts + unnest` (=50):
  the replacement idiom every rewritten ANN oracle now rides.
- int_div_trunc — (12345678901·1e6) div 37 (=333666997324324):
  Spark `div` == DuckDB `//` on positive BIGINTs, the
  text_preference_pairs fixed-point key's one load-bearing op."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.queries.registry import register

_P53 = 9007199254740992  # 2^53


def _row(
    spark: SparkSession, probe: str, val_i=None, val_d=None, val_s=None
) -> DataFrame:
    ni = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    ns = F.lit(None).cast("string")
    return spark.range(1).select(
        F.lit(probe).alias("probe"),
        (val_i if val_i is not None else ni).cast("long").alias("val_i"),
        (val_d if val_d is not None else nd).cast("double").alias("val_d"),
        (val_s if val_s is not None else ns).cast("string").alias("val_s"),
    )


@register(
    "float_env_canary",
    f"""
    WITH s AS (SELECT CAST(unnest([{_P53 + 1}, 2]) AS BIGINT) AS v)
    SELECT 'cast_2p53_p1' AS probe, CAST(NULL AS BIGINT) AS val_i,
           CAST(CAST({_P53 + 1} AS BIGINT) AS DOUBLE) AS val_d,
           CAST(NULL AS VARCHAR) AS val_s
    UNION ALL SELECT 'cast_2p53_p3', NULL,
           CAST(CAST({_P53 + 3} AS BIGINT) AS DOUBLE), NULL
    UNION ALL SELECT 'hugeint_sum_cast', NULL,
           (SELECT CAST(sum(v) AS DOUBLE) FROM s), NULL
    UNION ALL SELECT 'round_half_pos',
           CAST(round(CAST(4.5 AS DOUBLE), 0) AS BIGINT), NULL, NULL
    UNION ALL SELECT 'round_half_neg',
           CAST(round(CAST(-4.5 AS DOUBLE), 0) AS BIGINT), NULL, NULL
    UNION ALL SELECT 'micro_half_odd',
           CAST(round(CAST(99 AS DOUBLE) / CAST(128 AS DOUBLE)
                      * CAST(1000000 AS DOUBLE), 0) AS BIGINT), NULL, NULL
    UNION ALL SELECT 'sqrt_exact', NULL,
           sqrt(CAST(CAST(8400000000 AS BIGINT) AS DOUBLE)), NULL
    UNION ALL SELECT 'div_chain', NULL,
           CAST(CAST(410000000 AS BIGINT) AS DOUBLE) /
             (sqrt(CAST(CAST(100000000 AS BIGINT) AS DOUBLE)) *
              sqrt(CAST(CAST(8400000000 AS BIGINT) AS DOUBLE))), NULL
    UNION ALL SELECT 'seq_fold_sum', NULL,
           list_reduce(
             list_transform(range(1, 65),
                            i -> CAST(1 AS DOUBLE) / CAST(i AS DOUBLE)),
             (a, b) -> a + b), NULL
    UNION ALL SELECT 'float32_widen', NULL,
           CAST(CAST(0.1 AS REAL) AS DOUBLE), NULL
    UNION ALL SELECT 'round6_inexact', NULL,
           round(CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE), 6), NULL
    UNION ALL SELECT 'repr_17sig', NULL,
           CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE), NULL
    UNION ALL SELECT 'md5_empty', NULL, NULL, md5('')
    UNION ALL SELECT 'sort_binary', NULL, NULL,
           array_to_string(list_sort(['b','A','a','Z','0']), ',')
    UNION ALL SELECT 'substr_1based', NULL, NULL, substr('hello', 2, 3)
    UNION ALL SELECT 'split_empty_tokens', NULL, NULL,
           array_to_string(string_split('a  b', ' '), '|')
    UNION ALL SELECT 'regexp_global', NULL, NULL,
           regexp_replace('a1b2c3', '[^0-9]', '', 'g')
    UNION ALL SELECT 'int_to_string', NULL, NULL,
           concat('x', CAST(CAST(-42 AS BIGINT) AS VARCHAR), 'y')
    UNION ALL SELECT 'lpad_zero', NULL, NULL,
           lpad(CAST(7 AS VARCHAR), 3, '0')
    UNION ALL SELECT 'date_diff_days',
           CAST(DATE '2024-02-29' - DATE '2000-01-01' AS BIGINT),
           NULL, NULL
    UNION ALL SELECT 'struct_lambda_explode',
           (SELECT CAST(sum(e.d * e.xq) AS BIGINT) FROM (
              SELECT unnest(list_transform(range(1, 4),
                            d -> {{'d': d, 'xq': d * 10}})) AS e)),
           NULL, NULL
    UNION ALL SELECT 'gensub_zip',
           (SELECT CAST(sum(d * x) AS BIGINT) FROM (
              SELECT generate_subscripts([7,8,9], 1) AS d,
                     unnest([7,8,9]) AS x)),
           NULL, NULL
    UNION ALL SELECT 'int_div_trunc',
           CAST((CAST(12345678901 AS BIGINT) * 1000000) // 37 AS BIGINT),
           NULL, NULL
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
            F.lit(None).cast("string").alias("val_s"),
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
        _row(spark, "md5_empty", val_s=F.md5(F.lit(""))),
        _row(
            spark,
            "sort_binary",
            val_s=F.array_join(
                F.sort_array(F.array(*[F.lit(x) for x in ["b", "A", "a", "Z", "0"]])),
                ",",
            ),
        ),
        _row(spark, "substr_1based", val_s=F.substring(F.lit("hello"), 2, 3)),
        _row(
            spark,
            "split_empty_tokens",
            val_s=F.array_join(F.split(F.lit("a  b"), " "), "|"),
        ),
        _row(
            spark,
            "regexp_global",
            val_s=F.regexp_replace(F.lit("a1b2c3"), "[^0-9]", ""),
        ),
        _row(
            spark,
            "int_to_string",
            val_s=F.concat(
                F.lit("x"), F.lit(-42).cast("long").cast("string"), F.lit("y")
            ),
        ),
        _row(spark, "lpad_zero", val_s=F.lpad(F.lit(7).cast("string"), 3, "0")),
        _row(
            spark,
            "date_diff_days",
            val_i=F.datediff(F.lit("2024-02-29").cast("date"), F.lit("2000-01-01").cast("date")),
        ),
        # r14 dialect rows: Spark computes the same VALUE through its
        # own fold machinery — the probe is whether the driver's
        # DuckDB build evaluates the named dialect to the same number
        _row(
            spark,
            "struct_lambda_explode",
            val_i=F.aggregate(
                F.sequence(F.lit(1), F.lit(3)),
                F.lit(0).cast("long"),
                lambda a, i: a + (i * i * 10).cast("long"),
            ),
        ),
        _row(
            spark,
            "gensub_zip",
            val_i=F.aggregate(
                F.zip_with(
                    F.sequence(F.lit(1), F.lit(3)),
                    F.array(F.lit(7), F.lit(8), F.lit(9)),
                    lambda d, x: (d * x).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            ),
        ),
        _row(
            spark,
            "int_div_trunc",
            val_i=F.expr("(12345678901L * 1000000L) div 37L"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out

"""Deterministic, engine-replayable cardinality sketch (HyperLogLog).

Spark's ``approx_count_distinct`` is a real HLL but its registers are
engine-internal: no SQL oracle can replay them, so the capability sat
rows-only (``agg_approx_sketches``). This module is the from-scratch
twin built ONLY from operations both engines evaluate identically —
md5, integer div/mod/shift, ``bin()`` string length, max/sum
aggregates — so a per-group HLL estimate value-hashes bit-for-bit
against a DuckDB replay (the Flajolet-Fuso-Gandouet-Meunier 2007
estimator; public method).

Determinism and exactness, piece by piece:
- the 60-bit value hash is the codebase's standard
  ``conv(substr(md5(v), 1, 15), 16, 10)`` (exact: 15 hex digits
  < 2^60);
- register index = h mod 64 (m = 64 registers, p = 6), the remaining
  54 bits feed the rank: rho = 55 - bitlen(w), computed via
  ``length(bin(w))`` — both engines print minimal binary;
- the harmonic-mean denominator sum(2^-M_j) is NOT exact in doubles
  (adding 2^-55 to ~1 rounds), so it is scaled to INTEGERS instead:
  ranks cap at 41 and each register contributes 2^(41 - min(M_j, 41))
  — max 64 * 2^41 < 2^47, an exact BIGINT sum under any order. The
  cap only binds when one register sees ~2^41 distinct values (never
  at any realistic per-register load), and even then identically in
  both engines;
- the estimate is a pure integer division: alpha_64 * m^2 * 2^41
  precomputed as ONE exact integer literal (fits: ~6.4e15), divided
  by the register sum — BIGINT in, BIGINT out, no float anywhere in
  the gated value.

This is the RAW HLL estimator: the small-range linear-counting
correction needs ln() (a transcendental — exactly the portability
class this repo banished from hash gates), so it is deliberately
omitted and the zero-register count is emitted beside the estimate
for any consumer that wants to apply it. Accuracy for m = 64 is
~1.04/sqrt(64) ≈ 13% relative error (pinned in tests).

Scale shape: two hash aggregates — (group, register) max-rank, then
per-group sum — both map-side combinable; register state is 64 rows
per group, never the values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

M = 64  # registers (p = 6)
RANK_CAP = 41
ALPHA_NUM = int(round(0.709 * M * M * (1 << RANK_CAP)))  # alpha_64 m^2 2^41


def _rank_cols(value: Column) -> tuple[Column, Column]:
    """(register, rank) of one value under the 60-bit md5 hash."""
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    reg = F.pmod(h, F.lit(M)).cast("int")
    w = F.shiftright(h, 6)
    rank = F.when(w == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(w))
    ).cast("int")
    return reg, rank


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group deterministic HLL: returns group_cols +
    (hll_est BIGINT, hll_zero_registers INT). Every intermediate is an
    exact integer, so the result is identical on any partitioning and
    replayable by :func:`hll_oracle_sql` in DuckDB."""
    reg, rank = _rank_cols(F.col(value_col))
    regs = (
        df.select(*group_cols, reg.alias("__reg"), rank.alias("__rank"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__m"))
    )
    t = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {RANK_CAP} - "
        f"CAST(least(__m, {RANK_CAP}) AS INT))"
    )
    per = regs.groupBy(*group_cols).agg(
        F.sum(t).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    return per.select(
        *group_cols,
        F.expr(
            f"CAST({ALPHA_NUM} AS BIGINT) div (__s_present + "
            f"(CAST({M} AS BIGINT) - __n_present) * CAST({1 << RANK_CAP} AS BIGINT))"
        ).alias("hll_est"),
        (F.lit(M) - F.col("__n_present")).cast("int").alias("hll_zero_registers"),
    )


def hll_oracle_sql(
    table: str, group_col: str, value_col: str, extra_select: str = ""
) -> str:
    """DuckDB replay of :func:`hll_distinct` over ``table`` grouped by
    one column — same hash, same integer arithmetic, same division.
    ``extra_select`` may add exact aggregates computed from the same
    table (joined back on the group key)."""
    return f"""
    WITH hh AS (
      SELECT {group_col},
             list_reduce(list_transform(range(1, 16),
               i -> CAST(strpos('0123456789abcdef',
                    substr(md5(CAST({value_col} AS VARCHAR)), i, 1)) - 1
                    AS BIGINT)),
               (a, b) -> a * 16 + b) AS h
      FROM {table}
    ),
    rr AS (
      SELECT {group_col}, CAST(h % {M} AS INT) AS reg,
             CASE WHEN (h >> 6) = 0 THEN 55
                  ELSE 55 - length(bin(h >> 6)) END AS rank
      FROM hh
    ),
    mm AS (
      SELECT {group_col}, reg, max(rank) AS m
      FROM rr GROUP BY 1, 2
    ),
    ss AS (
      SELECT {group_col},
             CAST(sum(CAST(1 AS BIGINT) << ({RANK_CAP} - least(m, {RANK_CAP})))
                  AS BIGINT) AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
      FROM mm GROUP BY 1
    )
    SELECT {group_col}{extra_select},
           CAST({ALPHA_NUM} // (s_present +
                ({M} - n_present) * CAST({1 << RANK_CAP} AS BIGINT))
                AS BIGINT) AS hll_est,
           CAST({M} - n_present AS INT) AS hll_zero_registers
    FROM ss
    """

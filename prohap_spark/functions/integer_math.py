"""Integer fixed-point natural log — ZERO float operations anywhere.

``functions/portable_math.py`` made the micro-nat gates' doubles
bit-identical BY IEEE CONSTRUCTION, and the local checker agreed —
yet the driver hashed them red two rounds running, so r8 removed
doubles from the gated PROJECTIONS. This module removes floats from
the DERIVATION too: ``iln_fp`` computes ``round(ln(n) * 2^30)`` for a
positive BIGINT using only integer multiply / add / truncating
divide / shifts / ``length(bin(..))`` — operations whose cross-engine
equality is INTEGER semantics, not float conformance (all verified on
this box, including negative-operand ``div`` vs ``//`` and arithmetic
right shift). If two engines disagree on these, they disagree on
arithmetic itself.

Algorithm (atanh series in fixed point, scale 2^30):
- bit length L = length(bin(n)); normalize M = n * 2^(31-L) into
  [2^30, 2^31) — a shift either way (the down-shift truncates low
  bits: ≤ 2^-31 relative, identically in both engines);
- t = ((M - FP) * FP) div (M + FP)  ∈ [0, FP/3] — the ONE general
  integer division (Spark ``div`` == DuckDB ``//``);
- ln(m) = 2 t (1 + u/3 + u²/5 + ... ), u = t²/FP, as a 10-term Horner
  with precomputed truncated 1/(2k+1) fixed-point constants and
  divisions by FP as right shifts (every intermediate ≤ ~2^59);
- ln(n)·2^30 = (L-1)·LN2_FP + 2·S, with LN2_FP a build-time integer
  literal emitted identically into both engines.

Accuracy vs true ln: ~2e-8 relative (series tail 1e-11 + ~13
truncations × 2^-30 + normalization 2^-31), pinned in tests — far
inside the 5e-7 distance a micro-nat rounding boundary requires. But
accuracy is the SECONDARY property: the primary one is that both
engines compute the exact same integers by construction.

Magnitude discipline (BIGINT never overflows): t ≤ FP/3 ≈ 3.6e8;
t², u·h, t·H ≤ ~2^59; Δln·1e6 ≤ ln(2^62)·2^30·1e6 ≈ 4.7e16.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

FP_SHIFT = 30
FP = 1 << FP_SHIFT
LN2_FP = round(math.log(2) * FP)  # 744261118 — build-time literal
N_TERMS = 10  # Horner coefficients 1/3 .. 1/21; tail (1/9)^10/21 ~ 1e-11
_INV_FP = {k: FP // k for k in range(3, 2 * N_TERMS + 2, 2)}


class _IColOps:
    def lit(self, i: int):
        return F.lit(i).cast("long")

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, b):
        return a * b

    def idiv(self, a, b):
        return F.call_function("div", a, b)

    def shr(self, a, bits: int):
        return F.call_function("shiftright", a, F.lit(bits))

    def shl_e(self, a, amt):
        return F.call_function("shiftleft", a, amt.cast("int"))

    def shr_e(self, a, amt):
        return F.call_function("shiftright", a, amt.cast("int"))

    def bitlen(self, a):
        return F.length(F.bin(a)).cast("long")

    def if_gt(self, a, b, then, otherwise):
        return F.when(a > b, then).otherwise(otherwise)

    def bind(self, val, fn):
        # let-binding via a 1-element higher-order lambda (the
        # portable_math device): the bound value appears once in the
        # tree regardless of how many times fn references it
        return F.element_at(F.transform(F.array(val), fn), 1)


class _ISqlOps:
    def __init__(self):
        self._n = 0

    def lit(self, i: int):
        return f"CAST({i} AS BIGINT)"

    def add(self, a, b):
        return f"({a} + {b})"

    def sub(self, a, b):
        return f"({a} - {b})"

    def mul(self, a, b):
        return f"({a} * {b})"

    def idiv(self, a, b):
        return f"({a} // {b})"

    def shr(self, a, bits: int):
        return f"({a} >> {bits})"

    def shl_e(self, a, amt):
        return f"({a} << CAST({amt} AS INT))"

    def shr_e(self, a, amt):
        return f"({a} >> CAST({amt} AS INT))"

    def bitlen(self, a):
        return f"CAST(length(bin({a})) AS BIGINT)"

    def if_gt(self, a, b, then, otherwise):
        return f"(CASE WHEN {a} > {b} THEN {then} ELSE {otherwise} END)"

    def bind(self, val, fn):
        self._n += 1
        var = f"__im{self._n}"
        return f"list_transform([{val}], {var} -> {fn(var)})[1]"


def _iln_fp(o, n0):
    """Fixed-point ln: expression for round-ish(ln(n) * 2^30), n >= 1."""

    def with_n(nn):
        def with_l(l):
            m_expr = o.if_gt(
                l,
                o.lit(31),
                o.shr_e(nn, o.sub(l, o.lit(31))),
                o.shl_e(nn, o.sub(o.lit(31), l)),
            )

            def with_m(mm):
                t_expr = o.idiv(
                    o.mul(o.sub(mm, o.lit(FP)), o.lit(FP)),
                    o.add(mm, o.lit(FP)),
                )

                def with_t(tt):
                    u_expr = o.shr(o.mul(tt, tt), FP_SHIFT)

                    def with_u(uu):
                        h = o.lit(_INV_FP[2 * N_TERMS + 1])
                        for k in range(N_TERMS - 1, 0, -1):
                            h = o.add(
                                o.lit(_INV_FP[2 * k + 1]),
                                o.shr(o.mul(uu, h), FP_SHIFT),
                            )
                        big_h = o.add(o.lit(FP), o.shr(o.mul(uu, h), FP_SHIFT))
                        s = o.shr(o.mul(tt, big_h), FP_SHIFT)
                        return o.add(
                            o.mul(o.sub(l, o.lit(1)), o.lit(LN2_FP)),
                            o.mul(o.lit(2), s),
                        )

                    return o.bind(u_expr, with_u)

                return o.bind(t_expr, with_t)

            return o.bind(m_expr, with_m)

        return o.bind(o.bitlen(nn), with_l)

    return o.bind(n0, with_n)


def iln_fp_col(n: Column) -> Column:
    """Fixed-point ln(n)·2^30 of a positive-BIGINT Column — every
    operation integer, identical to :func:`iln_fp_sql` in DuckDB."""
    return _iln_fp(_IColOps(), n)


def iln_fp_sql(n_expr: str) -> str:
    return _iln_fp(_ISqlOps(), n_expr)


class _IPyOps:
    """Pure-Python twin of the Column/SQL ops: runs the SAME abstract
    algorithm on plain ints, so driver-side or Arrow-batch Python code
    (e.g. the streaming HLL's state finisher) derives the identical
    integers the JVM and DuckDB derive. Operands are nonnegative in
    _iln_fp, so ``//`` and ``>>`` match Spark div / shiftright."""

    def lit(self, i):
        return i

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, b):
        return a * b

    def idiv(self, a, b):
        return a // b

    def shr(self, a, bits):
        return a >> bits

    def shl_e(self, a, amt):
        # eager evaluation computes BOTH if_gt branches; the discarded
        # one can carry a negative amount (symbolic backends never
        # execute it) — clamp so Python doesn't raise on the dead value
        return a << max(amt, 0)

    def shr_e(self, a, amt):
        return a >> max(amt, 0)

    def bitlen(self, a):
        return a.bit_length()

    def if_gt(self, a, b, then, otherwise):
        return then if a > b else otherwise

    def bind(self, val, fn):
        return fn(val)


def iln_fp_int(n: int) -> int:
    """Fixed-point ln(n)·2^30 of a positive int — bit-identical to
    :func:`iln_fp_col` / :func:`iln_fp_sql` (pinned in
    tests/test_integer_math.py)."""
    return _iln_fp(_IPyOps(), n)


def inll_micro_col(c: Column, total: Column) -> Column:
    """round-half-up((ln(total) - ln(c)) * 1e6) as BIGINT micro-nats —
    the all-integer twin of portable_math.nll_micro_col. The half-up
    is ``(delta*1e6 + 2^29) >> 30``: an arithmetic shift both engines
    floor identically even on the (noise-level) negative deltas a
    truncated fixed-point difference can produce near c == total."""
    d = iln_fp_col(total) - iln_fp_col(c)
    return F.call_function(
        "shiftright",
        d * F.lit(1_000_000).cast("long") + F.lit(1 << (FP_SHIFT - 1)),
        F.lit(FP_SHIFT),
    )


def inll_micro_sql(c_expr: str, total_expr: str) -> str:
    d = f"({iln_fp_sql(total_expr)} - {iln_fp_sql(c_expr)})"
    return f"((({d} * CAST(1000000 AS BIGINT)) + {1 << (FP_SHIFT - 1)}) >> {FP_SHIFT})"

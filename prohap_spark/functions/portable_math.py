"""Cross-engine bit-portable transcendental math.

Problem (CORRECTNESS_r06: ``text_unigram_logprob`` / ``text_char_entropy``
hash-red): gating an exact-integer hash on ``round(-ln(p) * 1e6)`` is not
numerically portable — JVM ``Math.log`` and whichever libm a DuckDB build
links may differ in the last ulp, and one flipped micro-nat at a ``.5``
rounding boundary breaks the order-insensitive value hash even though
every row agrees to ~1e-12.

Fix: build ``ln`` for positive integers out of IEEE-754 double ``+ - * /``
only, with a FIXED evaluation order, and emit the *identical expression
tree* into both the Spark Column API and the DuckDB oracle SQL. IEEE 754
requires each individual ``+ - * /`` to be correctly rounded, and neither
engine reassociates floating-point arithmetic, so the two engines produce
bit-identical doubles — the hash gate can no longer flip.

Construction (for integer ``n`` in ``[1, 2^62)``):

1. Range-reduce by the power of two below ``n``:
   ``k = bit_length(n) - 1`` via an exact integer CASE ladder, and
   ``p2 = 2^k`` via a parallel ladder of exact double literals, so
   ``m = double(n) / p2`` lies in ``[1, 2)`` (division by a power of two
   is exact for n <= 2^53; above that the cast is correctly rounded —
   identically — in both engines).
2. ``ln(m) = 2 * atanh(t)`` with ``t = (m - 1) / (m + 1)`` in ``[0, 1/3]``
   via a fixed-length Horner polynomial in ``u = t*t`` whose
   coefficients ``1/(2j+1)`` are themselves in-expression double
   divisions of small integer literals (no decimal-literal parsing to
   trust).
3. ``ln 2`` is the same series at ``t = 1/3`` — the whole function is
   closed over ``+ - * /`` and integer comparisons; both engines
   constant-fold it with per-op IEEE semantics.

Truncation error of the J=17 series at ``t = 1/3`` is ~2e-18 relative —
far below micro-nat granularity; what matters is that the *same* value
comes out of both engines, which tests/test_portable_math.py pins
bit-for-bit against DuckDB.

STATUS (r8): the two queries named above stayed driver-red in r7
despite this construction passing the full-precision local checker,
so their gates moved OFF doubles entirely — derivation included — to
``functions/integer_math.py`` (fixed-point ln over integer ops only,
whose cross-engine equality rests on integer semantics rather than
IEEE conformance). This module remains the device for surfaces where
a double is genuinely wanted (``text_bm25_topk``'s idf — driver-green
since r6) and the reference construction for "same tree, both
engines" float work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bit-ladder depth: covers every positive BIGINT count (2^62)
_MAX_BITS = 62
# Horner terms: j = 0..17 (u^17, i.e. t^35); 3^-37/37 ~ 6e-20 tail
_TERMS = 18


class _ColOps:
    """Expression ops over Spark Columns."""

    def int_lit(self, i: int):
        return F.lit(i)

    def dbl_lit_int(self, i: int):
        # exact double literal from a small/power-of-two integer
        return F.lit(float(i))

    def to_double(self, x):
        return x.cast("double")

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, b):
        return a * b

    def div(self, a, b):
        return a / b

    def bind(self, val, fn):
        # let-binding via a 1-element higher-order function: the bound
        # value appears ONCE in the expression tree however many times
        # ``fn`` references it — without this, reusing a subexpression
        # object re-embeds its whole subtree at every reference and the
        # serialized plan blows up combinatorially (the r7 1.8 MB
        # oracle-SQL lesson applies to the Catalyst tree too)
        return F.element_at(F.transform(F.array(val), fn), 1)

    def ladder(self, n, pairs, otherwise):
        # pairs: [(threshold_int, result_expr)] descending; first match wins
        expr = None
        for thr, res in pairs:
            cond = n >= F.lit(thr)
            expr = F.when(cond, res) if expr is None else expr.when(cond, res)
        return expr.otherwise(otherwise)


class _SqlOps:
    """Expression ops over DuckDB SQL text (same tree, same order)."""

    def __init__(self):
        self._n_bound = 0

    def int_lit(self, i: int):
        return str(i)

    def dbl_lit_int(self, i: int):
        return f"CAST({i} AS DOUBLE)"

    def to_double(self, x):
        return f"CAST({x} AS DOUBLE)"

    def add(self, a, b):
        return f"({a} + {b})"

    def sub(self, a, b):
        return f"({a} - {b})"

    def mul(self, a, b):
        return f"({a} * {b})"

    def div(self, a, b):
        return f"({a} / {b})"

    def bind(self, val, fn):
        # textual let-binding via a 1-element list lambda: without it
        # every reuse of ``val`` pastes its full text again and the
        # generated SQL grows combinatorially (measured 1.8 MB for one
        # BM25 oracle before this existed; ~15 KB after)
        self._n_bound += 1
        var = f"__pm{self._n_bound}"
        return f"list_transform([{val}], {var} -> {fn(var)})[1]"

    def ladder(self, n, pairs, otherwise):
        arms = " ".join(f"WHEN {n} >= {thr} THEN {res}" for thr, res in pairs)
        return f"(CASE {arms} ELSE {otherwise} END)"


def _atanh_poly(o, t):
    """t * P(t*t), P(u) = sum_{j=0..17} u^j / (2j+1), Horner order.
    ``t`` must already be a bound variable (cheap to reference)."""
    u = o.mul(t, t)

    def horner(uv):
        j = _TERMS - 1
        poly = o.div(o.dbl_lit_int(1), o.dbl_lit_int(2 * j + 1))
        for j in range(_TERMS - 2, -1, -1):
            coef = o.div(o.dbl_lit_int(1), o.dbl_lit_int(2 * j + 1))
            poly = o.add(coef, o.mul(uv, poly))
        return poly

    return o.mul(t, o.bind(u, horner))


def _ln2(o):
    """2 * atanh(1/3) through the same fixed series."""
    third = o.div(o.dbl_lit_int(1), o.dbl_lit_int(3))
    return o.mul(o.dbl_lit_int(2), _atanh_poly(o, third))


def _pln(o, n0):
    """Portable ln(n) for an integer expression n >= 1. Every reused
    intermediate (n, m, t) is let-bound via ``o.bind`` so neither the
    SQL text nor the Catalyst tree re-embeds subtrees."""

    def with_n(n):
        nd = o.to_double(n)
        k_pairs = [(1 << b, o.int_lit(b)) for b in range(_MAX_BITS, 0, -1)]
        p2_pairs = [
            (1 << b, o.dbl_lit_int(1 << b)) for b in range(_MAX_BITS, 0, -1)
        ]
        k = o.ladder(n, k_pairs, o.int_lit(0))
        p2 = o.ladder(n, p2_pairs, o.dbl_lit_int(1))
        m = o.div(nd, p2)

        def with_m(mv):
            t = o.div(
                o.sub(mv, o.dbl_lit_int(1)), o.add(mv, o.dbl_lit_int(1))
            )

            def with_t(tv):
                return o.mul(o.dbl_lit_int(2), _atanh_poly(o, tv))

            return o.bind(t, with_t)

        ln_m = o.bind(m, with_m)
        return o.add(o.mul(o.to_double(k), _ln2(o)), ln_m)

    return o.bind(n0, with_n)


def pln_col(n: Column) -> Column:
    """Portable natural log of a positive-integer Column (bit-identical
    to :func:`pln_sql` evaluated by DuckDB on the same input)."""
    return _pln(_ColOps(), n)


def pln_sql(n_expr: str) -> str:
    """Portable natural log of a positive-integer SQL expression."""
    return _pln(_SqlOps(), n_expr)


def nll_micro_col(c: Column, total: Column) -> Column:
    """round(-ln(c/total) * 1e6) as an exact BIGINT, engine-portable:
    ln(total) - ln(c) through the portable series, then half-up via
    floor(x * 1e6 + 0.5) — every step bit-identical across engines."""
    d = pln_col(total) - pln_col(c)
    return F.floor(d * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def nll_micro_sql(c_expr: str, total_expr: str) -> str:
    """SQL twin of :func:`nll_micro_col` (same tree, same order)."""
    d = f"({pln_sql(total_expr)} - {pln_sql(c_expr)})"
    return (
        f"CAST(floor(({d} * CAST(1000000 AS DOUBLE)) + "
        f"(CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE))) AS BIGINT)"
    )

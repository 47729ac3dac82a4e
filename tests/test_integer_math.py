"""Pins for the all-integer fixed-point ln (functions/integer_math.py)
— the derivation that removes even FLOAT CONFORMANCE from the
micro-nat gates' trust base (portable_math removed summation order
and libm; this removes IEEE itself: only integer semantics remain)."""

import math
import random

import duckdb
import pytest

SWEEP = (
    [1, 2, 3, 4, 5, 7, 10, 63, 64, 65, 1000, 10**6]
    + [2**k for k in range(1, 62)]
    + [2**k - 1 for k in range(2, 62)]
    + [2**k + 1 for k in range(1, 61)]
)
rng = random.Random(88)
SWEEP += [rng.randrange(1, 2**62) for _ in range(400)]


def test_iln_fp_bit_identical_spark_vs_duckdb(spark):
    from pyspark.sql import functions as F

    from prohap_spark.functions.integer_math import iln_fp_col, iln_fp_sql

    df = spark.createDataFrame([(n,) for n in SWEEP], "n long")
    got = {
        r["n"]: r["v"]
        for r in df.select("n", iln_fp_col(F.col("n")).alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in SWEEP])
    want = dict(con.execute(f"SELECT n, {iln_fp_sql('n')} FROM t").fetchall())
    assert got == {k: int(v) for k, v in want.items()}


def test_iln_fp_accuracy_vs_math_log(spark):
    from pyspark.sql import functions as F

    from prohap_spark.functions.integer_math import FP, iln_fp_col

    df = spark.createDataFrame([(n,) for n in SWEEP], "n long")
    rows = df.select("n", iln_fp_col(F.col("n")).alias("v")).collect()
    for r in rows:
        n, v = r["n"], r["v"]
        if n == 1:
            assert abs(v) <= 2  # ln(1) = 0 up to fixed-point noise
            continue
        rel = abs(v / FP - math.log(n)) / math.log(max(n, 2))
        assert rel < 1e-7, (n, v / FP, math.log(n))


def test_inll_micro_cross_engine_and_sane(spark):
    """The micro-nat builder: bit-identical across engines on (c,
    total) pairs including the c == total and c = total-1 edges, and
    within 1 micro-nat of the true value."""
    from pyspark.sql import functions as F

    from prohap_spark.functions.integer_math import (
        inll_micro_col,
        inll_micro_sql,
    )

    pairs = [(1, 1), (1, 2), (2, 3), (999999, 1000000), (1, 10**6),
             (7, 10**9), (12345, 67890), (2**40, 2**41), (3, 10**12)]
    pairs += [(rng.randrange(1, 10**9), 10**9) for _ in range(200)]
    pairs = [(c, t) for c, t in pairs if c <= t]
    df = spark.createDataFrame(pairs, "c long, t long")
    got = {
        (r["c"], r["t"]): r["m"]
        for r in df.select(
            "c", "t", inll_micro_col(F.col("c"), F.col("t")).alias("m")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(c BIGINT, t BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    want = {
        (c, t): int(m)
        for c, t, m in con.execute(
            f"SELECT c, t, {inll_micro_sql('c', 't')} FROM p"
        ).fetchall()
    }
    assert got == want
    for (c, t), m in got.items():
        true = -math.log(c / t) * 1e6
        assert abs(m - true) <= max(1.0, 1e-6 * true) + 1.0, (c, t, m, true)


def test_iln_fp_int_bit_identical_to_sql():
    """The r10 pure-Python twin (iln_fp_int) must derive the SAME
    integers as the DuckDB form across magnitudes — it is what lets
    Arrow-batch/driver Python (the streaming HLL finisher) replay the
    engine's fixed-point ln exactly."""
    import duckdb

    from prohap_spark.functions.integer_math import iln_fp_int, iln_fp_sql

    con = duckdb.connect()
    ns = (
        list(range(1, 130))
        + [2**k for k in range(1, 62)]
        + [10**k for k in range(1, 18)]
        + [3, 7, 63, 64, 65, 2**40 - 1, 2**40 + 1]
    )
    for n in ns:
        duck = con.sql(f"SELECT {iln_fp_sql(f'CAST({n} AS BIGINT)')} AS v").fetchone()[0]
        assert iln_fp_int(n) == duck, n

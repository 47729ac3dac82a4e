"""Deterministic, engine-portable hashing helpers shared across the
sampling / packing / split operators.

The canonical bucket idiom is the first 8 md5 hex chars as an integer
mod N — reproducible across runs, repartitions, and engines (the
DuckDB oracles restate it as a list_reduce over strpos digits), unlike
``rand()`` or Spark's salted ``hash()``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_bucket(col: Column, mod: int) -> Column:
    """First 8 md5 hex chars of ``col`` (cast to string) as an integer
    mod ``mod`` — the shared deterministic bucket used by
    sampling_hash_split, sampling_stratified_rates, and
    pack_context_windows."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % mod
    )

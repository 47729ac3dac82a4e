"""Bloom-filter semi-join reduction (runtime-filter pushdown).

The classic 100 TB shuffle-cutter: before a fact⋈dim (semi-)join, build
a Bloom filter over the dim side's join keys — one map-side-combinable
``bit_or`` aggregate yielding at most ceil(m/62) BIGINT words — and
pre-filter the fact table MAP-SIDE against it. Rows whose key fails the
probe provably cannot match (Bloom filters have no false negatives), so
they never enter the join's shuffle; the false positives that survive
are removed by the exact join that follows. Net effect: the shuffle
moves ~|matching| + FP·|non-matching| rows instead of the whole fact
table — at a 5% match rate and a 1% FP rate that is a ~17× shuffle
reduction for the price of one scan of the (small) dim side.

Spark's own engine applies a similar runtime filter in some shuffle
plans (spark.sql.optimizer.runtime.bloomFilter.enabled), but (a) only
under cost heuristics it controls, and (b) its filter is not an
ARTIFACT. This operator makes the filter explicit, deterministic
(md5-window hashes — the same family as functions/sketches.py, so a
SQL engine can replay every bit), persistable, and mergeable across
shards via bloom_merge — e.g. build it once from the curated-id
dimension and reuse it across every daily fact ingest.

Design boundary, stated: the words are collected to the driver and
bound as a LITERAL array, so the probe is a pure column expression —
zero extra shuffle, zero extra join. The collect is bounded by
ceil(m_bits/62) rows (~2 KB at m=2^17, ~16 MB at m=2^27), independent
of dim cardinality; for filters beyond driver comfort use
``collect_filter=False``, which probes via a broadcast join against
the word table instead (same semantics, one extra map-side aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from prohap_spark.functions.sketches import (
    BLOOM_WORD_BITS,
    bloom_build,
    bloom_hash_positions,
)


def bloom_words_dense(bloom: DataFrame, m_bits: int) -> list[int]:
    """Collect a bloom_build word table into a dense python list of
    ceil(m_bits/62) ints (missing words = 0). BOUNDED collect: the row
    count is fixed by m_bits, never by data size."""
    n_words = (m_bits + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    words = [0] * n_words
    for r in bloom.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_pass_expr(
    key: Column, words: list[int], k: int, m_bits: int, hash_family: str = "md5"
) -> Column:
    """Boolean column: all k Bloom bits of ``key`` are set in the
    literal ``words`` array — the map-side probe.

    Two measured cost cliffs shaped this expression (sf0.1 lineitem,
    m=2^19 → 8457 words; the SURVEY §4 lambda-binding rule both
    times):

    - the word table MUST be a true Literal(ArrayData) —
      ``F.lit(numpy_array)`` — never ``F.array(*literals)``:
      CreateArray re-evaluates its 8457 children per row once codegen
      bails on the huge expression (15 s/pass), and inside a `forall`
      lambda it re-evaluates per ELEMENT. The numpy literal probes at
      ~0.5 s.
    - md5 is computed ONCE per row (bind_once) and the k positions cut
      from its hex windows — k separate md5 calls measured 3.3 s vs
      1.9 s bound.

    ``hash_family='xxh64'`` (r14): positions from ``xxhash64(key, j)``
    — pure integer codegen, no string cast/md5/conv. The md5 probe's
    cost is per hex CHAR parsed (an r14 A/B of 2 convs over the same
    20 chars measured the SAME wall as 4 convs over 5 chars each), so
    the only way down is a different hash; xxh64 measured the probe
    leg 1.19 s -> ~0.1 s over the bare scan at sf0.1. Build and probe
    families must match (read_bloom_index pins artifact families)."""
    import numpy as np

    from prohap_spark.functions.hof import bind_once

    warr = F.lit(np.array(words, dtype=np.int64))

    def test_bit(p: Column) -> Column:
        return (
            F.element_at(
                warr, (p / BLOOM_WORD_BITS).cast("int") + 1
            ).bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (p % BLOOM_WORD_BITS).cast("int"),
                )
            )
            != 0
        )

    if hash_family == "xxh64":
        cond = None
        for j in range(k):
            p = F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits))
            t = test_bit(p)
            cond = t if cond is None else (cond & t)
        return cond
    if hash_family != "md5":
        raise ValueError(f"unknown bloom hash_family: {hash_family!r}")

    def probe(h: Column) -> Column:
        cond = None
        for j in range(k):
            p = F.pmod(
                F.conv(F.substring(h, 1 + 5 * j, 5), 16, 10).cast("long"),
                F.lit(m_bits),
            )
            t = test_bit(p)
            cond = t if cond is None else (cond & t)
        return cond

    return bind_once(F.md5(key.cast("string")), probe)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    k: int = 4,
    m_bits: int = 1 << 17,
    collect_filter: bool = True,
    words: list[int] | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` with a Bloom prefilter: returns
    exactly the fact rows whose ``fact_key`` appears in ``dim`` —
    identical semantics to ``fact.join(dim, 'left_semi')`` (the exact
    join removes Bloom false positives), but the shuffle/broadcast
    probe sees only the prefiltered fraction of ``fact``.

    collect_filter=True (default): words collected and inlined as a
    literal — the prefilter is pure map-side compute. False: the probe
    runs per DISTINCT fact key against a broadcast of the word table
    (functions.sketches.bloom_probe_hits — duplicate-safe min-over-bits
    gate), and fact is semi-joined against the passing keys; use it
    when m_bits is too large to inline AND distinct keys are much
    smaller than rows, since it trades the literal for one key-grain
    aggregate + one key semi-join.

    ``words``: pre-collected dense word list (bloom_words_dense) to
    share one filter build across several consumers (e.g. the join
    and its stats diagnostic).

    ``hash_family``: 'md5' (default — SQL-replayable, matches every
    persisted artifact and oracle-checked gate) or 'xxh64' (r14
    runtime-filter family — ~6x cheaper per probed row; hashes the
    NATIVE key columns, so fact_key and dim_key must share a dtype;
    pre-collected ``words`` must come from a build of the same
    family). The returned ROWS are identical either way — the exact
    join erases the filter's influence — only the prefilter's FP set
    (and so its cost/selectivity) differs."""
    if hash_family == "xxh64":
        key_col = F.col(fact_key)
        dim_key_col = F.col(dim_key)
    else:
        key_col = F.col(fact_key).cast("string")
        dim_key_col = F.col(dim_key).cast("string")
    if words is None:
        keys = dim.select(dim_key_col.alias("__bk")).distinct()
        bloom = bloom_build(keys, "__bk", k, m_bits, hash_family=hash_family)
    if collect_filter:
        if words is None:
            words = bloom_words_dense(bloom, m_bits)
        reduced = fact.where(
            bloom_pass_expr(key_col, words, k, m_bits, hash_family=hash_family)
        )
    else:
        if hash_family != "md5":
            raise ValueError(
                "bloom_semi_join: collect_filter=False probes via "
                "bloom_probe_hits, which is md5-window only"
            )
        from prohap_spark.functions.sketches import bloom_probe_hits

        fact_keys = fact.select(key_col.alias("__pk")).distinct()
        hits = bloom_probe_hits(
            fact_keys, ["__pk"], "__pk", bloom, k, m_bits
        ).where(F.col("bloom_hit"))
        reduced = fact.join(
            hits.select("__pk"), key_col == F.col("__pk"), "left_semi"
        )
    exact_keys = dim.select(F.col(dim_key).alias("__ek")).distinct()
    return reduced.join(
        exact_keys, F.col(fact_key) == F.col("__ek"), "left_semi"
    )


def bloom_plan(n_keys: int, fp_target: float = 1e-3, max_k: int = 4) -> dict:
    """Choose (k, m_bits) from the OPERATING REQUIREMENTS instead of
    folklore defaults (the lsh_plan discipline applied to the runtime
    filter): the smallest power-of-two m whose optimal-k FP rate meets
    ``fp_target`` for ``n_keys`` distinct dim keys. Uses the standard
    model fp = (1 − e^(−k·n/m))^k with k capped at ``max_k`` (the
    md5-window budget: 4 disjoint 20-bit draws). Returns the config
    plus its predicted fp and bytes; raises when no m within the
    2^20-bit probe ceiling reaches the target — silence would ship a
    saturated filter that passes everything (the j13 gate's m is
    deliberately BELOW this planner's answer to exercise exactly that
    regime)."""
    import math

    if n_keys <= 0:
        raise ValueError("bloom_plan: n_keys must be positive")
    for log_m in range(10, 21):
        m = 1 << log_m
        best = None
        for k in range(1, max_k + 1):
            fp = (1.0 - math.exp(-k * n_keys / m)) ** k
            if best is None or fp < best[1]:
                best = (k, fp)
        if best[1] <= fp_target:
            k, fp = best
            return {
                "k": k,
                "m_bits": m,
                "bits_per_key": m / n_keys,
                "predicted_fp": fp,
                "filter_bytes": ((m + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS) * 8,
            }
    raise ValueError(
        f"bloom_plan: no m <= 2^20 reaches fp {fp_target} for {n_keys} keys "
        "— shard the dim keys across multiple filters or relax the target"
    )


def write_bloom_index(
    dim: DataFrame,
    dim_key: str,
    path: str,
    k: int = 4,
    m_bits: int | None = 1 << 17,
    fp_target: float | None = None,
) -> dict:
    """Persist the runtime filter as a VALIDATED artifact — build once
    from the (expensive) dim scan, reuse across every subsequent fact
    ingest. The word table carries the manifest discipline of
    operators/dedup.py (torn/partial writes fail loud on read: a
    silently truncated filter would DROP set bits and turn the
    no-false-negative guarantee into silent row loss), and meta.json
    pins (k, m_bits, dim_key) so a reader can't probe with mismatched
    hash parameters — a k/m mismatch computes different bit positions
    and breaks the guarantee just as silently. Returns the manifest.

    Incremental growth: build a words table from the new batch alone
    (bloom_build) and bit_or it in (functions.sketches.bloom_merge);
    merged == rebuilt word-for-word (the semilattice), pinned in
    pytest at the artifact level.

    ``fp_target``: pass instead of sizing by hand — the key count is
    measured (one bounded count job) and :func:`bloom_plan` picks
    (k, m_bits); the planned sizing lands in meta.json like any other.
    """
    import json
    import os

    from prohap_spark.operators.dedup import write_dedup_index

    keys = dim.select(F.col(dim_key).cast("string").alias("__bk")).distinct()
    if fp_target is not None:
        plan = bloom_plan(keys.count(), fp_target=fp_target)
        k, m_bits = plan["k"], plan["m_bits"]
    bloom = bloom_build(keys, "__bk", k, m_bits)
    manifest = write_dedup_index(bloom, f"{path}/words")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"k": k, "m_bits": m_bits, "dim_key": dim_key}, f)
    manifest = dict(manifest)
    manifest["k"] = k
    manifest["m_bits"] = m_bits
    return manifest


def read_bloom_index(spark, path: str, k: int, m_bits: int) -> DataFrame:
    """Read a :func:`write_bloom_index` artifact, refusing a manifest
    mismatch (torn write) or a (k, m_bits) parameter mismatch (wrong
    bit addressing). Returns the validated word table."""
    import json
    import os

    from prohap_spark.operators.dedup import read_dedup_index

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if (meta["k"], meta["m_bits"]) != (k, m_bits):
        raise ValueError(
            f"bloom index at {path} was built with (k={meta['k']}, "
            f"m_bits={meta['m_bits']}); probing with (k={k}, "
            f"m_bits={m_bits}) would compute different bit positions "
            "and silently break the no-false-negative guarantee"
        )
    return read_dedup_index(spark, f"{path}/words")


def bloom_prefilter_from_index(
    spark, fact: DataFrame, fact_key: str, path: str, k: int = 4,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """Map-side prefilter of ``fact`` against a persisted
    :func:`write_bloom_index` artifact: keeps every row whose key the
    filter admits (all true matches + the FP fraction — compose with
    the exact join downstream). The words collect is bounded by
    ceil(m_bits/62) regardless of dim size."""
    bloom = read_bloom_index(spark, path, k, m_bits)
    words = bloom_words_dense(bloom, m_bits)
    return fact.where(
        bloom_pass_expr(F.col(fact_key).cast("string"), words, k, m_bits)
    )


def bloom_semi_join_stats(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    k: int = 4,
    m_bits: int = 1 << 17,
    words: list[int] | None = None,
) -> DataFrame:
    """One row of reduction evidence: (n_fact, n_bloom_pass,
    n_exact_pass, n_false_positive). n_bloom_pass/n_fact is the
    fraction of the fact table that enters the join after the
    prefilter; n_false_positive = bloom passes the exact join removes.
    All exact integers — a SQL engine replays them bit-for-bit.
    ``words``: share a pre-collected filter (see bloom_semi_join)."""
    if words is None:
        keys = dim.select(F.col(dim_key).cast("string").alias("__bk")).distinct()
        words = bloom_words_dense(bloom_build(keys, "__bk", k, m_bits), m_bits)
    key_col = F.col(fact_key).cast("string")
    exact_keys = dim.select(F.col(dim_key).alias("__ek")).distinct()
    flagged = fact.select(
        bloom_pass_expr(key_col, words, k, m_bits).alias("__bp"),
        F.col(fact_key).alias("__fk"),
    ).join(
        exact_keys.withColumn("__in_dim", F.lit(1)),
        F.col("__fk") == F.col("__ek"),
        "left",
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.col("__bp").cast("long")).alias("n_bloom_pass"),
        F.sum(F.coalesce("__in_dim", F.lit(0)).cast("long")).alias("n_exact_pass"),
        F.sum(
            (F.col("__bp") & F.col("__in_dim").isNull()).cast("long")
        ).alias("n_false_positive"),
    )

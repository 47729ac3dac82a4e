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

Small-range correction (r10): the classic linear-counting switch —
when zero registers remain (V > 0) and the raw estimate is ≤ 2.5m,
estimate m·ln(m/V) instead — needs ln(), a transcendental and
exactly the portability class this repo banished from hash gates.
It was omitted through r9 for that reason; it is now applied with
the ALL-INTEGER fixed-point ln of ``functions/integer_math.py``
(``iln_fp``, scale 2^30, built r8 for the micro-nat gates): both
engines compute ``(m·(ln_fp(m) − ln_fp(V)) + 2^29) div 2^30`` from
identical integers, so the corrected estimate stays bit-exact
cross-engine. ln_fp(64) is exactly 6·LN2_FP (powers of two have a
zero series term), precomputed as one literal. Accuracy for m = 64:
~1.04/sqrt(64) ≈ 13% relative error in the raw range; linear
counting shrinks the known low-n bias (pinned in tests).

Scale shape: two hash aggregates — (group, register) max-rank, then
per-group sum — both map-side combinable; register state is 64 rows
per group, never the values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

M = 64  # registers (p = 6)
RANK_CAP = 41
ALPHA_NUM = int(round(0.709 * M * M * (1 << RANK_CAP)))  # alpha_64 m^2 2^41

# linear-counting pieces (all exact integers, shared by both engines):
# ln_fp(64) = 6·LN2_FP exactly — 64 is a power of two, so iln_fp's
# atanh series term is zero and only the bit-length multiple remains
from prohap_spark.functions.integer_math import FP_SHIFT, LN2_FP, iln_fp_col, iln_fp_sql

ILN_M_FP = 6 * LN2_FP
LC_THRESHOLD = (5 * M) // 2  # apply LC when raw estimate <= 2.5m and V > 0


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


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The HLL's PERSISTABLE state: group_cols + (__reg INT, __m INT)
    max-rank register rows (≤ m = 64 per group, values never stored).
    This is the sketch-algebra artifact — registers from independently
    processed shards/ingests MERGE losslessly via :func:`hll_merge`
    (max is associative/commutative/idempotent), and
    :func:`hll_estimate_from_registers` finishes them into the same
    estimate a single-pass build produces (union-equivalence pinned in
    pytest). At 100 TB this is the incremental story: per-shard
    register tables are ≤ 64 rows/group regardless of shard size."""
    reg, rank = _rank_cols(F.col(value_col))
    return (
        df.select(*group_cols, reg.alias("__reg"), rank.alias("__rank"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__m"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge shard register tables: union + per-register max. Lossless
    by the max semilattice — merging N shards' registers equals
    building one sketch over the concatenated shards."""
    it = iter(register_tables)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c not in ("__m",)]
    return out.groupBy(*keys).agg(F.max("__m").alias("__m"))


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Finish register rows into group_cols + (hll_est BIGINT,
    hll_zero_registers INT) — the shared tail of :func:`hll_distinct`
    (raw harmonic estimator + the r10 linear-counting small-range
    correction, all exact integers)."""
    t = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {RANK_CAP} - "
        f"CAST(least(__m, {RANK_CAP}) AS INT))"
    )
    per = regs.groupBy(*group_cols).agg(
        F.sum(t).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    raw = F.expr(
        f"CAST({ALPHA_NUM} AS BIGINT) div (__s_present + "
        f"(CAST({M} AS BIGINT) - __n_present) * CAST({1 << RANK_CAP} AS BIGINT))"
    )
    v = (F.lit(M).cast("long") - F.col("__n_present")).alias("__v")
    # linear counting: round-half-up(m·(ln_fp(m) − ln_fp(V)) / 2^30),
    # every operand an exact integer (see module docstring)
    lc = F.lit(M).cast("long") * (
        F.lit(ILN_M_FP).cast("long") - iln_fp_col(v)
    ) + F.lit(1 << (FP_SHIFT - 1)).cast("long")
    lc_est = F.shiftright(lc, FP_SHIFT)
    est = F.when((v > 0) & (raw <= LC_THRESHOLD), lc_est).otherwise(raw)
    return per.select(
        *group_cols,
        est.cast("bigint").alias("hll_est"),
        (F.lit(M) - F.col("__n_present")).cast("int").alias("hll_zero_registers"),
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group deterministic HLL: returns group_cols +
    (hll_est BIGINT, hll_zero_registers INT). Every intermediate is an
    exact integer, so the result is identical on any partitioning and
    replayable by :func:`hll_oracle_sql` in DuckDB. Composition of
    :func:`hll_registers` + :func:`hll_estimate_from_registers` — the
    single-pass convenience over the mergeable register artifact."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col), group_cols
    )


# ---------------------------------------------------------------------------
# Deterministic Bloom filter (membership sketch) and count-min sketch
# (frequency sketch) — the other two workhorse sketches of a 100 TB
# curation pipeline, built from the same engine-identical ops as the
# HLL above (md5 hex windows → exact integers; bit_or / sum / min
# aggregates; no float anywhere):
# - hash_j(x) = the j-th disjoint hex window of md5(x) parsed as an
#   integer (16 or 20 bits per window — md5's 32 hex chars give room
#   for 4 independent 20-bit draws), reduced mod the table width;
# - Bloom words hold 62 bits each (NOT 64: DuckDB's BIGINT << raises
#   on shifts ≥ 62, so the portable word is 62 bits — the 3% space
#   tax buys bit-identical replay);
# - both sketch states are driver-tiny (m/62 words; d×w counters) and
#   build with ONE map-side-combinable aggregate over the exploded
#   stream — at scale the sketch replaces a vocabulary/benchmark-sized
#   hash set with a broadcastable array.
# ---------------------------------------------------------------------------

BLOOM_WORD_BITS = 62


def _md5_window_int(value: Column, start: int, width: int) -> Column:
    """Exact integer from ``width`` hex chars of md5(value) starting at
    1-based ``start`` — the multi-draw generalization of the HLL's
    single 15-char window."""
    return F.conv(F.substring(F.md5(value.cast("string")), start, width), 16, 10).cast(
        "long"
    )


def _md5_window_sql(expr: str, start: int, width: int) -> str:
    """DuckDB replay of :func:`_md5_window_int` (hex fold, same digits)."""
    return (
        f"list_reduce(list_transform(range({start}, {start + width}), "
        f"i -> CAST(strpos('0123456789abcdef', "
        f"substr(md5(CAST(({expr}) AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


def bloom_hash_positions(value: Column, k: int, m_bits: int) -> Column:
    """array<long> of ``k`` bit positions in [0, m_bits) for one value —
    k disjoint 20-bit md5 windows reduced mod m_bits (independent draws
    for m up to 2^20)."""
    assert k <= 4 and m_bits <= 1 << 20
    return F.array(
        *[F.pmod(_md5_window_int(value, 1 + 5 * j, 5), F.lit(m_bits)) for j in range(k)]
    )


def bloom_hash_positions_xxh(value: Column, k: int, m_bits: int) -> Column:
    """array<long> of ``k`` bit positions in [0, m_bits) via
    ``xxhash64(value, j)`` — the RUNTIME-FILTER hash family (r14
    optimization, guide §3.2/§4: Spark's own injected runtime Bloom
    rides xxhash64). Pure 64-bit integer codegen — no string cast, no
    md5, no per-hex-char ``conv`` parse — measured ~6x cheaper per row
    than the md5-window family on the sf0.1 probe path. NOT
    SQL-replayable and NOT artifact-compatible with the md5 family:
    use it only for in-flight runtime filters whose downstream exact
    join erases the filter's influence on results; persisted/oracle-
    checked filters stay on :func:`bloom_hash_positions`. No m cap —
    draws are full 64-bit."""
    return F.array(
        *[F.pmod(F.xxhash64(value, F.lit(j)), F.lit(m_bits)) for j in range(k)]
    )


def _bloom_positions(value: Column, k: int, m_bits: int, hash_family: str) -> Column:
    if hash_family == "md5":
        return bloom_hash_positions(value, k, m_bits)
    if hash_family == "xxh64":
        return bloom_hash_positions_xxh(value, k, m_bits)
    raise ValueError(f"unknown bloom hash_family: {hash_family!r}")


def bloom_build(
    grams: DataFrame, gram_col: str, k: int, m_bits: int, hash_family: str = "md5"
) -> DataFrame:
    """(word_idx int, word long): the Bloom filter of the ``gram_col``
    values as 62-bit words — ONE bit_or aggregate over the exploded
    positions, at most ceil(m_bits/62) output rows (broadcastable).
    ``hash_family``: 'md5' (default — SQL-replayable artifact family)
    or 'xxh64' (runtime-filter family, see
    :func:`bloom_hash_positions_xxh`); build and probe must agree."""
    pos = grams.select(
        F.explode(
            _bloom_positions(F.col(gram_col), k, m_bits, hash_family)
        ).alias("__pos")
    )
    return (
        pos.select(
            F.expr(f"CAST((__pos div {BLOOM_WORD_BITS}) AS INT)").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {BLOOM_WORD_BITS} AS INT))").alias(
                "__mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__mask)").alias("word"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge Bloom word tables built with the SAME (k, m_bits): union +
    per-word bit_or. Lossless by the bit-or semilattice — merging
    per-shard filters equals building one filter over the union of
    their inputs (pinned word-for-word in pytest). The 100 TB
    incremental path: each ingest builds its ~m/62-word filter in one
    map-side pass; the merged artifact is the same few KBs."""
    it = iter(blooms)
    out = next(it)
    for b in it:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.expr("bit_or(word)").alias("word"))


def cms_join_size_estimate(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    with the SAME (d, w) over the two sides' join keys: the classic CMS
    inner product — for each hash row j, sum counter products over
    shared cells; take the MIN across rows. |A ⋈ B| = Σ_v fA(v)·fB(v)
    never exceeds the estimate (collisions only ADD), so the min-row
    product is a one-sided overestimate within ε·N_A·N_B (ε = e/w) with
    probability 1−δ (δ = e^−d) — exactly the guarantee a join planner
    wants when deciding broadcast vs shuffle vs salt BEFORE paying the
    shuffle: sketches are map-side-combinable d·w counter tables built
    in one pass per side (or merged from shards), no join executed.
    Exact-integer arithmetic — engine-replayable. Returns one row
    (join_size_est bigint)."""
    a = cms_a.select("j", "idx", F.col("cnt").alias("__ca"))
    b = cms_b.select("j", "idx", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["j", "idx"])
        .groupBy("j")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__dot"))
    )
    # a hash row with NO shared non-zero cell has dot 0 (disjoint key
    # sets under that hash) — it must participate in the min, not
    # vanish from the inner join
    rows = cms_a.select("j").distinct()
    full = rows.join(per_row, "j", "left").select(
        F.coalesce("__dot", F.lit(0)).alias("__dot")
    )
    return full.agg(F.min("__dot").cast("bigint").alias("join_size_est"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (d, w): union +
    per-counter sum. CMS counters are linear, so the merge is exact —
    identical counters to one build over the concatenated streams
    (pinned in pytest)."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("j", "idx").agg(F.sum("cnt").alias("cnt"))


def bloom_probe_hits(
    items: DataFrame, key_cols: list[str], gram_col: str, bloom: DataFrame,
    k: int, m_bits: int,
) -> DataFrame:
    """key_cols + (bloom_hit boolean) per DISTINCT (key_cols, gram):
    true iff ALL k of the gram's bits are set in ``bloom`` (broadcast —
    the probe is map-side; the corpus never shuffles). Duplicate
    (key, gram) input rows are tolerated and collapse to one output
    row: the gate is min-over-bits, not a sum that a duplicate could
    inflate into a false negative (r9 advice)."""
    pos = items.select(
        *key_cols,
        F.col(gram_col).alias("__gram"),
        F.posexplode(bloom_hash_positions(F.col(gram_col), k, m_bits)).alias(
            "__j", "__pos"
        ),
    ).select(
        *key_cols,
        "__gram",
        "__j",
        F.expr(f"CAST((__pos div {BLOOM_WORD_BITS}) AS INT)").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {BLOOM_WORD_BITS} AS INT))").alias(
            "__mask"
        ),
    )
    joined = pos.join(F.broadcast(bloom), "word_idx", "left")
    bit_ok = (F.col("word").isNotNull()) & (
        F.col("word").bitwiseAND(F.col("__mask")) == F.col("__mask")
    )
    return (
        joined.groupBy(*key_cols, "__gram")
        .agg(F.min(bit_ok.cast("int")).alias("__ok"))
        .select(*key_cols, F.col("__gram"), (F.col("__ok") == 1).alias("bloom_hit"))
    )


def cms_build(tokens: DataFrame, token_col: str, d: int, w: int) -> DataFrame:
    """(j int, idx int, cnt long): a d×w count-min sketch of the token
    STREAM (duplicates count) — one map-side-combinable aggregate with
    at most d*w output rows."""
    assert d <= 4 and w <= 1 << 16
    rows = tokens.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(_md5_window_int(F.col(token_col), 1 + 4 * j, 4), F.lit(w))
                    for j in range(d)
                ]
            )
        ).alias("j", "idx")
    )
    return rows.groupBy("j", "idx").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    candidates: DataFrame, token_col: str, cms: DataFrame, d: int, w: int
) -> DataFrame:
    """candidates + (cms_est long): min over the d counters addressed
    by the candidate's hashes — the classic CMS point query, one
    broadcast join against the d×w counter table."""
    probe = candidates.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    F.pmod(_md5_window_int(F.col(token_col), 1 + 4 * j, 4), F.lit(w))
                    for j in range(d)
                ]
            )
        ).alias("j", "idx"),
    )
    others = [c for c in candidates.columns]
    return (
        probe.join(F.broadcast(cms), ["j", "idx"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def kmv_bottom_k(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values) bottom-k sketch: per group the k
    smallest md5 hashes of the DISTINCT values, with the values kept
    beside their hashes. One artifact, two capabilities:

    - a deterministic UNIFORM SAMPLE of the distinct values (md5
      order is value-blind, so the k kept values are an unbiased
      without-replacement sample — the mergeable reservoir);
    - a distinct-count estimator via :func:`kmv_estimate`.

    Mergeable like the other sketches (min-k is a semilattice:
    :func:`kmv_merge` = union + re-take bottom k, equal to a
    single-pass build — exact equality, not approximation). State is
    k rows per group. Engine-replayable: md5 order is total and
    engine-independent. Returns group_cols + (__kmv_hash string,
    __kmv_value string, __kmv_rank int)."""
    h = F.md5(F.col(value_col).cast("string"))
    distinct = df.select(
        *group_cols,
        F.col(value_col).cast("string").alias("__kmv_value"),
        h.alias("__kmv_hash"),
    ).dropDuplicates([*group_cols, "__kmv_hash"])
    w = Window.partitionBy(*group_cols).orderBy("__kmv_hash")
    return (
        distinct.withColumn("__kmv_rank", F.row_number().over(w))
        .where(F.col("__kmv_rank") <= k)
        .select(*group_cols, "__kmv_hash", "__kmv_value", "__kmv_rank")
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge shard bottom-k sketches: union + re-take the k smallest
    per group. EXACTLY equals a single-pass build over the
    concatenated shards (the k smallest of a union are among the
    union of each shard's k smallest) — pinned in pytest."""
    it = iter(sketches)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    keys = [c for c in out.columns
            if c not in ("__kmv_hash", "__kmv_value", "__kmv_rank")]
    dd = out.dropDuplicates([*keys, "__kmv_hash"])
    w = Window.partitionBy(*keys).orderBy("__kmv_hash")
    return (
        dd.withColumn("__kmv_rank", F.row_number().over(w))
        .where(F.col("__kmv_rank") <= k)
        .select(*keys, "__kmv_hash", "__kmv_value", "__kmv_rank")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate from a bottom-k sketch: the classic
    (k−1)/h_(k) KMV estimator, where h_(k) is the k-th smallest hash
    mapped to (0,1) — here the first 15 md5 hex chars as a 60-bit
    fraction, all integer until the final division (one double ratio
    of exact integers, engine-identical). Groups with fewer than k
    distinct values are EXACT (the sketch holds every value).
    Relative error ~1/sqrt(k−2). Returns group_cols +
    (kmv_est bigint, kmv_exact boolean)."""
    per = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(
            F.when(
                F.col("__kmv_rank") == k,
                F.conv(F.substring("__kmv_hash", 1, 15), 16, 10).cast("long"),
            )
        ).alias("__hk"),
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(1 << 60))) / F.col("__hk").cast("double")
    )
    return per.select(
        *group_cols,
        F.round(est).cast("bigint").alias("kmv_est"),
        (F.col("__n") < k).alias("kmv_exact"),
    )


def kmv_intersect_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Overlap estimate from two KMV sketches — the theta-sketch read:
    take the bottom-k of the UNION of the two sketches' hashes (=
    kmv_merge, so it equals the union's own sketch exactly), and within
    that uniform sample of A∪B count how many values appear in BOTH
    input sketches: |A∩B| ≈ (matches / k) · est(A∪B).

    Sharper than HLL inclusion–exclusion for overlap reads: the Jaccard
    part (matches/k) is estimated DIRECTLY from a uniform sample rather
    than as a difference of three ±1.04/√m estimates — incl-excl error
    scales with |A∪B| (so small overlaps of big sets drown), the KMV
    binomial error scales with the overlap fraction itself. Same
    determinism contract as the rest of the family: md5 total order,
    one double ratio at the end. Groups where the union sketch is exact
    (< k distinct) return the exact intersection. Returns group_cols +
    (kmv_jaccard_num bigint = matches, kmv_union_est bigint,
    kmv_intersect_est bigint)."""
    u = kmv_merge(sketch_a, sketch_b, k=k)
    a_keys = sketch_a.select(*group_cols, "__kmv_hash").withColumn(
        "__in_a", F.lit(1)
    )
    b_keys = sketch_b.select(*group_cols, "__kmv_hash").withColumn(
        "__in_b", F.lit(1)
    )
    tagged = u.join(a_keys, [*group_cols, "__kmv_hash"], "left").join(
        b_keys, [*group_cols, "__kmv_hash"], "left"
    )
    per = tagged.groupBy(*group_cols).agg(
        F.sum(
            (F.coalesce("__in_a", F.lit(0)) * F.coalesce("__in_b", F.lit(0))).cast(
                "long"
            )
        ).alias("kmv_jaccard_num"),
        F.count(F.lit(1)).alias("__nu"),
    )
    uest = kmv_estimate(u, group_cols, k=k).select(
        *group_cols,
        F.col("kmv_est").alias("kmv_union_est"),
        F.col("kmv_exact").alias("__uexact"),
    )
    out = per.join(uest, list(group_cols))
    inter = F.when(
        F.col("__uexact"), F.col("kmv_jaccard_num").cast("double")
    ).otherwise(
        F.col("kmv_jaccard_num").cast("double")
        * F.col("kmv_union_est").cast("double")
        / F.lit(float(k))
    )
    return out.select(
        *group_cols,
        "kmv_jaccard_num",
        "kmv_union_est",
        F.round(inter).cast("bigint").alias("kmv_intersect_est"),
    )


def hll_intersect_estimate(
    regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Inclusion–exclusion overlap estimate from two register tables
    (:func:`hll_registers` artifacts): |A∩B| ≈ est(A) + est(B) −
    est(A∪B), where the union estimate comes from :func:`hll_merge`
    (lossless). The set-algebra read on the sketch artifacts — e.g.
    'how much does this crawl snapshot overlap the curated corpus'
    without touching either corpus's rows. Error compounds the three
    estimates' bands (~1.04/sqrt(m) each), so small intersections of
    large sets can come back NEGATIVE — clamped to 0 and honest:
    below the error floor the right answer is 'indistinguishable from
    disjoint'. Returns group_cols + (est_a, est_b, est_union,
    est_intersect), all exact-integer-derived BIGINTs. Inner-joins on
    the group key: a group present in only one side has no
    intersection to estimate."""
    a = hll_estimate_from_registers(regs_a, group_cols).select(
        *group_cols, F.col("hll_est").alias("est_a")
    )
    b = hll_estimate_from_registers(regs_b, group_cols).select(
        *group_cols, F.col("hll_est").alias("est_b")
    )
    u = hll_estimate_from_registers(
        hll_merge(regs_a, regs_b), group_cols
    ).select(*group_cols, F.col("hll_est").alias("est_union"))
    return (
        a.join(b, list(group_cols))
        .join(u, list(group_cols))
        .select(
            *group_cols,
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0).cast("bigint"),
            ).alias("est_intersect"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile histogram — the fourth workhorse
# sketch of a 100 TB pipeline (HLL = distinct, CMS = frequency,
# Bloom = membership, QHIST = distribution), built to the same rules:
# exact integers everywhere the engines must agree, a fixed-size
# map-side-combinable state (n_buckets counters per group), and a
# lossless merge (counter sum — associative/commutative). Quantile
# answers come back as BUCKET indices with a provable guarantee: the
# sketch's bucket for quantile q IS the bucket containing the exact
# discrete q-quantile (smallest value whose <=-rank reaches
# ceil(q·n)) — proven by cum_hist(b*-1) < rank(v*) <= cum_hist(b*),
# pinned as an exact integer equality in pytest and in the registered
# gate query. Resolution is (hi-lo)/n_buckets; values outside [lo,hi)
# clamp to the edge buckets (documented, like any fixed-universe
# sketch; KLL/t-digest trade this for adaptive buckets at the price
# of engine-replayability). Spark's own approx_percentile remains the
# convenience API; this is the ARTIFACT path — per-shard histograms
# persist/merge like hll_registers do.
# ---------------------------------------------------------------------------


def qhist_bucket(value: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """Bucket index of one value: clamp(floor((v-lo)·n/(hi-lo)), 0, n-1).
    Same literal expression order as the DuckDB replay, so the double
    arithmetic is bit-identical cross-engine."""
    raw = F.floor(
        (value.cast("double") - F.lit(float(lo)))
        * F.lit(float(n_buckets))
        / (F.lit(float(hi)) - F.lit(float(lo)))
    )
    return F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)
    ).cast("long")


def qhist_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """The PERSISTABLE state: group_cols + (__qb long, __qn long)
    bucket-count rows (<= n_buckets per group, values never stored).
    One map-side-combinable aggregate; shards merge via
    :func:`qhist_merge`."""
    return (
        df.select(
            *group_cols,
            qhist_bucket(F.col(value_col), lo, hi, n_buckets).alias("__qb"),
        )
        .groupBy(*group_cols, "__qb")
        .agg(F.count(F.lit(1)).alias("__qn"))
    )


def qhist_merge(*hist_tables: DataFrame) -> DataFrame:
    """Merge shard histograms: union + per-bucket sum. Lossless —
    merging N shards equals one build over their concatenation
    (counts are exact integers)."""
    it = iter(hist_tables)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "__qn"]
    return out.groupBy(*keys).agg(F.sum("__qn").alias("__qn"))


def qhist_quantiles(
    hist: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Finish a histogram into group_cols + (q double, bucket long,
    n_rows long): for each q, the smallest bucket whose cumulative
    count reaches ceil(q·n) — exactly the bucket holding the exact
    discrete q-quantile (see the section comment). Integer arithmetic
    except ceil(q·n), whose operands are the identical double q and
    bigint n on both engines."""
    cum_w = Window.partitionBy(*group_cols).orderBy("__qb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("__cum", F.sum("__qn").over(cum_w))
    tot = hist.groupBy(*group_cols).agg(F.sum("__qn").alias("n_rows"))
    targets = tot.select(
        *group_cols,
        "n_rows",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("__target", F.ceil(F.col("q") * F.col("n_rows")).cast("long"))
    joined = cum.join(targets, list(group_cols)).where(
        F.col("__cum") >= F.col("__target")
    )
    return joined.groupBy(*group_cols, "q", "n_rows").agg(
        F.min("__qb").alias("bucket")
    ).select(*group_cols, "q", "bucket", "n_rows")


def exact_quantile_twopass(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    q: float,
    lo: float,
    hi: float,
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT discrete q-quantile (smallest value whose <=-rank reaches
    ceil(q·n)) in TWO passes — the 100 TB replacement for the global
    sort `percentile()` implies:

    pass 1: the qhist histogram (one map-side-combinable aggregate)
      locates each group's target bucket and the rank already covered
      by earlier buckets;
    pass 2: scan again keeping ONLY rows in the target bucket (a
      map-side filter against a broadcast of <= one row per group; at
      uniform spread that's n/n_buckets rows per group) and take the
      (target − covered)-th smallest within it — a per-group window
      over the pruned slice, never a corpus-wide sort.

    Values outside [lo, hi) clamp into the edge buckets (they still
    count toward ranks, so the answer is exact regardless — clamping
    only affects how much pass 2 prunes). Exactness is pinned against
    a single-pass sort in pytest. Returns group_cols + (q, exact_v,
    n_rows)."""
    # the histogram feeds the locator AND the covered-rank aggregate —
    # lazy checkpoint so pass 1 runs once (<= n_buckets rows/group)
    hist = qhist_build(df, group_cols, value_col, lo, hi, n_buckets).localCheckpoint(
        eager=False
    )
    located = qhist_quantiles(hist, group_cols, [q]).select(
        *group_cols, "bucket", "n_rows",
        F.ceil(F.lit(float(q)) * F.col("n_rows")).cast("long").alias("__target"),
    )
    covered = (
        hist.join(located.select(*group_cols, "bucket"), group_cols)
        .where(F.col("__qb") < F.col("bucket"))
        .groupBy(*group_cols)
        .agg(F.sum("__qn").alias("__covered"))
    )
    loc = located.join(covered, group_cols, "left").select(
        *group_cols, "bucket", "n_rows", "__target",
        F.coalesce("__covered", F.lit(0)).alias("__covered"),
    )
    pruned = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        qhist_bucket(F.col(value_col), lo, hi, n_buckets).alias("__qb"),
    ).join(
        F.broadcast(loc), [*group_cols]
    ).where(F.col("__qb") == F.col("bucket"))
    w = Window.partitionBy(*group_cols).orderBy("__v")
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == F.col("__target") - F.col("__covered"))
        .select(
            *group_cols,
            F.lit(float(q)).alias("q"),
            F.col("__v").alias("exact_v"),
            "n_rows",
        )
    )


def qhist_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    qs: list[float],
) -> str:
    """DuckDB replay of qhist_build + qhist_quantiles PLUS the exact
    discrete quantile and its bucket (the provable-equality leg the
    registered gate query compares against)."""
    bucket = (
        f"CAST(least(greatest(floor((CAST({{v}} AS DOUBLE) - {float(lo)}) "
        f"* {float(n_buckets)} / ({float(hi)} - {float(lo)})), 0), "
        f"{n_buckets - 1}) AS BIGINT)"
    )
    q_values = ", ".join(f"({float(q)})" for q in qs)
    return f"""
    WITH vals AS (SELECT {group_col} AS g, {value_col} AS v FROM {table}),
    hist AS (
      SELECT g, {bucket.format(v='v')} AS qb, CAST(count(*) AS BIGINT) AS qn
      FROM vals GROUP BY 1, 2
    ),
    tot AS (SELECT g, CAST(sum(qn) AS BIGINT) AS n_rows FROM hist GROUP BY 1),
    qs(q) AS (VALUES {q_values}),
    tq AS (
      SELECT g, n_rows, q, CAST(ceil(q * n_rows) AS BIGINT) AS target
      FROM tot, qs
    ),
    cum AS (
      SELECT g, qb,
             CAST(sum(qn) OVER (PARTITION BY g ORDER BY qb
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM hist
    ),
    skb AS (
      SELECT t.g, t.q, t.n_rows, min(c.qb) AS bucket
      FROM tq t JOIN cum c ON t.g = c.g AND c.cum >= t.target
      GROUP BY 1, 2, 3
    ),
    vcum AS (
      SELECT g, v,
             CAST(count(*) OVER (PARTITION BY g ORDER BY v
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS vc
      FROM vals
    ),
    exact AS (
      SELECT t.g, t.q, min(v.v) AS exact_v
      FROM tq t JOIN vcum v ON t.g = v.g AND v.vc >= t.target
      GROUP BY 1, 2
    )
    SELECT s.g AS {group_col}, s.q, s.bucket, s.n_rows, e.exact_v,
           {bucket.format(v='e.exact_v')} AS exact_bucket
    FROM skb s JOIN exact e ON s.g = e.g AND s.q = e.q
    """


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
    ),
    est AS (
      SELECT {group_col},
             CAST({ALPHA_NUM} // (s_present +
                  ({M} - n_present) * CAST({1 << RANK_CAP} AS BIGINT))
                  AS BIGINT) AS raw_est,
             CAST({M} AS BIGINT) - n_present AS v
      FROM ss
    )
    SELECT {group_col}{extra_select},
           CAST(CASE WHEN v > 0 AND raw_est <= {LC_THRESHOLD}
                THEN ((CAST({M} AS BIGINT) * ({ILN_M_FP} - {iln_fp_sql("v")})
                       + {1 << (FP_SHIFT - 1)}) >> {FP_SHIFT})
                ELSE raw_est END AS BIGINT) AS hll_est,
           CAST(v AS INT) AS hll_zero_registers
    FROM est
    """

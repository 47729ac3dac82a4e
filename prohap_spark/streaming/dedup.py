"""Streaming near-duplicate detection — continuous-ingestion MinHash
LSH with cross-batch bucket state.

The batch LSH (operators/dedup.py lsh_candidate_pairs) answers "which
pairs in THIS corpus collide"; a training-data ingestion pipeline asks
the online question: "does the document arriving NOW collide with
anything seen BEFORE". That needs per-bucket memory across
micro-batches — a custom stateful operator (applyInPandasWithState),
not a windowed aggregate: bucket membership never expires on event
time, it accumulates.

Shape: signature → bands (the SAME band_table expression as batch, so
both variants bucket identically) → groupBy (band_idx, band_hash) →
stateful membership list per bucket. Each arriving doc emits one
candidate row per PRIOR member of any shared bucket. State is
partitioned by the bucket key (one state shard per shuffle partition,
checkpointed — the standard 100 TB state layout); per-bucket
membership is capped at ``max_bucket`` like the batch cap: a
boilerplate bucket of 10⁶ docs would otherwise hold 10⁶ ids in one
state row AND emit quadratic pairs. Docs beyond the cap still emit
pairs against the stored members but are not added (measured, not
silent: the emitted pair count flattens, and exact-dup handling
belongs upstream).

A pair may surface from several shared buckets across different
micro-batches — consumers dedupe on (min, max), exactly as the batch
variant's ``distinct()`` does. Candidates are candidates: the verify
stage (exact Jaccard on the token sets) stays a batch join downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from prohap_spark.operators.dedup import band_table


def stream_near_dup_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 2,  # same default as lsh_candidate_pairs — the
    # "both variants bucket identically" promise must hold for callers
    # who take the defaults on each side
    max_bucket: int = 64,
) -> DataFrame:
    """(new_id, prior_id, band_idx) candidate stream: ``new_id``
    arrived in the current micro-batch and shares an LSH band bucket
    with ``prior_id`` seen earlier (or earlier in the same batch,
    ordered by id for determinism). ``max_bucket`` caps how many
    members a bucket STORES as prior candidates — docs beyond the cap
    still pair against the stored members but are never stored, so a
    boilerplate bucket's state and pair count stay bounded. Batch mode
    runs the equivalent plan without state and applies the SAME cap
    (only the bucket's max_bucket smallest ids act as priors), so for
    a single-batch input both modes return the identical candidate
    set, matching lsh_candidate_pairs' orientation."""
    import pandas as pd
    from prohap_spark.operators.dedup import tokens_expr
    from pyspark.sql import functions as F

    # size(array_distinct(split(trim(lower(text))))) > 0 is exactly
    # "text IS NOT NULL" (split never returns an empty array), and the
    # cheap form doesn't get pushed below the projection as a full
    # re-tokenization per row (r14 filter-pushdown finding, see
    # operators/dedup.py shingle_table drop_empty)
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens_expr(text_col).alias("__tokens")
    )
    bands = band_table(toks, id_col, "__tokens", num_hashes, band_size)

    if not docs.isStreaming:
        # one-shot equivalent: id-ordered pairs within each bucket,
        # under the SAME per-bucket cap as the stateful branch — only
        # the first max_bucket ids (ascending, the order the stream
        # would store them in a single batch) act as "prior"
        # candidates, so an over-cap boilerplate bucket emits at most
        # k * max_bucket pairs, not k², and both modes return the
        # identical candidate set
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_hash").orderBy(id_col)
        a = (
            bands.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= max_bucket)
            .select(F.col(id_col).alias("prior_id"), "band_idx", "band_hash")
        )
        b = bands.select(F.col(id_col).alias("new_id"), "band_idx", "band_hash")
        return (
            a.join(b, ["band_idx", "band_hash"])
            .where(F.col("prior_id") < F.col("new_id"))
            .select("new_id", "prior_id", "band_idx")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # derive the id type from the input (the stream_token_budget r7
    # discipline): string ids order identically in both modes — python
    # str < is code-point order, Spark string < is UTF-8 byte order,
    # and UTF-8 byte order IS code-point order
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"new_id {id_type}, prior_id {id_type}, band_idx int"
    state_schema = f"members array<{id_type}>"

    def fn(key, pdfs, state: GroupState):
        band_idx = int(key[0])
        members = list(state.get[0]) if state.exists else []
        stored = set(members)
        new_ids, prior_ids = [], []
        # drain ALL chunks before ordering: a bucket larger than one
        # Arrow chunk would otherwise process ids in chunk-then-sorted
        # order, storing different priors than the batch branch's
        # global id ranking (the single-batch parity contract)
        batch_ids = set()
        for pdf in pdfs:
            batch_ids.update(pdf[id_col])
        for i in sorted(batch_ids):
            if i in stored:
                continue
            for m in members:
                new_ids.append(i)
                prior_ids.append(m)
            if len(members) < max_bucket:
                members.append(i)
                stored.add(i)
        state.update((members,))
        yield pd.DataFrame(
            {
                "new_id": new_ids,
                "prior_id": prior_ids,
                "band_idx": [band_idx] * len(new_ids),
            }
        )

    return bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_bloom_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """BOUNDED-STATE streaming exact-key dedup: a Bloom filter of the
    md5 content keys carried as applyInPandasWithState state. The two
    exact streaming dedups hold state proportional to what they've
    seen (dropDuplicatesWithinWatermark bounds it by TIME; the LSH
    bucket state by membership caps); this one holds ceil(m/62)
    BIGINT words FOREVER — the 100 TB trade: state that never grows,
    paid for with a quantified false-positive rate.

    Semantics per arriving doc: ``dup`` is true iff all k of its
    key's bits were already set. NO FALSE NEGATIVES — a true repeat
    of an inserted key always probes true, so a kept corpus never
    contains two copies of the same text; a novel doc is falsely
    dropped with the Bloom FPR ((1 − e^(−kn/m))^k, ~1e-5 at the
    defaults for 10k keys). Hashing is the batch sketch's md5-window
    device (functions/sketches.py), python-side byte-for-byte, so the
    final state equals ``bloom_build`` over the kept keys — pinned in
    tests/test_streaming.py along with sparse-regime equality to
    exact dedup and the kill-and-resume restart.

    Within one micro-batch, ids process in sorted order (the
    keep-smallest-id convention of the batch dedup family)."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from prohap_spark.functions.sketches import BLOOM_WORD_BITS

    n_words = (m_bits + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, dup boolean, n_seen long"
    state_schema = "words array<long>, n long"

    def positions(key: str) -> list[int]:
        hx = hashlib.md5(key.encode()).hexdigest()
        return [int(hx[5 * j : 5 * j + 5], 16) % m_bits for j in range(k)]

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            words, n_seen = state.get
            words = list(words)
        else:
            words, n_seen = [0] * n_words, 0
        rows = {}
        for pdf in pdfs:
            for i, doc_key in zip(pdf[id_col], pdf["__key"]):
                rows.setdefault(i, str(doc_key))
        out_ids, out_dup, out_n = [], [], []
        for i in sorted(rows):
            pos = positions(rows[i])
            hit = all(
                words[p // BLOOM_WORD_BITS] >> (p % BLOOM_WORD_BITS) & 1
                for p in pos
            )
            if not hit:
                for p in pos:
                    words[p // BLOOM_WORD_BITS] |= 1 << (p % BLOOM_WORD_BITS)
                n_seen += 1
            out_ids.append(i)
            out_dup.append(hit)
            out_n.append(n_seen)
        state.update((words, n_seen))
        yield pd.DataFrame({id_col: out_ids, "dup": out_dup, "n_seen": out_n})

    src = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__key")
    ).withColumn("__g", F.lit(1))
    return src.groupBy("__g").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

"""Context-window packing: assign every document a contiguous token
span in a virtual concatenated token stream, then split that stream
into fixed-length training sequences (the GPT-style "concatenate and
chunk at max_len" packing strategy) — the manifest a sequence-builder
job materializes before tokenized examples are written.

The 100 TB shape: documents are first sharded by a deterministic
content-hash bucket (the unit real pipelines pack within — a global
total order over 100 TB would serialize on one task), then ordered
within the shard by a second hash (the deterministic "shuffle" of the
corpus), and the running token offset is a window cumsum PARTITIONED
BY shard — Spark executes one sort + one streaming cumsum per shard,
all shards in parallel, no global exchange. Sequence membership is
pure arithmetic on the offsets (no second pass over the text), and
the boundary-spanning explode emits at most
ceil(doc_tokens / seq_len) + 1 rows per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from prohap_spark.functions.hashing import md5_bucket


def pack_context_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 128,
    n_shards: int = 8,
) -> DataFrame:
    """Pack whitespace-tokenized documents into fixed ``seq_len``-token
    training sequences per shard. Returns one row per (document,
    sequence) incidence: (id_col, shard, seq_id, n_tokens, start_off,
    tok_start, tokens_in_seq) where ``seq_id`` numbers sequences within
    the shard, ``start_off`` is the document's offset in the shard's
    concatenated stream, ``tok_start`` is where inside ``seq_id`` the
    document's tokens begin, and ``tokens_in_seq`` is how many of the
    document's tokens land in that sequence (a document crossing a
    boundary contributes rows to every sequence it spans)."""
    idc = F.col(id_col)
    d = df.select(
        idc,
        md5_bucket(idc, n_shards).cast("int").alias("shard"),
        F.md5(idc.cast("string")).alias("__okey"),
        F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        d.withColumn("__end", F.sum("n_tokens").over(w))
        .withColumn("start_off", F.col("__end") - F.col("n_tokens"))
        .withColumn("__first", F.floor(F.col("start_off") / seq_len))
        .withColumn("__last", F.floor((F.col("__end") - 1) / seq_len))
    )
    # n_tokens == 0 would make __last = __first - 1 and F.sequence
    # would generate a DESCENDING range instead of an empty one —
    # unreachable with the whitespace tokenizer (split of trimmed text
    # yields >= 1 element) but made explicit so a future regex-split or
    # filtering tokenizer can't silently emit bogus rows
    ex = d.where(F.col("n_tokens") > 0).select(
        idc,
        "shard",
        "n_tokens",
        "start_off",
        F.explode(F.sequence(F.col("__first"), F.col("__last"))).alias("seq_id"),
        F.col("__end").alias("__end"),
    )
    seq_start = F.col("seq_id") * seq_len
    return ex.select(
        idc,
        "shard",
        "seq_id",
        "n_tokens",
        "start_off",
        (F.greatest(F.col("start_off"), seq_start) - seq_start).alias("tok_start"),
        (
            F.least(F.col("__end"), seq_start + seq_len)
            - F.greatest(F.col("start_off"), seq_start)
        ).alias("tokens_in_seq"),
    )


def pack_best_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 128,
    n_shards: int = 8,
) -> DataFrame:
    """Best-fit-decreasing document packing (the padding-minimizing
    alternative to concat-and-chunk): documents are binned whole — no
    document spans a sequence boundary — each placed into the
    TIGHTEST-FITTING open bin (smallest remaining space that still
    fits), within each deterministic md5 shard. Returns one row per
    document: (id_col, shard, n_tokens, bin_id, bin_fill) where
    bin_fill is the bin's final token total (<= seq_len; padding =
    seq_len - bin_fill). Documents longer than seq_len get their own
    overflow bin, flagged by bin_fill > seq_len (callers truncate or
    route to the chunking packer).

    The 100 TB shape: bin packing is inherently sequential, so the
    sequential unit is the SHARD, not the corpus — one applyInPandas
    group per (shard), each packing its own slice independently (the
    same determinism contract as ``pack_context_windows``: md5
    ordering, so the assignment is reproducible across runs and
    repartitions). Within a shard the sort is by (n_tokens DESC, md5,
    id) — the "decreasing" — and ties in bin tightness break on the
    lowest bin id. Shard count is the parallelism knob; raise it with
    corpus size."""
    import pandas as pd

    idc = F.col(id_col)
    base = df.select(
        idc,
        md5_bucket(idc, n_shards).cast("int").alias("shard"),
        F.md5(idc.cast("string")).alias("__okey"),
        F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long").alias("n_tokens"),
    )
    out_schema = (
        f"{id_col} long, shard int, n_tokens long, bin_id long, bin_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "__okey", id_col], ascending=[False, True, True]
        )
        fills: list[int] = []
        assign: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            placed = None
            if n <= seq_len:
                best_rem = None
                for b, f in enumerate(fills):
                    rem = seq_len - f - n
                    if rem >= 0 and (best_rem is None or rem < best_rem):
                        placed, best_rem = b, rem
                        if rem == 0:
                            break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            fills[placed] += n
            assign.append(placed)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "shard": pdf["shard"].values,
                "n_tokens": pdf["n_tokens"].values,
                "bin_id": assign,
                "bin_fill": [fills[b] for b in assign],
            }
        )

    return base.groupBy("shard").applyInPandas(pack, out_schema)

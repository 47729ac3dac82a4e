"""Streaming data-mixture budget enforcement: the per-(source, shard)
token allocation of ``sampling_token_budget`` carried ACROSS
micro-batches in GroupState — the form the operator takes when the
corpus arrives as a stream (crawl output, ingestion pipeline) instead
of a parquet snapshot.

The 100 TB / streaming shape: state is one cumulative token counter
per (source, shard) key — a single long per state-store entry,
partitioned by the grouping key like every keyed state here. Admission
is deterministic WITHIN a micro-batch (the same (md5(id), id) order
the batch operator uses); across batches it is arrival-order, which is
the realistic streaming semantics — a source's budget fills as its
documents arrive, and later batches see the accumulated count. For a
single-batch input the emitted rows therefore equal the batch
operator's exactly (the parity test pins this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from prohap_spark.functions.hashing import md5_bucket


def stream_token_budget(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    budget_per_source: int = 800,
    n_shards: int = 4,
) -> DataFrame:
    """(doc_id, source, shard, n_tokens, cum_tokens, kept) with
    ``kept`` true while the (source, shard) cumulative whitespace-token
    count fits the shard's slice of ``budget_per_source``. Batch inputs
    run the identical allocation as one window cumsum (the
    ``sampling_token_budget`` plan); streaming inputs carry the
    counter in ``applyInPandasWithState``."""
    shard_budget = budget_per_source // n_shards
    base = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        md5_bucket(F.col(id_col), n_shards).cast("int").alias("shard"),
        F.md5(F.col(id_col).cast("string")).alias("__okey"),
        F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long").alias("n_tokens"),
    )

    if not docs.isStreaming:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("source", "shard")
            .orderBy("__okey", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return base.select(
            id_col,
            "source",
            "shard",
            "n_tokens",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
        ).withColumn("kept", F.col("cum_tokens") <= shard_budget)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # derive the id field's output type from the input schema (ADVICE
    # r6): hardcoding `long` + int(doc_id) broke the documented
    # batch/stream parity for string or other non-integral id columns
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, source string, shard int, n_tokens long, "
        "cum_tokens long, kept boolean"
    )
    state_schema = "cum long"

    def fn(key, pdfs, state: GroupState):
        cum = state.get[0] if state.exists else 0
        # a group arrives as MULTIPLE pandas chunks (split at the Arrow
        # batch size); sorting per chunk would admit in chunk-then-md5
        # order and break the documented batch parity for groups larger
        # than one chunk — drain everything, sort ONCE
        chunks = [pdf[[id_col, "__okey", "n_tokens"]] for pdf in pdfs]
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        batch = batch.sort_values(["__okey", id_col])
        ids, toks, cums = [], [], []
        for doc_id, n in zip(batch[id_col], batch["n_tokens"]):
            cum += int(n)
            ids.append(doc_id)
            toks.append(int(n))
            cums.append(cum)
        state.update((cum,))
        yield pd.DataFrame(
            {
                id_col: ids,
                "source": [key[0]] * len(ids),
                "shard": [int(key[1])] * len(ids),
                "n_tokens": toks,
                "cum_tokens": cums,
                "kept": [c <= shard_budget for c in cums],
            }
        )

    return base.groupBy("source", "shard").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

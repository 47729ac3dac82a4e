"""CDC chunker scale probe (r11): measure the cost model of the two
content-defined chunking implementations —

- ``cdc_chunk_table`` (column algebra): per-position context re-concat
  + hash => O(n_words · window) work per document;
- ``cdc_chunk_table_rolling`` (Rabin rolling polynomial in a pandas
  kernel): O(1) per word => O(n_words), window-independent.

Two sweeps over synthetic corpora (constant total words, so totals are
directly comparable):

1. WINDOW sweep (the claim that matters at 100 TB: boundary-context
   width is a tuning knob that must not multiply the scan cost):
   window ∈ {3, 12, 48} at fixed doc length — the column variant's
   wall should grow with window, the rolling variant's stay flat.
2. DOC-LENGTH sweep: L ∈ {500, 2000, 8000} words (doc count scaled to
   keep total words constant) — both variants should stay ~flat per
   word (linearity in n), with the rolling kernel's constant smaller
   at larger windows.

Usage: python tools/cdc_scale_probe.py [--total-words 1000000]
Prints a markdown table; exits 0 always (a measurement tool, not a
gate — the CI pin for the rolling kernel is the incremental==fresh
equality in tests/test_operators.py::test_cdc_rolling_kernel_properties).
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")

TOTAL = 1_000_000
if "--total-words" in sys.argv:
    TOTAL = int(sys.argv[sys.argv.index("--total-words") + 1])


def corpus(spark, n_docs: int, doc_words: int):
    rng = random.Random(13)
    vocab = [f"w{v}" for v in range(2000)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(doc_words)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    from prohap_spark.operators.dedup import (
        cdc_chunk_table,
        cdc_chunk_table_rolling,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("cdc_scale_probe")

    print(f"total words per cell: {TOTAL}")
    print("\n## window sweep (doc length 2000)\n")
    print("| window | column s | rolling s | col ns/word | roll ns/word |")
    print("|---|---|---|---|---|")
    df = corpus(spark, TOTAL // 2000, 2000)
    df.cache().count()
    for w in (3, 12, 48):
        kw = dict(window=w, divisor=16, min_words=8, max_words=64)
        # warm + best-of-2 to shave scheduler noise
        tc = min(timed(cdc_chunk_table(df, "doc_id", "text", **kw)) for _ in range(2))
        tr = min(
            timed(cdc_chunk_table_rolling(df, "doc_id", "text", **kw))
            for _ in range(2)
        )
        print(
            f"| {w} | {tc:.2f} | {tr:.2f} | {tc / TOTAL * 1e9:.0f} "
            f"| {tr / TOTAL * 1e9:.0f} |"
        )
    df.unpersist()

    print("\n## doc-length sweep (window 12)\n")
    print("| doc words | n docs | column s | rolling s |")
    print("|---|---|---|---|")
    for length in (500, 2000, 8000):
        d2 = corpus(spark, TOTAL // length, length)
        d2.cache().count()
        kw = dict(window=12, divisor=16, min_words=8, max_words=64)
        tc = min(timed(cdc_chunk_table(d2, "doc_id", "text", **kw)) for _ in range(2))
        tr = min(
            timed(cdc_chunk_table_rolling(d2, "doc_id", "text", **kw))
            for _ in range(2)
        )
        print(f"| {length} | {TOTAL // length} | {tc:.2f} | {tr:.2f} |")
        d2.unpersist()

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

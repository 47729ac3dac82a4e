"""Trigram-index economics probe: measures, at sf0.1, what the
posting intersect actually prunes — the numbers behind
text_trgm_search's 100 TB story, re-measurable every round.

For each needle: candidate count (docs surviving the all-grams
intersect = docs whose TEXT the verify must touch), true matches,
and the prune factor vs the full corpus. Interpretation for a
cluster: the verify's contains() is the expensive byte-level pass;
the index converts "read every document" into "read candidates",
and the prune factor is the I/O reduction. The 2-char needle prints
its honest fallback (candidates = corpus).

Usage: python tools/trgm_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NEEDLES = ["spark value", "slow filter", "merge batch", "zzzz", "vector", "qu"]


def main() -> None:
    from pyspark.sql import functions as F

    from prohap_spark.operators.trgm import (
        build_trigram_index,
        like_candidates,
        like_search,
    )
    from prohap_spark.session import get_spark

    spark = get_spark("trgm-probe")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).localCheckpoint(eager=False)
    n_docs = d.count()

    t0 = time.monotonic()
    idx = build_trigram_index(d, "doc_id", "text").localCheckpoint(eager=False)
    n_postings = idx.count()
    build_wall = time.monotonic() - t0

    print(json.dumps({
        "n_docs": n_docs,
        "n_posting_rows": n_postings,
        "index_build_wall_s": round(build_wall, 2),
    }))

    for needle in NEEDLES:
        cand = like_candidates(idx, "doc_id", needle)
        n_cand = n_docs if cand is None else cand.count()
        t0 = time.monotonic()
        n_true = like_search(d, idx, "doc_id", "text", needle).count()
        wall = time.monotonic() - t0
        print(json.dumps({
            "needle": needle,
            "candidates": n_cand,
            "true_matches": n_true,
            "prune_factor": round(n_docs / max(n_cand, 1), 1),
            "search_wall_s": round(wall, 2),
            "fallback": cand is None,
        }))

    # the sf tables' ~40-word vocabulary makes the numbers above a
    # WORST CASE (few distinct trigrams -> fat posting lists). Second
    # measurement: a seeded diverse-vocabulary corpus (20k synthetic
    # word types) approximating natural text's trigram diversity.
    import random

    rng = random.Random(1212)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(3, 10)))
        for _ in range(20000)
    ]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(30, 120))))
        for i in range(5000)
    ]
    dd = spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()
    idx2 = build_trigram_index(dd, "doc_id", "text").localCheckpoint(eager=False)
    # needles: one word planted in a known fraction of docs
    planted = vocab[0]
    for needle in (planted, vocab[1] + " " + vocab[2], "qzx"):
        cand = like_candidates(idx2, "doc_id", needle)
        n_cand = 5000 if cand is None else cand.count()
        n_true = like_search(dd, idx2, "doc_id", "text", needle).count()
        print(json.dumps({
            "corpus": "diverse20k",
            "needle_kind": "word" if needle == planted else
                           ("phrase" if " " in needle else "rare-gram"),
            "candidates": n_cand,
            "true_matches": n_true,
            "prune_factor": round(5000 / max(n_cand, 1), 1),
        }))

    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark decontamination: mark training documents that share word
n-grams with an evaluation/benchmark set (the standard guard against
test-set leakage in LLM training corpora).

Scale design (the corpus is the 100-TB side; benchmarks are MBs):
- the benchmark collapses to a DISTINCT xxhash64 shingle set and is
  BROADCAST — no shuffle touches the corpus for the membership probe;
- the corpus is scanned ONCE: shingle → explode → hashed broadcast
  left join → groupBy(doc). The groupBy partially aggregates map-side,
  so the exchange carries one (doc, partial) row per task, never the
  exploded gram table;
- joining on the 8-byte hash instead of the gram string keeps the
  broadcast small; a cross-gram hash collision inside one document is
  the only miscount risk (~2^-64 per pair — negligible, and benign:
  it can only overcount overlap by 1).

The reference engine has no decontamination surface (this is part of
the training-data operator family layered on top, SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from prohap_spark.operators.dedup import shingle_table


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    ngram: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Per training document: its distinct word-``ngram`` count, how
    many of those shingles appear anywhere in ``benchmark``, and a
    ``contaminated`` flag (``overlap_ngrams >= min_overlap``).
    Documents with fewer than ``ngram`` words have zero shingles and
    are never contaminated."""
    bench_set = (
        shingle_table(benchmark, bench_id_col, bench_text_col, ngram)
        .select(F.explode("__tokens").alias("__gram"))
        .select(F.xxhash64("__gram").alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_grams = shingle_table(docs, id_col, text_col, ngram).select(
        F.col(id_col), F.explode_outer("__tokens").alias("__gram")
    )
    marked = doc_grams.withColumn("__gh", F.xxhash64("__gram")).join(
        F.broadcast(bench_set), "__gh", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("__gram").alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("overlap_ngrams"),
        )
        .withColumn("contaminated", F.col("overlap_ngrams") >= min_overlap)
    )

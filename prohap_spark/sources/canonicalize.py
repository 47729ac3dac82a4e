"""Canonicalization to chromosome-partitioned Parquet (SURVEY §1.3 /
§2.1 S10).

The reference physically splits every input per chromosome with grep
(Snakefile:118-135) and wires 23 copies of each rule. Here that layout
is one ``partitionBy('chrom')`` parquet write: downstream reads get
Hive-style partition pruning (a per-chromosome query touches one
directory), scan-level predicate pushdown, and column pruning — the
optimizations the reference hand-builds become storage-layout
properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def canonicalize_variants(
    variants: DataFrame, out_dir: str, sort_within: bool = True
) -> None:
    """VCF rows → parquet partitioned by chrom, position-sorted within
    partitions (the reference's sortedness precondition,
    vcf_reader.py:96, becomes a layout property)."""
    df = variants
    if sort_within:
        df = df.repartition("chrom").sortWithinPartitions("pos")
    df.write.mode("overwrite").partitionBy("chrom").parquet(out_dir)


def canonicalize_transcripts(transcripts: DataFrame, out_dir: str) -> None:
    transcripts.write.mode("overwrite").partitionBy("chrom").parquet(out_dir)


def read_canonical(spark: SparkSession, path: str, chrom: str | None = None) -> DataFrame:
    """Partition-pruned read: the chrom filter is satisfied from the
    directory layout, not by scanning data (F3 at zero IO cost)."""
    df = spark.read.parquet(path)
    if chrom is not None:
        df = df.where(F.col("chrom") == chrom)
    return df

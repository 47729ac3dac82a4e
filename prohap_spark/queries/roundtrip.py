"""Driver-visible ROUND-TRIP checks for the text sources/sinks
(S1/S5/S8/S9): the Spark side serializes the deterministic synthetic
cohort through the engine's own FASTA/VCF writer, re-reads it with the
engine's reader, and projects record-level digests; the oracle computes
the same digests straight from the cohort parquet. A parser or
serializer defect anywhere in the loop (header conventions, sequence
wrapping, genotype tab layout, INFO round-trip) breaks the hash match —
this puts the text-format surface on the correctness board instead of
living only in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.queries.registry import register

_DIR = "/tmp/prohap_bench_cohort_s1"
_RT_FASTA = "/tmp/prohap_rt_fasta"
_RT_VCF = "/tmp/prohap_rt_vcf"


@register(
    "s5_fasta_roundtrip",
    f"""
    SELECT tag, accession, description,
           CAST(length(sequence) AS BIGINT) AS n_chars,
           md5(sequence) AS seq_md5
    FROM read_parquet('{_DIR}/cdna/*.parquet')
    """,
)
def s5_fasta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 write → S5 read round trip over the cohort cDNA set (601
    records, 60-char wrapped, '>tag|accession|description' headers with
    EMPTY descriptions — the edge the reader's pipe detection must
    survive). Digest projection compared against the parquet truth."""
    from prohap_spark.pipeline.synthetic import materialized_cohort
    from prohap_spark.sources.fasta import read_fasta, write_fasta

    _v, _t, cdna, _n, _m = materialized_cohort(spark, scale=1)
    write_fasta(cdna, _RT_FASTA)
    rt = read_fasta(spark, _RT_FASTA)
    return rt.select(
        "tag",
        "accession",
        "description",
        F.length("sequence").cast("long").alias("n_chars"),
        F.md5("sequence").alias("seq_md5"),
    )


@register(
    "s1_vcf_roundtrip",
    f"""
    SELECT chrom, pos, id, ref, alt, af,
           md5(array_to_string(genotypes, ',')) AS gt_md5
    FROM read_parquet('{_DIR}/variants/*.parquet')
    """,
)
def s1_vcf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 write → S1 read → multi-allelic split round trip over the
    cohort VCF (1000 rows × 50 samples): meta-header block, #CHROM
    header, tab-joined genotype matrix, INFO AF re-extraction, GT
    renumbering. Genotype digests + parsed AF compared against the
    parquet truth."""
    from prohap_spark.pipeline.synthetic import materialized_cohort
    from prohap_spark.sources.vcf import read_vcf, split_multiallelic, write_vcf

    variants, _t, _c, names, _m = materialized_cohort(spark, scale=1)
    write_vcf(
        variants,
        _RT_VCF,
        sample_names=names,
        meta_header=["##fileformat=VCFv4.2", "##source=prohap_spark_roundtrip"],
    )
    rt = split_multiallelic(read_vcf(spark, _RT_VCF))
    return rt.select(
        "chrom",
        "pos",
        "id",
        "ref",
        "alt",
        "af",
        F.md5(F.concat_ws(",", "genotypes")).alias("gt_md5"),
    )

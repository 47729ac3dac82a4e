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

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.queries.registry import register

from prohap_spark.pipeline.synthetic import COHORT_BASE

_DIR = f"{COHORT_BASE}_s1"
# sink dirs are pid-suffixed: two harnesses (driver, tools/check.py,
# tools/plan_audit.py) may run the same roundtrip query concurrently,
# and a shared path lets one clobber the other mid-write
_RT_FASTA = f"/tmp/prohap_rt_fasta_{os.getpid()}"
_RT_VCF = f"/tmp/prohap_rt_vcf_{os.getpid()}"


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


_RT_GTF = f"/tmp/prohap_rt_gtf_{os.getpid()}"

# the pid-suffixed dirs would otherwise accumulate across runs —
# remove this process's dirs on exit (best-effort)
import atexit as _atexit
import shutil as _shutil

for _d in (_RT_FASTA, _RT_VCF, _RT_GTF):
    _atexit.register(_shutil.rmtree, _d, True)


@register(
    "s4_gtf_roundtrip",
    f"""
    SELECT transcript_id, gene_id, chrom, start, "end", strand, biotype,
           CAST(len(exons) AS BIGINT) AS n_exons,
           md5(array_to_string(
             list_transform(exons, e -> e['start'] || '-' || e['end']), ';'))
             AS exons_md5,
           start_codon
    FROM read_parquet('{_DIR}/transcripts/*.parquet')
    """,
)
def s4_gtf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 GTF parse round trip, gz-transparent (S3): the cohort
    transcript dim is serialized to GTF feature lines (transcript +
    exon + start_codon rows with quoted-attribute strings), written as
    gzipped text, re-parsed with read_gtf → gtf_dimensions, and
    digest-compared (exon arrays, codon starts, attributes) against
    the parquet truth."""
    from prohap_spark.pipeline.synthetic import materialized_cohort
    from prohap_spark.sources.gtf import gtf_dimensions, read_gtf

    _v, tr, _c, _n, _m = materialized_cohort(spark, scale=1)

    attrs = F.concat(
        F.lit('gene_id "'), F.col("gene_id"),
        F.lit('"; transcript_id "'), F.col("transcript_id"),
        F.lit('"; gene_name "'), F.col("gene_name"),
        F.lit('"; transcript_biotype "'), F.col("biotype"), F.lit('";'),
        F.array_join(
            F.transform(
                F.coalesce("tags", F.array().cast("array<string>")),
                lambda t: F.concat(F.lit(' tag "'), t, F.lit('";')),
            ),
            "",
        ),
    )

    def line(feature, start, end):
        return F.concat_ws(
            "\t",
            F.col("chrom"), F.lit("prohap_spark"), F.lit(feature),
            start.cast("string"), end.cast("string"),
            F.lit("."), F.col("strand"), F.lit("."), attrs,
        )

    t_lines = tr.select(line("transcript", F.col("start"), F.col("end")).alias("value"))
    e_lines = tr.select(
        "chrom", "strand", attrs.alias("__attrs"),
        F.posexplode("exons").alias("__i", "__e"),
    ).select(
        F.concat_ws(
            "\t",
            F.col("chrom"), F.lit("prohap_spark"), F.lit("exon"),
            F.col("__e.start").cast("string"), F.col("__e.end").cast("string"),
            F.lit("."), F.col("strand"), F.lit("."),
            F.concat(F.col("__attrs"), F.lit(' exon_number "'),
                     (F.col("__i") + 1).cast("string"), F.lit('";')),
        ).alias("value")
    )
    sc_lines = tr.where(F.col("start_codon").isNotNull()).select(
        line("start_codon", F.col("start_codon"), F.col("start_codon") + 2).alias("value")
    )
    (
        t_lines.unionByName(e_lines).unionByName(sc_lines)
        .coalesce(1)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(_RT_GTF)
    )

    dims = gtf_dimensions(read_gtf(spark, _RT_GTF))
    t = dims["transcripts"]
    return t.select(
        "transcript_id", "gene_id", "chrom", "start", "end", "strand", "biotype",
        F.size("exons").cast("long").alias("n_exons"),
        F.md5(
            F.array_join(
                F.transform(
                    "exons",
                    lambda e: F.concat(e["start"].cast("string"), F.lit("-"),
                                       e["end"].cast("string")),
                ),
                ";",
            )
        ).alias("exons_md5"),
        "start_codon",
    )

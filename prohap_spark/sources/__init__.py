from prohap_spark.sources.vcf import read_vcf, melt_genotypes, split_multiallelic, write_vcf
from prohap_spark.sources.gtf import read_gtf, gtf_dimensions
from prohap_spark.sources.fasta import read_fasta, write_fasta

__all__ = [
    "read_vcf",
    "melt_genotypes",
    "split_multiallelic",
    "write_vcf",
    "read_gtf",
    "gtf_dimensions",
    "read_fasta",
    "write_fasta",
]

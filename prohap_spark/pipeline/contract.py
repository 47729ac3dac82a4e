"""Reference output contracts: project the engine's typed result tables
onto the reference's exact column sets and string encodings so a user
of the reference can consume our outputs unchanged.

- 21-column haplotype table: process_haplotypes.py:9-32
  (FIXTURES.md §11); HaplotypeID format ``haplo_chr<c>_<hex>``
- 13-column variant table: process_variants.py:10-24
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from prohap_spark.functions.encodings import freq_map_to_string

HAPLOTYPE_COLUMNS = [
    "TranscriptID", "chromosome", "transcript_biotype", "HaplotypeID",
    "VCF_IDs", "DNA_changes", "allele_frequencies", "cDNA_changes",
    "all_protein_changes", "variant_types", "protein_changes",
    "reading_frame", "protein_prefix_length", "start_missing",
    "start_lost", "splice_sites_affected", "occurrence_count",
    "frequency", "frequency_population", "frequency_superpopulation",
    "samples",
]

VARIANT_COLUMNS = [
    "transcriptID", "chromosome", "transcript_biotype", "variantID",
    "vcfID", "DNA_change", "cDNA_change", "protein_change",
    "reading_frame", "protein_prefix_length", "start_missing",
    "start_lost", "splice_site_affected",
]


def haplotype_table(annotated: DataFrame, transcripts: DataFrame) -> DataFrame:
    """annotate_haplotypes() output → the reference's 21-column table
    (typed lists/maps serialized to the ';'/'CODE:float' encodings)."""
    tr = transcripts.select(
        "transcript_id", F.col("chrom").alias("chromosome"),
        F.col("biotype").alias("transcript_biotype"),
    )
    df = annotated.join(F.broadcast(tr), "transcript_id", "left")
    dna_changes = F.array_join(
        F.transform(
            "changes",
            lambda c: F.concat_ws("", c["pos"].cast("string"), F.lit(":"), c["ref"], F.lit(">"), c["alt"]),
        ),
        ";",
    )
    return df.select(
        F.col("transcript_id").alias("TranscriptID"),
        "chromosome",
        "transcript_biotype",
        F.concat(
            F.lit("haplo_chr"), F.col("chromosome"), F.lit("_"),
            F.regexp_extract("haplotype_id", r"haplo_(\w+)", 1),
        ).alias("HaplotypeID"),
        F.array_join(F.transform("changes", lambda c: c["vcf_id"]), ";").alias("VCF_IDs"),
        dna_changes.alias("DNA_changes"),
        F.array_join(
            F.transform("changes", lambda c: F.format_number(c["af"], 5)), ";"
        ).alias("allele_frequencies"),
        F.col("cdna_changes").alias("cDNA_changes"),
        # per-change protein-level list INCLUDING synonymous changes
        # (process_haplotypes.py:18,356); protein_changes below excludes
        # synonymous ones (:20,354-355)
        F.col("all_protein_changes").alias("all_protein_changes"),
        "variant_types",
        "protein_changes",
        "reading_frame",
        "protein_prefix_length",
        "start_missing",
        "start_lost",
        "splice_sites_affected",
        "occurrence_count",
        F.format_number("frequency", 5).alias("frequency"),
        freq_map_to_string("population_freqs").alias("frequency_population"),
        freq_map_to_string("superpopulation_freqs").alias("frequency_superpopulation"),
        F.array_join("samples", ";").alias("samples"),
    )


def variant_table(annotated: DataFrame) -> DataFrame:
    """run_provar() output → the reference's 13-column variant table
    (process_variants.py:10-24). Note: the reference stores its
    ``start_missing`` column inverted (:226 writes ``is not None``);
    this table keeps the documented meaning (True = no annotated start
    codon)."""
    return annotated.select(
        F.col("transcript_id").alias("transcriptID"),
        F.col("chrom").alias("chromosome"),
        F.col("biotype").alias("transcript_biotype"),
        F.col("variant_id").alias("variantID"),
        F.col("item_id").alias("vcfID"),
        F.col("item_id").alias("DNA_change"),
        F.col("cdna_changes").alias("cDNA_change"),
        F.col("all_protein_changes").alias("protein_change"),
        "reading_frame",
        "protein_prefix_length",
        "start_missing",
        "start_lost",
        F.col("splice_sites_affected").alias("splice_site_affected"),
    )

"""Post-processing chain (SURVEY §7.1.4 / reference Snakefile:324-386):
stop-codon fragment split → mix with reference+contaminants → global
duplicate merge with tag priority → UTR-only removal → header
simplification. All pure relational programs (explode / groupBy /
higher-order array ops); one shuffle per stage at most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# A7 tag priority (merge_duplicate_seq.py:64-80)
TAG_PRIORITY = ["cont", "ensref", "ensvar", "var", "manual", "enshap"]


def split_stop_codon_fragments(fasta: DataFrame, min_len: int = 6) -> DataFrame:
    """remove_stop_codons.py:56-100: split protein sequences on '*',
    emit one entry per fragment >= min_len, suffixing the accession
    with the fragment index and labeling fragments after the first
    stop (they are downstream-of-stop products)."""
    frags = fasta.select(
        "tag",
        "accession",
        "description",
        F.posexplode(F.split(F.col("sequence"), r"\*")).alias("frag_idx", "sequence"),
    )
    return (
        frags.where(F.length("sequence") >= min_len)
        .select(
            "tag",
            F.when(F.col("frag_idx") == 0, F.col("accession"))
            .otherwise(F.concat_ws("_frag", F.col("accession"), F.col("frag_idx")))
            .alias("accession"),
            F.when(
                F.col("frag_idx") == 0, F.col("description")
            ).otherwise(F.concat(F.col("description"), F.lit(" post_stop:1"))).alias("description"),
            "sequence",
        )
    )


def merge_duplicate_sequences(fasta: DataFrame) -> DataFrame:
    """A7 global dedup (merge_duplicate_seq.py:20-85): group the whole
    concatenated DB by exact sequence, collect all matching accessions
    and descriptions, resolve the entry tag by fixed priority
    (cont > ensref > ensvar > var > manual > enshap)."""
    grouped = fasta.groupBy("sequence").agg(
        F.array_sort(F.collect_set("tag")).alias("tags"),
        F.array_sort(F.collect_list(F.struct("accession", "description", "tag"))).alias("members"),
    )
    # fold the priority chain from lowest to highest so the highest-
    # priority WHEN ends up outermost
    def has_tag(t: str):
        return F.exists(F.col("tags"), lambda x: x.endswith(F.lit(t)))

    tag = F.element_at(F.col("tags"), 1)
    for t in reversed(TAG_PRIORITY):
        tag = F.when(has_tag(t), F.lit(t)).otherwise(tag)
    return grouped.select(
        tag.alias("tag"),
        F.element_at(F.col("members"), 1)["accession"].alias("accession"),
        F.concat(
            F.lit("matching_proteins:"),
            F.array_join(F.transform("members", lambda m: m["accession"]), ";"),
            F.lit(" matching_tags:"),
            F.array_join(F.transform("members", lambda m: m["tag"]), ";"),
        ).alias("description"),
        "sequence",
    )


def remove_utr_only_entries(merged: DataFrame) -> DataFrame:
    """F9 (remove_UTR_seq.py:19-32): inside each entry's
    matching_proteins ;-list, drop slots whose id marks a UTR product;
    drop the entry entirely when nothing remains. Higher-order
    arrays_zip + filter — no explode."""
    ids = F.split(F.regexp_extract("description", r"matching_proteins:(\S*)", 1), ";")
    tags = F.split(F.regexp_extract("description", r"matching_tags:(\S*)", 1), ";")
    zipped = F.arrays_zip(ids.alias("pid"), tags.alias("ptag"))
    kept = F.filter(zipped, lambda z: ~z["pid"].contains("UTR"))
    out = merged.withColumn("__kept", kept).where(F.size("__kept") > 0)
    return out.select(
        "tag",
        "accession",
        F.concat(
            F.lit("matching_proteins:"),
            F.array_join(F.transform("__kept", lambda z: z["pid"]), ";"),
            F.lit(" matching_tags:"),
            F.array_join(F.transform("__kept", lambda z: z["ptag"]), ";"),
        ).alias("description"),
        "sequence",
    )


def simplify_headers(fasta: DataFrame, transcripts: DataFrame | None = None) -> DataFrame:
    """fasta_simplify_headers.py:45-100: compact accession, optional
    gene-name annotation via the transcripts dim (J8), stable ordering."""
    out = fasta
    if transcripts is not None:
        genes = transcripts.select(
            F.col("transcript_id"), F.coalesce("gene_name", "gene_id").alias("gene")
        )
        tid = F.regexp_extract("description", r"transcript:(\w+)", 1)
        out = (
            out.withColumn("__tid", tid)
            .join(F.broadcast(genes), F.col("__tid") == F.col("transcript_id"), "left")
            .withColumn(
                "description",
                F.when(
                    F.col("gene").isNotNull(),
                    F.concat(F.col("description"), F.lit(" gene:"), F.col("gene")),
                ).otherwise(F.col("description")),
            )
            .drop("__tid", "transcript_id", "gene")
        )
    return out.orderBy("tag", "accession")

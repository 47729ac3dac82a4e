"""Loaders for the reference's REAL peptide-annotation input contract —
the bundled sample fixtures (peptide_annotation/sample_peptides.tsv,
sample_haplotypes.tsv, sample_proteins.fa, wired by config_example.yaml)
— so the J6-J11 + U4 chain runs over the reference's actual file-format
quirks instead of synthetic twins:

- the peptide report's ``Proteins``/``Positions`` are parallel lists
  split on EITHER ``;`` or ``,`` (peptides_annotate_variation.py:199);
- the FASTA description micro-format carries three parallel
  ``;``-separated GROUP lists (``position_within_protein``,
  ``matching_proteins``, ``reading_frame``), where each
  matching-proteins/reading-frame group is itself a ``,``-separated
  list — one entry may stand for many haplotype/transcript proteins
  (common.py:53-64);
- ENST-prefixed matched-protein ids carry ``_<suffix>`` tails that must
  be truncated for transcript identity
  (peptides_annotate_variation.py:222-224);
- the ProHap haplotype table's per-haplotype change lists
  (``DNA_changes`` / ``all_protein_changes``) are ``;``-joined and
  positionally parallel.

Substitutions relative to the reference's full runtime inputs (neither
the Ensembl GTF database nor the reference proteome FASTA is bundled
with the fixtures):

- gene identity: derived as "transcripts sharing a reference-protein
  FASTA entry are one gene" (the ensref entries list all transcripts
  encoding that protein); transcripts without a shared entry fall back
  to themselves. The reference resolves ENST→ENSG via gffutils
  (peptides_annotate_variation.py:245,438).
- canonical proteome: reference-tag FASTA entries are used verbatim;
  for transcripts that have none, the canonical protein is
  RECONSTRUCTED by reverting every verified protein change of one of
  its haplotype entries (the same algebra the reference's
  check_canonical_peptide applies per-peptide,
  peptides_annotate_variation.py:171-190, applied once per protein).
  Entries containing frameshifts are reverted only up to the first
  frameshift position (the downstream suffix is not recoverable at
  protein level) — the reconstruction is then a canonical PREFIX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def parse_fasta_matches(fasta: DataFrame) -> DataFrame:
    """Explode the ProHap FASTA description micro-format: one row per
    (entry × group × matched protein) with the group's sub-sequence
    position and the matched protein's reading frame.

    Returns (tag, accession, sequence, seq_position, matched_protein,
    reading_frame) — reading_frame −1 where unknown ('-')."""
    pos_s = F.regexp_extract("description", r"position_within_protein:(\S+)", 1)
    mp_s = F.regexp_extract("description", r"matching_proteins:(\S+)", 1)
    rf_s = F.regexp_extract("description", r"reading_frame:(\S+)", 1)
    groups = F.arrays_zip(
        F.split(mp_s, ";").alias("mp"),
        F.split(rf_s, ";").alias("rf"),
        F.split(pos_s, ";").alias("sp"),
    )
    g = fasta.select(
        "tag", "accession", "sequence", F.explode(groups).alias("g")
    )
    inner = F.arrays_zip(
        F.split(F.col("g.mp"), ",").alias("p"),
        F.split(F.col("g.rf"), ",").alias("r"),
    )
    m = g.select(
        "tag",
        "accession",
        "sequence",
        F.coalesce(F.col("g.sp").cast("long"), F.lit(0)).alias("seq_position"),
        F.explode(inner).alias("m"),
    )
    rf = F.when(F.col("m.r") == "-", F.lit(-1)).otherwise(
        F.col("m.r").cast("int")
    )
    return m.select(
        "tag",
        "accession",
        "sequence",
        "seq_position",
        F.col("m.p").alias("matched_protein"),
        F.coalesce(rf, F.lit(-1)).alias("reading_frame"),
    )


def load_haplo_db(spark: SparkSession, path: str) -> DataFrame:
    """The ProHap haplotype table, keyed by HaplotypeID — only the
    columns the U4 classifier consumes."""
    t = spark.read.option("sep", "\t").option("header", True).csv(path)
    return t.select(
        F.col("HaplotypeID").alias("matched_protein"),
        F.col("TranscriptID").alias("haplo_transcript_id"),
        F.col("chromosome").alias("haplo_chromosome"),
        F.col("all_protein_changes").alias("haplo_protein_changes"),
        F.col("DNA_changes").alias("haplo_dna_changes"),
        F.col("protein_prefix_length").cast("int").alias("haplo_prefix"),
    )


def _kind() -> F.Column:
    # entry tag decides contaminant/canonical; otherwise the matched
    # protein's id prefix decides the variant flavor
    # (peptides_annotate_variation.py:205,234,281,288,350)
    return (
        F.when(F.col("tag").contains("cont"), "cont")
        .when(F.col("tag").contains("ref"), "ref")
        .when(F.col("matched_protein").startswith("haplo_"), "haplo")
        .when(F.col("matched_protein").startswith("var_"), "var")
        .when(F.col("matched_protein").startswith("man_"), "manual")
        .otherwise("haplo")
    )


def _enst_base(col: F.Column) -> F.Column:
    return F.substring_index(col, "_", 1)


def build_proteins_meta(matches: DataFrame, haplo_db: DataFrame) -> DataFrame:
    """Per-(FASTA accession × matched protein) metadata in the shape
    annotate_peptides_full consumes, with gene identity derived from
    shared reference-protein entries (module docstring)."""
    m = matches.withColumn("kind", _kind())
    m = m.join(F.broadcast(haplo_db), "matched_protein", "left")
    enst = F.when(
        F.col("matched_protein").startswith("ENST"),
        _enst_base(F.col("matched_protein")),
    )
    meta = m.select(
        F.col("accession").alias("protein_accession"),
        "matched_protein",
        "kind",
        "seq_position",
        "reading_frame",
        F.coalesce("haplo_transcript_id", enst).alias("transcript_id"),
        F.coalesce("haplo_prefix", F.lit(0)).alias("protein_prefix_length"),
        F.col("haplo_protein_changes").alias("all_protein_changes"),
        F.col("haplo_dna_changes").alias("dna_changes"),
        F.coalesce(
            "haplo_chromosome",
            # haplo_chr6_50cb → 6 (peptides_annotate_variation.py:401)
            F.regexp_extract("matched_protein", r"chr([^_]+)_", 1),
        ).alias("chromosome"),
    )
    # gene grouping: transcripts listed on the SAME ref entry share a
    # gene; representative = the lexicographic min transcript of the
    # entry. Everything else maps to itself.
    ref_groups = (
        m.where(F.col("kind") == "ref")
        .select("accession", _enst_base("matched_protein").alias("t"))
        .groupBy("accession")
        .agg(F.min("t").alias("gene_rep"), F.collect_set("t").alias("ts"))
        .select(F.explode("ts").alias("transcript_id"), "gene_rep")
        .groupBy("transcript_id")
        .agg(F.min("gene_rep").alias("gene_id"))
    )
    return meta.join(F.broadcast(ref_groups), "transcript_id", "left").select(
        "protein_accession",
        "matched_protein",
        "kind",
        "seq_position",
        "reading_frame",
        "transcript_id",
        F.coalesce("gene_id", "transcript_id").alias("gene_id"),
        "protein_prefix_length",
        "all_protein_changes",
        "dna_changes",
        "chromosome",
    )


def reconstruct_canonical(matches: DataFrame, haplo_db: DataFrame) -> DataFrame:
    """(transcript_id, sequence) canonical proteome: ref-tag entries
    verbatim; otherwise revert one haplotype entry per transcript
    (fewest frameshifts, then longest sequence — deterministic
    tiebreak on entry accession)."""
    m = matches.withColumn("kind", _kind())
    ref = (
        m.where(F.col("kind") == "ref")
        .select(
            _enst_base("matched_protein").alias("transcript_id"), "sequence"
        )
        .dropDuplicates(["transcript_id"])
    )
    h = (
        m.where(F.col("kind") == "haplo")
        .join(F.broadcast(haplo_db), "matched_protein")
        .join(
            ref.select(F.col("transcript_id").alias("haplo_transcript_id")),
            "haplo_transcript_id",
            "left_anti",
        )
        .select(
            F.col("haplo_transcript_id").alias("transcript_id"),
            "accession",
            "sequence",
            "seq_position",
            "reading_frame",
            F.col("haplo_protein_changes").alias("changes"),
            F.col("haplo_prefix").cast("int").alias("prefix"),
        )
        .withColumn(
            "n_fs", F.size(F.split(F.coalesce("changes", F.lit("")), r"\(\+fs\)")) - 1
        )
    )
    w = Window.partitionBy("transcript_id").orderBy(
        F.col("n_fs"), F.length("sequence").desc(), F.col("accession")
    )
    best = h.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)

    import pandas as pd

    from prohap_spark.pipeline.peptides import _parse_change, revert_peptide

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                seq = r.sequence
                start = int(r.seq_position) - int(r.prefix or 0)
                hits = []
                cut = None
                for raw in (r.changes or "").split(";"):
                    if not raw:
                        continue
                    loc, ref_aa, alt_aa, is_fs = _parse_change(
                        raw, int(r.reading_frame)
                    )
                    if is_fs:
                        # suffix not recoverable at protein level
                        cut = loc - start if cut is None else min(cut, loc - start)
                        continue
                    if ref_aa != alt_aa:
                        hits.append((loc - start, ref_aa, alt_aa))
                if cut is not None:
                    seq = seq[: max(cut, 0)]
                    hits = [hit for hit in hits if hit[0] < cut]
                out.append(
                    {
                        "transcript_id": r.transcript_id,
                        "sequence": revert_peptide(seq, 0, hits),
                    }
                )
            if out:
                yield pd.DataFrame(out)

    rec = best.mapInPandas(run, schema="transcript_id string, sequence string")
    return ref.unionByName(rec)


def annotate_reference_sample(spark: SparkSession, fixture_dir: str) -> DataFrame:
    """End-to-end: the reference's bundled sample fixtures through the
    J6-J11 + U4 chain (annotate_peptides_full). One row per peptide."""
    from prohap_spark.pipeline.peptides import annotate_peptides_full
    from prohap_spark.sources.fasta import read_fasta

    peptides = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .csv(f"{fixture_dir}/sample_peptides.tsv")
    )
    fasta = read_fasta(spark, f"{fixture_dir}/sample_proteins.fa")
    matches = parse_fasta_matches(fasta)
    haplo = load_haplo_db(spark, f"{fixture_dir}/sample_haplotypes.tsv")
    meta = build_proteins_meta(matches, haplo)
    canonical = reconstruct_canonical(matches, haplo)
    return annotate_peptides_full(peptides, meta, canonical)

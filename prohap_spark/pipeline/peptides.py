"""Peptide-annotation stage (SURVEY §2.3 J6-J11 + §2.9 U4; reference
peptide_annotation/src/peptides_annotate_variation.py).

Maps identified peptides back to the proteins/variants they came from:

  J6  explode the peptide's Proteins/Positions ;-lists, equi-join FASTA
  J9  I/L-insensitive containment against the canonical proteome
  J10 range probe: variant alleles covered by the peptide window
  J11 canonical-first resolution (window max + conditional filter)
  U4  classification into peptide classes

All joins are relational; the only kernel-ish piece (allele coverage)
is a range join expressed as an interval predicate, not a bisect loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def explode_peptide_matches(peptides: DataFrame) -> DataFrame:
    """J6: one row per (peptide × matching protein), from the ;/,-joined
    Proteins and parallel Positions lists
    (peptides_annotate_variation.py:195-225)."""
    prots = F.split(F.col("Proteins"), "[;,]")
    poss = F.split(F.col("Positions"), "[;,]")
    zipped = F.arrays_zip(prots.alias("protein"), poss.alias("position"))
    return peptides.select(
        F.col("ID").alias("peptide_id"),
        F.col("Sequence").alias("peptide_seq"),
        F.explode(zipped).alias("m"),
    ).select(
        "peptide_id",
        "peptide_seq",
        F.col("m.protein").alias("protein_accession"),
        F.col("m.position").cast("long").alias("position"),
    )


def il_equal(col) -> "F.Column":
    """I/L mass-equivalence normalization
    (peptides_annotate_variation.py:160-163)."""
    return F.translate(col, "I", "L")


def match_canonical(matches: DataFrame, canonical: DataFrame) -> DataFrame:
    """J9: containment of the (I/L-normalized) peptide in any canonical
    protein of the same accession set; flags is_canonical."""
    canon = canonical.select(
        F.col("accession").alias("protein_accession"),
        il_equal(F.col("sequence")).alias("canon_seq"),
    )
    out = matches.join(canon, "protein_accession", "left")
    return out.withColumn(
        "is_canonical",
        F.col("canon_seq").isNotNull()
        & (F.instr(F.col("canon_seq"), il_equal(F.col("peptide_seq"))) > 0),
    ).drop("canon_seq")


def covered_alleles(matches: DataFrame, alleles: DataFrame) -> DataFrame:
    """J10 range probe: alleles whose protein-space position falls in
    [position, position + len(peptide)) for the same protein — the
    distributed form of the reference's bisect probe
    (peptides_annotate_variation.py:145-169). Returns matches with an
    n_covered count and the covered allele ids."""
    has_alt = "alt_aa" in alleles.columns
    a = alleles.select(
        F.col("protein_accession").alias("__acc"),
        F.col("allele_id"),
        F.col("protein_pos"),
        *( [F.col("alt_aa")] if has_alt else [] ),
    )
    # window predicate INSIDE the left-join condition: peptides whose
    # alleles all fall outside the window must survive with null allele
    cond = (
        (matches["protein_accession"] == a["__acc"])
        & (a["protein_pos"] >= matches["position"])
        & (a["protein_pos"] < matches["position"] + F.length(matches["peptide_seq"]))
    )
    j = matches.join(a, cond, "left").drop("__acc")
    if has_alt:
        # U4 expected-alt verification: the peptide must actually carry
        # the allele's alt residue(s) at the covered offset, I/L-
        # insensitive (peptides_annotate_variation.py:329-331 — rows
        # failing this are logged as mismatches, not covered)
        off = (F.col("protein_pos") - F.col("position") + 1).cast("int")
        observed = il_equal(F.col("peptide_seq")).substr(off, F.length("alt_aa"))
        verified = F.col("protein_pos").isNotNull() & (
            observed == il_equal(F.col("alt_aa"))
        )
        j = j.withColumn("__alt_ok", verified)
        keep = F.when(F.col("__alt_ok"), F.col("allele_id"))
    else:
        keep = F.when(F.col("protein_pos").isNotNull(), F.col("allele_id"))
    return j.groupBy(
        "peptide_id", "peptide_seq", "protein_accession", "position", "is_canonical"
    ).agg(
        F.array_sort(F.collect_set(keep)).alias("covered_allele_ids"),
    ).withColumn("n_covered", F.size(F.filter("covered_allele_ids", lambda x: x.isNotNull())))


def resolve_canonical_first(annotated: DataFrame) -> DataFrame:
    """J11: if any match of a peptide is canonical, keep only canonical
    matches (window max + conditional filter,
    peptides_annotate_variation.py:235-242)."""
    w = Window.partitionBy("peptide_id")
    has_canon = F.max(F.col("is_canonical").cast("int")).over(w)
    return annotated.withColumn("__has_canon", has_canon).where(
        (F.col("__has_canon") == 0) | F.col("is_canonical")
    ).drop("__has_canon")


def classify_peptides(resolved: DataFrame) -> DataFrame:
    """U4 classification (peptides_annotate_variation.py:446-466),
    simplified to the reference's principal classes."""
    gene_count = Window.partitionBy("peptide_id")
    n_prots = F.size(F.collect_set("protein_accession").over(gene_count))
    cls = (
        F.when(F.col("protein_accession").startswith("cont"), "contaminant")
        .when(F.col("is_canonical"), "canonical")
        .when(F.col("n_covered") > 1, "multi-variant")
        .when(F.col("n_covered") == 1, "single-variant")
        .otherwise("variant-no-ref")
    )
    spec = F.when(n_prots > 1, "multi-protein").otherwise("proteoform-specific")
    return resolved.withColumn("pep_class", cls).withColumn("specificity", spec)


def revert_peptide(peptide: str, pep_start: int, changes: list[tuple[int, str, str]]) -> str:
    """U4 revert kernel (check_canonical_peptide,
    peptides_annotate_variation.py:171-190): undo the protein-level
    changes covered by a peptide window so the result can be containment-
    tested against the canonical protein. ``changes``: (protein_pos,
    ref_aa, alt_aa) with protein_pos relative to the protein; positions
    are canonical-space. Pure Python — runs inside the Arrow batch of
    the annotation stage when needed.
    """
    out = peptide
    offset = 0
    for pos, ref_aa, alt_aa in sorted(changes, key=lambda c: c[0]):
        loc = pos - pep_start + offset
        if loc < 0 or loc > len(out):
            continue
        if out[loc : loc + len(alt_aa)] != alt_aa:
            continue  # expected alt not present — leave untouched
        out = out[:loc] + ref_aa + out[loc + len(alt_aa) :]
        offset += len(ref_aa) - len(alt_aa)
    return out


def annotate_peptides(
    peptides: DataFrame,
    canonical: DataFrame,
    alleles: DataFrame,
) -> DataFrame:
    """Full J6→J9→J10→J11→U4 chain."""
    m = explode_peptide_matches(peptides)
    m = match_canonical(m, canonical)
    m = covered_alleles(m, alleles)
    m = resolve_canonical_first(m)
    return classify_peptides(m)


def run_peptide_annotation(
    spark,
    peptides_tsv: str,
    canonical_fasta: str,
    alleles_tsv: str | None,
    out_dir: str,
) -> str:
    """Config-driven 4th entry point (peptide_annotation/Snakefile:42-63):
    peptide report TSV + canonical FASTA (+ optional allele table) in,
    classified peptide TSV out."""
    from prohap_spark.sources.fasta import read_fasta
    from prohap_spark.sources.tsv import write_tsv

    peptides = (
        spark.read.option("sep", "\t").option("header", True).csv(peptides_tsv)
    )
    canonical = read_fasta(spark, canonical_fasta)
    if alleles_tsv is not None:
        alleles = (
            spark.read.option("sep", "\t").option("header", True)
            .csv(alleles_tsv)
            .select(
                "protein_accession",
                "allele_id",
                F.col("protein_pos").cast("long").alias("protein_pos"),
            )
        )
    else:
        alleles = spark.createDataFrame(
            [], "protein_accession string, allele_id string, protein_pos long"
        )
    out = annotate_peptides(peptides, canonical, alleles)
    path = f"{out_dir}/peptides_annotated"
    write_tsv(out, path, single_file=True)
    return path

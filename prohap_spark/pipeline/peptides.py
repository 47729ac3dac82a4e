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
    tested against the canonical protein.

    Cumulative-shift note: after replacing an alt allele of length la
    with a ref allele of length lr, later alt-space positions shift by
    lr − la — this kernel accumulates that sign
    (``offset += len(ref) − len(alt)``). The reference accumulates
    ``len(alt) − len(ref)`` (peptides_annotate_variation.py:180-184,
    its ch tuple is (loc, ref, alt)), which mis-places the SECOND
    reverted change when a peptide covers an indel followed by another
    change; for the dominant cases (any number of SAVs, or a single
    covered change of any kind) the shift is zero/unused and the two
    agree. We keep the sign that round-trips (pinned in
    tests/test_peptides.py).

    ``changes``: (protein_pos,
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
    """Simplified relational J6→J9→J10→J11→U4 chain (one row per
    peptide × match). For the reference's full class grid over
    haplotype/variant metadata use :func:`annotate_peptides_full`."""
    m = explode_peptide_matches(peptides)
    m = match_canonical(m, canonical)
    m = covered_alleles(m, alleles)
    m = resolve_canonical_first(m)
    return classify_peptides(m)


# ---------------------------------------------------------------------------
# Full-fidelity U4: the reference's complete class grid
# (peptides_annotate_variation.py:192-466)
# ---------------------------------------------------------------------------

_MATCH_SCHEMA = (
    "peptide_id string, peptide_seq string, protein_accession string, "
    "kind string, transcript_id string, gene_id string, "
    "found_variant boolean, n_dna_alleles int, has_frameshift boolean, "
    "canonical_alternative boolean, has_alt_allele boolean, "
    "pep_changes string, prot_changes string, dna_alleles string, "
    "preceding_indels int"
)


def _parse_change(ch: str, reading_frame: int) -> tuple[int, str, str, bool]:
    """One formatted protein change → (alt_loc, ref_aa, alt_aa, is_fs),
    I/L-normalized and '-'-stripped; multi-frame strings resolved by the
    match's reading frame (peptides_annotate_variation.py:308-313)."""
    if "|" in ch:
        ch = ch.split("|")[max(reading_frame, 0)]
    loc = int(ch.split(">", 1)[1].split(":", 1)[0])
    ref_aa = ch.split(":", 1)[1].split(">", 1)[0].replace("I", "L").replace("-", "")
    alt_aa = ch.split(":", 2)[2].split("(", 1)[0].replace("I", "L").replace("-", "")
    return loc, ref_aa, alt_aa, ch.endswith("(+fs)")


def _classify_match(row) -> dict:
    """Per-(peptide × haplo/var/manual match) U4 kernel: locate covered
    non-synonymous changes, verify the alt residues in the peptide,
    track preceding indels and frameshifts, revert the covered changes
    and containment-test against the canonical protein
    (peptides_annotate_variation.py:276-435)."""
    pep = row.peptide_seq
    pep_il = pep.replace("I", "L")
    kind = row.kind
    prefix = int(row.protein_prefix_length or 0)
    rf = int(row.reading_frame if row.reading_frame is not None else -1)
    pep_start = int(row.position) - prefix
    pep_end = pep_start + len(pep)

    found_variant = kind == "manual"
    has_fs = False
    preceding = 0
    hits: list[tuple[int, str, str]] = []  # (pep_loc, ref, alt)
    pep_changes: list[str] = []
    prot_changes: list[str] = []
    dna: list[str] = []

    changes = [c for c in (row.all_protein_changes or "").split(";") if c]
    dna_changes = (row.dna_changes or "").split(";")
    for j, raw in enumerate(changes):
        loc, ref_aa, alt_aa, is_fs = _parse_change(raw, rf)
        if loc < pep_start:
            has_fs = has_fs or is_fs
            preceding += len(alt_aa) - len(ref_aa)
        elif ((ref_aa != alt_aa) or is_fs) and pep_start <= loc < pep_end:
            has_fs = has_fs or is_fs
            ploc = loc - pep_start
            found = pep_il[ploc : ploc + len(alt_aa)]
            alt_trim = alt_aa[: len(found)]  # cleavage inside the allele
            if found != alt_trim:
                continue  # expected alt absent → mismatch, not covered
            hits.append((ploc, ref_aa, alt_trim))
            pep_changes.append(f"{ploc}:{ref_aa}>{alt_trim}")
            prot_changes.append(raw)
            if j < len(dna_changes) and dna_changes[j]:
                dna.append(f"{row.chromosome or '?'}:{dna_changes[j]}")
            if kind == "var":
                found_variant = True

    # revert the covered changes and test canonical containment
    canonical_alternative = False
    if hits and row.canon_seq:
        reverted = revert_peptide(pep_il, 0, hits)
        canonical_alternative = reverted in row.canon_seq.replace("I", "L")

    return {
        "peptide_id": row.peptide_id,
        "peptide_seq": pep,
        "protein_accession": row.protein_accession,
        "kind": kind,
        "transcript_id": row.transcript_id,
        "gene_id": row.gene_id,
        "found_variant": found_variant,
        "n_dna_alleles": len(dna),
        "has_frameshift": has_fs,
        "canonical_alternative": canonical_alternative,
        "has_alt_allele": any(">" in d for d in dna),
        "pep_changes": ";".join(dict.fromkeys(pep_changes)),
        "prot_changes": ";".join(dict.fromkeys(prot_changes)),
        "dna_alleles": ";".join(dict.fromkeys(dna)),
        "preceding_indels": preceding,
    }


def annotate_peptides_full(
    peptides: DataFrame,
    proteins_meta: DataFrame,
    canonical: DataFrame,
) -> DataFrame:
    """The reference's complete U4 classification, one row per peptide:
    pep_class ∈ {contaminant, canonical, single-variant(ProVar),
    multi-variant, single-variant, variant-no-ref, frameshift,
    canonical-no-ref} × specificity ∈ {proteoform-specific,
    protein-specific, multi-gene} (peptides_annotate_variation.py:
    199-202,234-261,446-466).

    ``proteins_meta``: one row per FASTA accession —
    (protein_accession, kind ∈ {ref, cont, haplo, var, manual},
    transcript_id, gene_id, protein_prefix_length, reading_frame,
    all_protein_changes, dna_changes, chromosome). ``canonical``:
    (transcript_id, sequence) reference proteome for the revert-
    containment test."""
    m = explode_peptide_matches(peptides).join(
        F.broadcast(proteins_meta), "protein_accession", "left"
    )
    # real-format extensions (pipeline/peptide_fixture.py): an entry's
    # sub-sequence offset within the complete protein shifts the
    # peptide position (peptides_annotate_variation.py:225), and when
    # one FASTA accession stands for several matched proteins the
    # match identity — specificity counts, the matching_proteins
    # output — is the matched protein, not the entry accession
    # (peptides_annotate_variation.py:217-222)
    if "seq_position" in proteins_meta.columns:
        m = m.withColumn(
            "position",
            F.col("position") + F.coalesce(F.col("seq_position"), F.lit(0)),
        ).drop("seq_position")
    if "matched_protein" in proteins_meta.columns:
        m = m.withColumn(
            "protein_accession",
            F.coalesce("matched_protein", "protein_accession"),
        ).drop("matched_protein")
    pep_w = Window.partitionBy("peptide_id")
    m = (
        m.withColumn("__any_cont", F.max((F.col("kind") == "cont").cast("int")).over(pep_w))
        .withColumn("__any_ref", F.max((F.col("kind") == "ref").cast("int")).over(pep_w))
    )

    # contaminant short-circuit: any contaminant match decides the class
    contaminants = (
        m.where(F.col("__any_cont") == 1)
        .groupBy("peptide_id", "peptide_seq")
        .agg(F.lit("contaminant").alias("pep_class"), F.lit("contaminant").alias("specificity"))
    )

    # canonical: keep only ENST/ref matches, specificity from their count
    canonical_peps = (
        m.where((F.col("__any_cont") == 0) & (F.col("__any_ref") == 1) & (F.col("kind") == "ref"))
        .groupBy("peptide_id", "peptide_seq")
        .agg(
            F.countDistinct("protein_accession").alias("__np"),
            F.countDistinct(F.coalesce("gene_id", "transcript_id", "protein_accession")).alias("__ng"),
        )
        .select(
            "peptide_id",
            "peptide_seq",
            F.lit("canonical").alias("pep_class"),
            F.when(F.col("__np") == 1, "proteoform-specific")
            .when(F.col("__ng") == 1, "protein-specific")
            .otherwise("multi-gene")
            .alias("specificity"),
        )
    )

    # variant path: per-match Arrow kernel, then the reference decision
    # chain over the per-peptide aggregate
    variant_matches = (
        m.where((F.col("__any_cont") == 0) & (F.col("__any_ref") == 0))
        .drop("__any_cont", "__any_ref")  # itertuples renames _-prefixed cols
        .join(
            canonical.select("transcript_id", F.col("sequence").alias("canon_seq")),
            "transcript_id",
            "left",
        )
    )

    import pandas as pd

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    [_classify_match(r) for r in pdf.itertuples(index=False)]
                )

    classified = variant_matches.mapInPandas(run, schema=_MATCH_SCHEMA)
    # min_changes_found: variants contribute 1; haplotypes contribute
    # their DNA-allele count only when their revert matched canonical
    # (peptides_annotate_variation.py:285,342,409-410)
    min_changes = F.min(
        F.when(F.col("found_variant"), F.lit(1)).when(
            F.col("canonical_alternative"), F.col("n_dna_alleles")
        )
    )
    agg = classified.groupBy("peptide_id", "peptide_seq").agg(
        F.max(F.col("found_variant").cast("int")).alias("__var"),
        F.max(F.col("has_frameshift").cast("int")).alias("__fs"),
        F.max(F.col("canonical_alternative").cast("int")).alias("__canon_alt"),
        F.max(F.col("has_alt_allele").cast("int")).alias("__has_alt"),
        min_changes.alias("__min_changes"),
        F.countDistinct("protein_accession").alias("__np"),
        F.countDistinct(F.coalesce("gene_id", "transcript_id", "protein_accession")).alias("__ng"),
        F.array_join(F.array_sort(F.collect_set(F.when(F.col("pep_changes") != "", F.col("pep_changes")))), "|").alias("covered_changes_peptide"),
        F.array_join(F.array_sort(F.collect_set(F.when(F.col("prot_changes") != "", F.concat_ws(":", "transcript_id", "prot_changes")))), "|").alias("covered_changes_protein"),
        F.array_join(F.array_sort(F.collect_set(F.when(F.col("dna_alleles") != "", F.col("dna_alleles")))), "|").alias("covered_alleles_dna"),
        F.array_join(F.array_sort(F.collect_set("protein_accession")), ";").alias("matching_proteins"),
        F.array_join(F.array_sort(F.collect_set("transcript_id")), ";").alias("matching_transcripts"),
        F.array_join(F.array_sort(F.collect_set(F.coalesce("gene_id", "transcript_id"))), ";").alias("matching_genes"),
    )
    variant_peps = agg.select(
        "peptide_id",
        "peptide_seq",
        F.when(F.col("__var") == 1, "single-variant(ProVar)")
        .when((F.col("__min_changes") > 1) & (F.col("__canon_alt") == 1), "multi-variant")
        .when((F.col("__has_alt") == 1) & (F.col("__canon_alt") == 1), "single-variant")
        .when((F.col("__has_alt") == 1) & (F.col("__fs") == 0), "variant-no-ref")
        .when(F.col("__fs") == 1, "frameshift")
        .otherwise("canonical-no-ref")
        .alias("pep_class"),
        F.when(F.col("__np") == 1, "proteoform-specific")
        .when(F.col("__ng") == 1, "protein-specific")
        .otherwise("multi-gene")
        .alias("specificity"),
        "covered_changes_peptide",
        "covered_changes_protein",
        "covered_alleles_dna",
        "matching_proteins",
        "matching_transcripts",
        "matching_genes",
    )
    base_cols = ["peptide_id", "peptide_seq", "pep_class", "specificity"]
    extra = [c for c in variant_peps.columns if c not in base_cols]
    pad = [F.lit("-").alias(c) for c in extra]
    return (
        contaminants.select(*base_cols, *pad)
        .unionByName(canonical_peps.select(*base_cols, *pad))
        .unionByName(variant_peps)
    )


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

"""U4/J6-J11 peptide-annotation tests."""

import pytest


@pytest.fixture()
def world(spark):
    peptides = spark.createDataFrame(
        [
            ("pep1", "MADEFG", "prot_r1", "0"),              # canonical
            ("pep2", "MANEFG", "prot_v1;prot_v2", "0;0"),    # single-variant, multi-protein
            ("pep3", "XXXXXX", "cont_c1", "0"),              # contaminant
            ("pep4", "ADEFGP", "prot_v1,prot_r1", "1,1"),    # canonical among matches → J11
        ],
        ["ID", "Sequence", "Proteins", "Positions"],
    )
    canonical = spark.createDataFrame(
        [("prot_r1", "MADEFGPK")], ["accession", "sequence"]
    )
    alleles = spark.createDataFrame(
        [
            ("prot_v1", "al1", 2),   # covered by pep2 window [0,6)
            ("prot_v2", "al2", 10),  # outside pep2 window
        ],
        ["protein_accession", "allele_id", "protein_pos"],
    )
    return peptides, canonical, alleles


def test_explode_matches(spark, world):
    from prohap_spark.pipeline.peptides import explode_peptide_matches

    peptides, _, _ = world
    out = explode_peptide_matches(peptides)
    assert out.count() == 6  # 1 + 2 + 1 + 2
    got = {(r["peptide_id"], r["protein_accession"]) for r in out.collect()}
    assert ("pep2", "prot_v2") in got and ("pep4", "prot_r1") in got


def test_full_annotation(spark, world):
    from prohap_spark.pipeline.peptides import annotate_peptides

    peptides, canonical, alleles = world
    out = {
        (r["peptide_id"], r["protein_accession"]): r.asDict()
        for r in annotate_peptides(peptides, canonical, alleles).collect()
    }
    assert out[("pep1", "prot_r1")]["pep_class"] == "canonical"
    assert out[("pep3", "cont_c1")]["pep_class"] == "contaminant"
    # pep2: allele al1 covered on prot_v1 → single-variant
    assert out[("pep2", "prot_v1")]["pep_class"] == "single-variant"
    assert out[("pep2", "prot_v1")]["covered_allele_ids"] == ["al1"]
    # prot_v2 match has no covered allele → variant-no-ref
    assert out[("pep2", "prot_v2")]["pep_class"] == "variant-no-ref"
    assert out[("pep2", "prot_v1")]["specificity"] == "multi-protein"
    # J11: pep4 has a canonical match → the prot_v1 match is discarded
    assert ("pep4", "prot_v1") not in out
    assert out[("pep4", "prot_r1")]["pep_class"] == "canonical"


def test_il_equivalence(spark, world):
    from prohap_spark.pipeline.peptides import annotate_peptides

    peptides = spark.createDataFrame(
        [("pepIL", "MADEFGPK".replace("A", "A"), "prot_r1", "0")],
        ["ID", "Sequence", "Proteins", "Positions"],
    )
    # replace L-vs-I in the peptide: canonical has none; use a canonical
    # with I and a peptide with L
    canonical = spark.createDataFrame([("prot_r1", "MIDEFGPK")], ["accession", "sequence"])
    pep = spark.createDataFrame(
        [("pepIL", "MLDEFGPK", "prot_r1", "0")], ["ID", "Sequence", "Proteins", "Positions"]
    )
    alleles = spark.createDataFrame(
        [], "protein_accession string, allele_id string, protein_pos long"
    )
    out = annotate_peptides(pep, canonical, alleles).collect()
    assert out[0]["pep_class"] == "canonical"


def test_revert_peptide_round_trip():
    """Property (SURVEY §5): applying protein changes then reverting them
    restores the canonical slice."""
    from prohap_spark.pipeline.peptides import revert_peptide

    canonical = "MADEFGPKLQW"
    # apply A2V and del of L8 (0-based canonical positions 1 and 8)
    mutated = "MVDEFGPKQW"  # A->V at 1, L deleted at 8
    # peptide = the whole mutated protein, pep_start 0
    back = revert_peptide(mutated, 0, [(1, "A", "V"), (8, "L", "")])
    assert back == canonical


def test_revert_peptide_indel_before_later_change():
    """The cumulative-shift sign (docstring of revert_peptide): when an
    INDEL precedes another covered change, the later change's alt-space
    position must shift by len(ref) − len(alt) of the earlier revert —
    both orderings round-trip."""
    from prohap_spark.pipeline.peptides import revert_peptide

    canonical = "MADEFGPKLQW"
    # insertion XY after position 2 (alt-space: D at 2 -> DXY), then
    # SAV P->V (canonical 6; alt-space 8 after the +2 insertion)
    mutated = "MADXYEFGVKLQW"
    back = revert_peptide(mutated, 0, [(2, "D", "DXY"), (8, "P", "V")])
    assert back == canonical
    # deletion then SAV: del EF (canonical 3-4), then P->V at alt 4
    mutated2 = "MADGVKLQW"
    back2 = revert_peptide(mutated2, 0, [(3, "EFG", "G"), (4, "P", "V")])
    assert back2 == canonical


def test_revert_peptide_window_offset():
    from prohap_spark.pipeline.peptides import revert_peptide

    # peptide covering positions 4..9 of a protein with V at canonical 5
    pep = "FGVKLQ"
    back = revert_peptide(pep, 4, [(6, "P", "V")])
    assert back == "FGPKLQ"


def test_revert_peptide_mismatch_untouched():
    from prohap_spark.pipeline.peptides import revert_peptide

    pep = "FGXKLQ"
    # expected alt 'V' not present -> unchanged (mismatch logging path,
    # peptides_annotate_variation.py:329-331)
    assert revert_peptide(pep, 4, [(6, "P", "V")]) == pep


def test_run_peptide_annotation(spark, tmp_path):
    """Config-driven 4th entry point: TSV + FASTA in, classified TSV out."""
    import glob

    from prohap_spark.pipeline.peptides import run_peptide_annotation

    pep_tsv = tmp_path / "peptides.tsv"
    pep_tsv.write_text(
        "ID\tSequence\tProteins\tPositions\n"
        "pep1\tMADEFG\tprot_r1\t0\n"
        "pep2\tXXXXXX\tcont_c1\t0\n"
    )
    fa = tmp_path / "canon.fa"
    fa.write_text(">ensref|prot_r1|transcript:T1\nMADEFGPK\n")
    out = run_peptide_annotation(spark, str(pep_tsv), str(fa), None, str(tmp_path / "pout"))
    files = glob.glob(f"{out}/part-*.csv.gz")
    assert len(files) == 1
    import gzip

    with gzip.open(files[0], "rt") as f:
        header = f.readline().strip().split("\t")
        rows = [dict(zip(header, line.strip("\n").split("\t"))) for line in f]
    classes = {r["peptide_id"]: r["pep_class"] for r in rows}
    assert classes == {"pep1": "canonical", "pep2": "contaminant"}


def test_expected_alt_verification(spark):
    """U4: an allele is only 'covered' when the peptide actually carries
    its alt residue at the covered offset (I/L-insensitive)."""
    from prohap_spark.pipeline.peptides import annotate_peptides

    pep = spark.createDataFrame(
        [("pepV", "MVDEFG", "prot_v9", "0")], ["ID", "Sequence", "Proteins", "Positions"]
    )
    canonical = spark.createDataFrame([], "accession string, sequence string")
    alleles = spark.createDataFrame(
        [
            ("prot_v9", "al_ok", 1, "V"),     # peptide[1] == V -> verified
            ("prot_v9", "al_bad", 3, "Q"),    # peptide[3] is E, not Q -> rejected
            ("prot_v9", "al_il", 1, "L"),     # I/L-insensitive: V != L -> rejected
        ],
        "protein_accession string, allele_id string, protein_pos long, alt_aa string",
    )
    out = annotate_peptides(pep, canonical, alleles).collect()
    assert len(out) == 1
    assert out[0]["covered_allele_ids"] == ["al_ok"]
    assert out[0]["pep_class"] == "single-variant"


# ---- full U4 class grid (peptides_annotate_variation.py:446-466) ----


@pytest.fixture()
def grid_world(spark):
    """One peptide per reference class. Canonical protein MADEFGPKLQW on
    T1 (gene G1); T2/G2 a second gene for the specificity axis."""
    peptides = spark.createDataFrame(
        [
            ("pep_cont", "XXXXXX", "cont_c1", "0"),
            ("pep_canon", "MADEFG", "ensref_r1", "0"),
            ("pep_canon_mg", "MADEFG", "ensref_r1;ensref_r2", "0;0"),
            ("pep_provar", "MVDEFG", "var_v1", "0"),
            ("pep_single", "MVDEFG", "haplo_h1", "0"),
            ("pep_multi", "MVDEFGPT", "haplo_h2", "0"),
            ("pep_noref", "MVDEFG", "haplo_h4", "0"),
            ("pep_fs", "MVDRSG", "haplo_h3", "0"),
            ("pep_cnr", "DEFGPK", "haplo_h1", "2"),
        ],
        ["ID", "Sequence", "Proteins", "Positions"],
    )
    meta_rows = [
        # (acc, kind, transcript, gene, prefix, rf, all_protein_changes, dna_changes, chrom)
        ("cont_c1", "cont", None, None, 0, 0, None, None, None),
        ("ensref_r1", "ref", "T1", "G1", 0, 0, None, None, None),
        ("ensref_r2", "ref", "T2", "G2", 0, 0, None, None, None),
        ("var_v1", "var", "T1", "G1", 0, 0, "1:A>1:V", "105:C>T", "1"),
        ("haplo_h1", "haplo", "T1", "G1", 0, 0, "1:A>1:V", "105:C>T", "1"),
        ("haplo_h2", "haplo", "T1", "G1", 0, 0, "1:A>1:V;7:K>7:T", "105:C>T;123:A>C", "1"),
        # frameshift: E at 3 replaced by RS(+fs)
        ("haplo_h3", "haplo", "T1", "G1", 0, 0, "3:E>3:RS(+fs)", "110:G>GA", "1"),
        # same change but on a transcript with NO canonical protein
        ("haplo_h4", "haplo", "T9", "G9", 0, 0, "1:A>1:V", "105:C>T", "9"),
    ]
    meta = spark.createDataFrame(
        meta_rows,
        "protein_accession string, kind string, transcript_id string, "
        "gene_id string, protein_prefix_length int, reading_frame int, "
        "all_protein_changes string, dna_changes string, chromosome string",
    )
    canonical = spark.createDataFrame(
        [("T1", "MADEFGPKLQW"), ("T2", "MADEFGHHHH")],
        ["transcript_id", "sequence"],
    )
    return peptides, meta, canonical


def test_u4_full_class_grid(spark, grid_world):
    from prohap_spark.pipeline.peptides import annotate_peptides_full

    peptides, meta, canonical = grid_world
    out = {
        r["peptide_id"]: r.asDict()
        for r in annotate_peptides_full(peptides, meta, canonical).collect()
    }
    assert out["pep_cont"]["pep_class"] == "contaminant"
    assert out["pep_canon"]["pep_class"] == "canonical"
    assert out["pep_canon"]["specificity"] == "proteoform-specific"
    # two canonical matches on two genes → multi-gene
    assert out["pep_canon_mg"]["pep_class"] == "canonical"
    assert out["pep_canon_mg"]["specificity"] == "multi-gene"
    # var-prefixed match with a verified alt → ProVar class
    assert out["pep_provar"]["pep_class"] == "single-variant(ProVar)"
    # one covered change, revert matches canonical → single-variant
    assert out["pep_single"]["pep_class"] == "single-variant"
    assert out["pep_single"]["covered_changes_peptide"] == "1:A>V"
    assert out["pep_single"]["covered_alleles_dna"] == "1:105:C>T"
    # two covered changes, revert matches canonical → multi-variant
    assert out["pep_multi"]["pep_class"] == "multi-variant"
    # covered change but no canonical protein to revert against
    assert out["pep_noref"]["pep_class"] == "variant-no-ref"
    # frameshift change covered (revert of 'RS'→'E' gives MVD EG — not
    # canonical) → frameshift
    assert out["pep_fs"]["pep_class"] == "frameshift"
    # match region carries no change at all → canonical-no-ref
    assert out["pep_cnr"]["pep_class"] == "canonical-no-ref"
    assert out["pep_cnr"]["specificity"] == "proteoform-specific"


def test_u4_preceding_frameshift_flags_peptide(spark, grid_world):
    """A (+fs) change UPSTREAM of the peptide window still classifies
    the peptide as frameshift (peptides_annotate_variation.py:377-378,
    461-463)."""
    from prohap_spark.pipeline.peptides import annotate_peptides_full

    _, meta, canonical = grid_world
    # peptide at position 6 of h3's protein (downstream of the fs at 3)
    peptides = spark.createDataFrame(
        [("pep_downstream", "GPKLQW", "haplo_h3", "6")],
        ["ID", "Sequence", "Proteins", "Positions"],
    )
    out = annotate_peptides_full(peptides, meta, canonical).collect()
    assert out[0]["pep_class"] == "frameshift"

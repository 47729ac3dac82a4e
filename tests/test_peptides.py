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

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

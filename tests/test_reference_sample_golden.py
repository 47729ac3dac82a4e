"""Golden parity run on the reference's OWN bundled sample fixtures
(peptide_annotation/sample_peptides.tsv, sample_haplotypes.tsv,
sample_proteins.fa — the input contract configured by
config_example.yaml). This is the one test that exercises the
reference's REAL file-format quirks — ``;``/``,`` nested list columns,
the FASTA description micro-format with multi-protein groups, ENST
``_suffix`` truncation, per-haplotype parallel change lists — rather
than synthetic twins. The committed golden pins the full per-peptide
classification (peptides_annotate_variation.py:446-466 is the
contract); any drift in class, specificity, covered changes, or
matched-entity lists fails here.

Substitutions (documented in pipeline/peptide_fixture.py): gene
identity derived from shared ref-entries, canonical proteome
reconstructed by reverting haplotype entries where no ref entry
exists — the fixtures don't bundle the Ensembl GTF or proteome.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

FIXTURE_DIR = "/root/reference/peptide_annotation"
GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "reference_sample_golden.tsv")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def annotated(spark):
    from prohap_spark.pipeline.peptide_fixture import annotate_reference_sample

    df = annotate_reference_sample(spark, FIXTURE_DIR).orderBy("peptide_id")
    return df.toPandas()


def test_reference_sample_matches_committed_golden(annotated):
    golden = pd.read_csv(GOLDEN, sep="\t", dtype=str).fillna("")
    got = annotated.astype(str).reset_index(drop=True)
    golden = golden.reset_index(drop=True)
    assert list(got.columns) == list(golden.columns)
    diffs = []
    for col in golden.columns:
        neq = got[col] != golden[col]
        for i in got.index[neq]:
            diffs.append((got.loc[i, "peptide_id"], col, golden.loc[i, col], got.loc[i, col]))
    assert not diffs, f"classification drift vs committed golden: {diffs[:8]}"


def test_reference_sample_class_grid(annotated):
    """Hand-derived anchor facts about the sample data, independent of
    the golden file (so a wrong golden can't self-certify):
    - the two peptides whose only matches are cont-tagged entries are
      contaminants (pep_1c9c3e → ANT3/serpin, pep_1e5ccd → GAG);
    - the three peptides that also match ref-tagged entries are
      canonical, and their variant matches are discarded;
    - pep_2a87b5 covers haplo_chr4_ba6b's 453:AC>A frameshift →
      'frameshift';
    - pep_414c0a covers ≥2 co-occurring SAVs of ENST00000614923's
      haplotypes with a reverted canonical alternative →
      'multi-variant';
    - every class carries the reference's '-' padding for contaminant
      and canonical rows."""
    by_id = {r.peptide_id: r for r in annotated.itertuples(index=False)}
    assert by_id["pep_1c9c3e"].pep_class == "contaminant"
    assert by_id["pep_1e5ccd"].pep_class == "contaminant"
    for pid in ("pep_110ed", "pep_14b965", "pep_14d8df"):
        assert by_id[pid].pep_class == "canonical", pid
    assert by_id["pep_2a87b5"].pep_class == "frameshift"
    assert "4:56511287:AC>A" in by_id["pep_2a87b5"].covered_alleles_dna
    assert by_id["pep_414c0a"].pep_class == "multi-variant"
    assert by_id["pep_414c0a"].covered_alleles_dna.count(">") >= 2
    # single-variant anchors: exactly one covered alt allele each
    for pid in ("pep_b14d6", "pep_46dedd"):
        r = by_id[pid]
        assert r.pep_class == "single-variant", pid
        assert r.covered_alleles_dna.count(">") == 1, pid
    assert by_id["pep_b14d6"].covered_alleles_dna == "5:1798887:T>G"
    # contaminant/canonical rows pad the variant columns with '-'
    assert by_id["pep_1c9c3e"].matching_proteins == "-"
    assert by_id["pep_110ed"].covered_changes_peptide == "-"


def test_reference_sample_format_quirks_parsed(spark):
    """The loader must reproduce the reference parser's structural
    facts about the sample FASTA (common.py:53-64): 177 entries, 3
    multi-group descriptions, 25 comma-grouped matching-protein lists,
    208 haplotype matches all resolving in the haplotype table, and
    ENST matches truncated at '_'."""
    from prohap_spark.pipeline.peptide_fixture import (
        load_haplo_db,
        parse_fasta_matches,
    )
    from prohap_spark.sources.fasta import read_fasta

    fasta = read_fasta(spark, f"{FIXTURE_DIR}/sample_proteins.fa")
    assert fasta.count() == 177
    m = parse_fasta_matches(fasta)
    assert m.where(m.matched_protein.startswith("haplo_")).count() == 208
    haplo = load_haplo_db(spark, f"{FIXTURE_DIR}/sample_haplotypes.tsv")
    unresolved = (
        m.where(m.matched_protein.startswith("haplo_"))
        .join(haplo, "matched_protein", "left_anti")
        .count()
    )
    assert unresolved == 0
    # multi-protein groups survive the two-level split
    per_entry = m.groupBy("accession").count()
    assert per_entry.where("count > 1").count() >= 25
    # reading frames parse to ints with '-' → -1
    rfs = {r[0] for r in m.select("reading_frame").distinct().collect()}
    assert rfs <= {-1, 0, 1, 2}

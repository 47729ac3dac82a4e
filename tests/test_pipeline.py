"""End-to-end golden tests: mini genome → ProVar / ProHap → hand-computed
haplotype/variant tables and proteins (SURVEY §5 'end-to-end golden')."""

import pytest
from pyspark.sql import functions as F

from tests.genomic_fixtures import SAMPLES, write_fixtures


@pytest.fixture()
def world(spark, tmp_path):
    from prohap_spark.sources.fasta import read_fasta
    from prohap_spark.sources.gtf import gtf_dimensions, read_gtf
    from prohap_spark.sources.vcf import read_vcf, read_vcf_header, split_multiallelic

    gtf, fasta, vcf = write_fixtures(tmp_path)
    dims = gtf_dimensions(read_gtf(spark, gtf))
    cdna = read_fasta(spark, fasta, truncate_version=True)
    variants = split_multiallelic(read_vcf(spark, vcf))
    names = read_vcf_header(spark, vcf)
    meta = spark.createDataFrame(
        SAMPLES, ["sample_name", "sex", "population_code", "superpopulation_code"]
    )
    return dims, cdna, variants, names, meta


def test_provar_end_to_end(world):
    from prohap_spark.pipeline.provar import run_provar

    dims, cdna, variants, _, _ = world
    out = run_provar(variants, dims["transcripts"], cdna)
    rows = {r["item_id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {"1_108_C_T", "1_110_G_A", "1_320_A_G"}

    a = rows["1_110_G_A"]  # T1 '+': codon GAT→AAT, D>N
    assert a["transcript_id"] == "T1"
    assert a["protein"] == "MANEFGPK"
    assert a["variant_types"] == "SAV"
    # reference format: loc_ref:REF_AA>loc_alt:ALT_AA (0-based CDS codon)
    assert a["protein_changes"] == "2:D>2:N"
    assert a["all_protein_changes"] == "2:D>2:N"

    b = rows["1_108_C_T"]  # T1 '+': GCT→GTT, A>V
    assert b["protein"] == "MVDEFGPK"

    d = rows["1_320_A_G"]  # T2 '-': rna 10 T>C, TTT→TCT, F>S
    assert d["transcript_id"] == "T2"
    assert d["protein"] == "MPGSKHK"
    assert d["variant_types"] == "SAV"
    assert d["cdna_changes"] == "10:T>C"


def test_provar_fasta_dedup(world):
    from prohap_spark.pipeline.provar import dedup_protein_fasta, run_provar

    dims, cdna, variants, _, _ = world
    fasta_rows = dedup_protein_fasta(run_provar(variants, dims["transcripts"], cdna)).collect()
    seqs = {r["sequence"] for r in fasta_rows}
    assert seqs == {"MANEFGPK", "MVDEFGPK", "MPGSKHK"}


def test_prohap_extract(world):
    from prohap_spark.pipeline.prohap import extract_haplotypes

    dims, _, variants, names, meta = world
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    rows = {(r["transcript_id"], r["signature"]): r.asDict() for r in haplos.collect()}
    assert set(rows) == {
        ("T1", "110:G:A"),
        ("T1", "108:C:T"),
        ("T2", "320:A:G"),
    }
    a = rows[("T1", "110:G:A")]
    # carriers: S1 phase2, S2 phase1+2 → count 3, freq 3/6
    assert a["occurrence_count"] == 3
    assert a["frequency"] == 0.5
    assert a["samples"] == ["S1:2", "S2:1", "S2:2"]
    # FIN = {S1 male, S2 female} → 4 chromosomes; 3 carriers → 0.75
    assert a["population_freqs"] == {"FIN": 0.75}
    assert a["superpopulation_freqs"] == {"EUR": 0.75}
    b = rows[("T1", "108:C:T")]
    assert b["occurrence_count"] == 2 and b["frequency"] == pytest.approx(0.33333)
    # FIN 1/4, YRI (S3 female alone) 1/2
    assert b["population_freqs"] == {"FIN": 0.25, "YRI": 0.5}
    d = rows[("T2", "320:A:G")]
    assert d["occurrence_count"] == 1 and d["frequency"] == pytest.approx(0.16667)


def test_prohap_annotate(world):
    from prohap_spark.pipeline.prohap import annotate_haplotypes, extract_haplotypes

    dims, cdna, variants, names, meta = world
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    out = annotate_haplotypes(haplos, dims["transcripts"], cdna)
    rows = {(r["transcript_id"], r["cdna_changes"]): r.asDict() for r in out.collect()}
    assert rows[("T1", "9:G>A")]["protein"] == "MANEFGPK"
    assert rows[("T1", "7:C>T")]["protein"] == "MVDEFGPK"
    assert rows[("T2", "10:T>C")]["protein"] == "MPGSKHK"
    assert rows[("T1", "9:G>A")]["occurrence_count"] == 3


def test_prohap_min_count_threshold(world):
    from prohap_spark.pipeline.prohap import annotate_haplotypes, extract_haplotypes

    dims, cdna, variants, names, meta = world
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    out = annotate_haplotypes(haplos, dims["transcripts"], cdna, min_count=2)
    assert out.count() == 2  # T2 haplotype (count 1) filtered


def test_prohap_conflict_islands(world, spark, tmp_path):
    """Two overlapping changes on one phase → that (sample, phase) is
    dropped entirely (get_haplotypes.py:172-184)."""
    from prohap_spark.pipeline.prohap import extract_haplotypes
    from prohap_spark.sources.vcf import read_vcf, read_vcf_header, split_multiallelic

    conflict_vcf = tmp_path / "conflict.vcf"
    conflict_vcf.write_text(
        "\n".join(
            [
                "##fileformat=VCFv4.2",
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
                # S3 phase2 carries BOTH: deletion 108-110 overlaps SNP 110
                "1\t108\tvarE\tCTG\tC\t.\t.\tAF=0.1\tGT\t0|0\t0|0\t0|1",
                "1\t110\tvarA\tG\tA\t.\t.\tAF=0.5\tGT\t0|1\t0|0\t0|1",
            ]
        )
        + "\n"
    )
    dims, _, _, _, meta = None, None, None, None, None
    from prohap_spark.sources.gtf import gtf_dimensions, read_gtf

    gtf, _, _ = write_fixtures(tmp_path)
    dims = gtf_dimensions(read_gtf(spark, gtf))
    variants = split_multiallelic(read_vcf(spark, str(conflict_vcf)))
    names = read_vcf_header(spark, str(conflict_vcf))
    meta = spark.createDataFrame(
        SAMPLES, ["sample_name", "sex", "population_code", "superpopulation_code"]
    )
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    rows = {r["signature"]: r.asDict() for r in haplos.collect()}
    # S3:2 dropped (conflict) → only S1:2 haplotype {varA} survives
    assert set(rows) == {"110:G:A"}
    assert rows["110:G:A"]["samples"] == ["S1:2"]
    assert rows["110:G:A"]["occurrence_count"] == 1


def test_drop_synonymous_only(world):
    from prohap_spark.pipeline.prohap import (
        annotate_haplotypes,
        drop_synonymous_only,
        extract_haplotypes,
    )

    dims, cdna, variants, names, meta = world
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    out = annotate_haplotypes(haplos, dims["transcripts"], cdna)
    # all fixture haplotypes are SAVs -> none suppressed
    assert drop_synonymous_only(out).count() == out.count()


def test_drop_synonymous_only_suppresses(spark, tmp_path):
    """A synonymous-only haplotype (T1 offset 17 T>C, TTT->TTC both F)
    is suppressed."""
    from prohap_spark.pipeline.prohap import (
        annotate_haplotypes,
        drop_synonymous_only,
        extract_haplotypes,
    )
    from prohap_spark.sources.gtf import gtf_dimensions, read_gtf
    from prohap_spark.sources.fasta import read_fasta
    from prohap_spark.sources.vcf import read_vcf, read_vcf_header, split_multiallelic

    gtf, fasta, _ = write_fixtures(tmp_path)
    syn_vcf = tmp_path / "syn.vcf"
    # genomic 118 = cDNA offset 17 on T1 ('T'); T>C is synonymous
    syn_vcf.write_text(
        "\n".join(
            [
                "##fileformat=VCFv4.2",
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
                "1\t118\tvarS\tT\tC\t.\t.\tAF=0.3\tGT\t0|1\t0|0\t0|0",
                "1\t110\tvarA\tG\tA\t.\t.\tAF=0.5\tGT\t0|0\t1|0\t0|0",
            ]
        )
        + "\n"
    )
    dims = gtf_dimensions(read_gtf(spark, gtf))
    cdna = read_fasta(spark, fasta, truncate_version=True)
    variants = split_multiallelic(read_vcf(spark, str(syn_vcf)))
    names = read_vcf_header(spark, str(syn_vcf))
    meta = spark.createDataFrame(SAMPLES, ["sample_name", "sex", "population_code", "superpopulation_code"])
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    out = annotate_haplotypes(haplos, dims["transcripts"], cdna)
    # the kernel itself drops the synonymous-only haplotype on its
    # default ignore_utr path (process_haplotypes.py:393-395)
    assert out.count() == 1
    kept = drop_synonymous_only(out)
    assert kept.count() == 1
    assert kept.collect()[0]["variant_types"] == "SAV"

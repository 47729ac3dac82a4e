"""S10 canonicalization tests: partitioned layout + partition pruning
visible in the physical plan."""

from prohap_spark.plans import formatted_plan


def test_partitioned_write_and_pruning(spark, tmp_path):
    from prohap_spark.sources.canonicalize import canonicalize_variants, read_canonical

    df = spark.createDataFrame(
        [("1", 100, "A", "G"), ("1", 50, "C", "T"), ("2", 10, "G", "A")],
        ["chrom", "pos", "ref", "alt"],
    )
    out = str(tmp_path / "canon")
    canonicalize_variants(df, out)

    import os

    dirs = {d for d in os.listdir(out) if d.startswith("chrom=")}
    assert dirs == {"chrom=1", "chrom=2"}

    pruned = read_canonical(spark, out, chrom="1")
    assert pruned.count() == 2
    plan = formatted_plan(pruned)
    # partition filter must appear as a PartitionFilters entry, not a
    # data filter
    assert "PartitionFilters" in plan and "chrom" in plan.split("PartitionFilters")[1][:200]


def test_x_chromosome_male_haploid(spark, tmp_path):
    """§7.3.3: male chrX (non-PAR) carries ONE haplotype copy — phase 2
    suppressed; denominators use males + 2*(n-males)
    (get_haplotypes.py:118-119, 221-235)."""
    from prohap_spark.pipeline.prohap import extract_haplotypes
    from prohap_spark.sources.gtf import gtf_dimensions, read_gtf
    from prohap_spark.sources.vcf import read_vcf, read_vcf_header, split_multiallelic

    gtf = tmp_path / "x.gtf"
    gtf.write_text(
        "\n".join(
            [
                'X\ttest\ttranscript\t5000000\t5000100\t.\t+\t.\tgene_id "GX"; transcript_id "TX"; transcript_biotype "protein_coding";',
                'X\ttest\texon\t5000000\t5000100\t.\t+\t.\tgene_id "GX"; transcript_id "TX"; exon_number "1";',
                'X\ttest\tstart_codon\t5000000\t5000002\t.\t+\t0\tgene_id "GX"; transcript_id "TX";',
            ]
        )
        + "\n"
    )
    vcf = tmp_path / "x.vcf"
    # S1 male carries the variant on BOTH phases (1|1) — but only phase 1
    # may count; S2 female 0|1 contributes one copy
    vcf.write_text(
        "\n".join(
            [
                "##fileformat=VCFv4.2",
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
                "X\t5000050\tvarX\tA\tG\t.\t.\tAF=0.5\tGT\t1|1\t0|1\t0|0",
            ]
        )
        + "\n"
    )
    dims = gtf_dimensions(read_gtf(spark, str(gtf)))
    variants = split_multiallelic(read_vcf(spark, str(vcf)))
    names = read_vcf_header(spark, str(vcf))
    meta = spark.createDataFrame(
        [("S1", "male", "FIN", "EUR"), ("S2", "female", "FIN", "EUR"), ("S3", "female", "YRI", "AFR")],
        ["sample_name", "sex", "population_code", "superpopulation_code"],
    )
    haplos = extract_haplotypes(variants, names, meta, dims["transcripts"])
    rows = haplos.collect()
    assert len(rows) == 1
    r = rows[0]
    # S1 phase2 suppressed → carriers are S1:1 and S2:2 → count 2
    assert r["occurrence_count"] == 2
    assert r["samples"] == ["S1:1", "S2:2"]
    # denominator: males + 2*(n-males) = 1 + 2*2 = 5 → 2/5 = 0.4
    assert r["frequency"] == 0.4

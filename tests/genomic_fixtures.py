"""Shared synthetic mini-genome fixture (FIXTURES.md schemas):
T1: '+' strand, 2 exons (101-130, 201-230), start codon at 104,
    protein MADEFGPK;
T2: '-' strand, 1 exon (301-330), start codon genomic 328 (rna 0),
    protein MPGFKHK.
"""

T1_CDNA = "AAAATGGCTGATGAATTTGGGCCCAAATAGACGTACGTACGTACGTACGTACGTACGTA"[:60]
T2_CDNA = "ATGCCCGGGTTTAAACATAAATAGACGTAC"

GTF_TEXT = "\n".join(
    [
        '#!genome-build test',
        '1\ttest\ttranscript\t101\t230\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1"; transcript_biotype "protein_coding"; tag "MANE_Select";',
        '1\ttest\texon\t101\t130\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; exon_number "1";',
        '1\ttest\texon\t201\t230\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; exon_number "2";',
        '1\ttest\tstart_codon\t104\t106\t.\t+\t0\tgene_id "G1"; transcript_id "T1";',
        '1\ttest\ttranscript\t301\t330\t.\t-\t.\tgene_id "G2"; transcript_id "T2"; gene_name "GENE2"; transcript_biotype "protein_coding"; tag "Ensembl_canonical";',
        '1\ttest\texon\t301\t330\t.\t-\t.\tgene_id "G2"; transcript_id "T2"; exon_number "1";',
        '1\ttest\tstart_codon\t328\t330\t.\t-\t0\tgene_id "G2"; transcript_id "T2";',
    ]
) + "\n"

FASTA_TEXT = (
    f">cdna|T1.2|chromosome:GRCh38:1:101:230:1\n{T1_CDNA[:30]}\n{T1_CDNA[30:]}\n"
    f">cdna|T2.1|chromosome:GRCh38:1:301:330:-1\n{T2_CDNA}\n"
)

VCF_TEXT = "\n".join(
    [
        "##fileformat=VCFv4.2",
        "##INFO=<ID=AF,Number=A,Type=Float>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
        "1\t108\tvarB\tC\tT\t.\t.\tAF=0.3\tGT\t1|0\t0|0\t0|1",
        "1\t110\tvarA\tG\tA\t.\t.\tAF=0.5\tGT\t0|1\t1|1\t0|0",
        "1\t320\tvarD\tA\tG\t.\t.\tAF=0.2\tGT\t0|1\t0|0\t0|0",
    ]
) + "\n"

# multi-allelic + haploid-normalization exercise
VCF_MULTI_TEXT = "\n".join(
    [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
        "1\t110\tvarM\tG\tA,T\t.\t.\tAF=0.1,0.2\tGT\t1|2\t0",
    ]
) + "\n"

SAMPLES = [
    ("S1", "male", "FIN", "EUR"),
    ("S2", "female", "FIN", "EUR"),
    ("S3", "female", "YRI", "AFR"),
]


def write_fixtures(tmp_path):
    gtf = tmp_path / "anno.gtf"
    gtf.write_text(GTF_TEXT)
    fasta = tmp_path / "cdna.fa"
    fasta.write_text(FASTA_TEXT)
    vcf = tmp_path / "phased.vcf"
    vcf.write_text(VCF_TEXT)
    return str(gtf), str(fasta), str(vcf)

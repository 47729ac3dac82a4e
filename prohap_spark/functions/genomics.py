"""Genomics scalar kernels, JVM-side where possible.

- reverse_complement: native reverse∘translate (SURVEY §2.8 C7,
  replacing Biopython's Seq.reverse_complement at
  /root/reference/src/process_haplotypes.py:202-204);
- translate_cdna_expr: codon→aa translation as a pure column
  expression (aggregate over 3-mers with a map literal lookup) —
  SURVEY §2.8 C8, replacing Seq.transcribe().translate()
  (process_haplotypes.py:369). Staying JVM-side keeps the whole
  per-haplotype annotation stage inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# standard genetic code, DNA codons ('*' = stop)
CODON_TABLE = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


def reverse_complement(seq: str | Column) -> Column:
    c = F.col(seq) if isinstance(seq, str) else seq
    return F.reverse(F.translate(c, "ACGTacgt", "TGCAtgca"))


def _codon_map() -> Column:
    kv = []
    for k, v in CODON_TABLE.items():
        kv.append(F.lit(k))
        kv.append(F.lit(v))
    return F.create_map(*kv)


def translate_cdna_expr(seq: str | Column, frame_offset: int = 0, to_stop: bool = False) -> Column:
    """Translate a DNA string to amino acids starting at ``frame_offset``
    (0/1/2). Unknown codons → 'X'; trailing partial codon dropped.
    ``to_stop`` truncates at the first stop codon (exclusive)."""
    c = F.col(seq) if isinstance(seq, str) else seq
    c = F.upper(F.substring(c, frame_offset + 1, 2_000_000_000))
    n_codons = F.floor(F.length(c) / 3).cast("int")
    codons = F.transform(
        F.sequence(F.lit(0), n_codons - 1),
        lambda i: c.substr((i * 3 + 1).cast("int"), F.lit(3)),
    )
    m = _codon_map()
    aas = F.transform(codons, lambda cod: F.coalesce(m[cod], F.lit("X")))
    prot = F.array_join(aas, "")
    prot = F.when(n_codons > 0, prot).otherwise(F.lit(""))
    if to_stop:
        # split at first '*' — element 0 of split on literal '*'
        prot = F.split(prot, r"\*")[0]
    return prot

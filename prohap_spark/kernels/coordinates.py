"""U1/U2 — genomic→cDNA coordinate mapping and start-codon tracking.

Re-implements the semantics of /root/reference/src/coordinates_toolbox.py
(get_rna_position at :9-119, start-codon handling at :121-137) as pure
Python functions. These run inside Arrow-batched grouped-map pandas
UDFs (one group = one transcript, mirroring the reference's own
multiprocessing unit), so they are written dependency-light and
per-haplotype — the distributed axis is the transcript grouping, not
this code.

Conventions (identical to the reference):
- GTF exons are 1-based inclusive [start, end]; exon length =
  end - start + 1 (coordinates_toolbox.py:20);
- cDNA positions returned are 0-based offsets into the transcript's
  spliced sequence in TRANSCRIPT orientation (reverse-complemented
  for '-' strand);
- alleles crossing a splice junction are truncated to the exonic part
  (coordinates_toolbox.py:24-78); an allele spanning an intron into a
  later exon keeps only the in-exon prefix and flags the junction.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Exon:
    start: int  # 1-based inclusive, genomic
    end: int    # 1-based inclusive, genomic


def total_exonic_length(exons: list[Exon]) -> int:
    return sum(e.end - e.start + 1 for e in exons)


def genomic_to_rna(
    pos: int,
    allele_len: int,
    exons: list[Exon],
    strand: str,
    total_len: int | None = None,
) -> tuple[int, int, int] | None:
    """Map a genomic locus [pos, pos + allele_len) to the transcript's
    RNA coordinate space.

    Returns (rna_pos, kept_len, junction_idx):
    - rna_pos: 0-based position in the spliced transcript (orientation-
      adjusted for '-' strand);
    - kept_len: allele length after truncation at splice junctions
      (== allele_len when fully exonic);
    - junction_idx: exon index whose junction truncated the allele, or
      -1 when untruncated.
    Returns None when the locus overlaps no exon of the transcript
    (fully intronic / out of range — the reference raises at
    coordinates_toolbox.py:102-103; the caller drops such rows).

    Reference semantics: get_rna_position, coordinates_toolbox.py:9-119.
    """
    if total_len is None:
        total_len = total_exonic_length(exons)
    exons_sorted = sorted(exons, key=lambda e: e.start)
    cum = 0  # exonic length before current exon (genomic '+' order)
    for idx, e in enumerate(exons_sorted):
        e_len = e.end - e.start + 1
        if e.start <= pos <= e.end:
            offset = pos - e.start
            kept = min(allele_len, e.end - pos + 1)
            junction = idx if kept < allele_len else -1
            rna_plus = cum + offset
            if strand == "+":
                return rna_plus, kept, junction
            # '-' strand: position of the LAST base of the (kept) allele
            # becomes the first base in transcript orientation
            rna_minus = total_len - (rna_plus + kept)
            return rna_minus, kept, junction
        if pos < e.start:
            # starts in the intron before this exon: keep the part that
            # reaches into this exon (reach-through,
            # coordinates_toolbox.py:24-78)
            reach = pos + allele_len - e.start
            if reach > 0:
                kept = min(reach, e_len)
                junction = idx
                rna_plus = cum  # aligned at the exon start
                if strand == "+":
                    return rna_plus, kept, junction
                rna_minus = total_len - (rna_plus + kept)
                return rna_minus, kept, junction
            return None
        cum += e_len
    return None


def rna_to_genomic(rna_pos: int, exons: list[Exon], strand: str) -> int | None:
    """Inverse mapping (reference rna_to_dna_loc,
    coordinates_toolbox.py:107-119): 0-based RNA position → 1-based
    genomic position. Round-trips with genomic_to_rna for exonic loci."""
    exons_sorted = sorted(exons, key=lambda e: e.start)
    total = total_exonic_length(exons_sorted)
    plus_pos = rna_pos if strand == "+" else total - rna_pos - 1
    cum = 0
    for e in exons_sorted:
        e_len = e.end - e.start + 1
        if plus_pos < cum + e_len:
            return e.start + (plus_pos - cum)
        cum += e_len
    return None


def reading_frame_offset(
    start_codon_genomic: int | None,
    exons: list[Exon],
    strand: str,
) -> int:
    """RNA offset of the annotated start codon (U2). -1 when the
    transcript has no start codon (non-coding / 3-frame fallback path,
    process_haplotypes.py:93-100)."""
    if start_codon_genomic is None:
        return -1
    mapped = genomic_to_rna(start_codon_genomic, 1, exons, strand)
    if mapped is None:
        return -1
    if strand == "+":
        return mapped[0]
    # '-' strand: start_codon_genomic is the codon's genomic start
    # (lowest coordinate) = LAST base of the codon in transcript
    # orientation; the codon begins 2 bases earlier
    return mapped[0] - 2


def shift_start_by_indels(
    start_rna: int, changes: list[tuple[int, int, int]]
) -> tuple[int, bool]:
    """U2: shift the start-codon RNA offset by upstream indels and flag
    start-lost (variant overlapping [start, start+3)).

    ``changes``: (rna_pos, ref_len, alt_len) already in transcript
    order. Returns (shifted_start, start_lost).
    Reference: coordinates_toolbox.py:121-137 applied at
    process_haplotypes.py:231-246.
    """
    shifted = start_rna
    lost = False
    for rna_pos, ref_len, alt_len in changes:
        if rna_pos + ref_len <= start_rna:
            shifted += alt_len - ref_len
        elif rna_pos < start_rna + 3:
            lost = True
    return shifted, lost

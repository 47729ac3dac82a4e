"""U1/U2 — genomic→cDNA coordinate mapping and start-codon tracking.

Re-implements the semantics of /root/reference/src/modules/
coordinates_toolbox.py (get_rna_position :9-85, get_rna_position_simple
:88-105, rna_to_dna_loc :107-119, check_start_change :121-137) as pure
Python. These run inside Arrow-batched pandas UDF stages (mapInPandas),
so they are written dependency-light and per-row — the distributed axis
is Spark partitioning, not this code.

Conventions (identical to the reference):
- GTF exons are 1-based inclusive [start, end]; exon length =
  end - start + 1; exons ordered by genomic start regardless of strand;
- ``genomic_to_rna`` works entirely in GENOME ('+') orientation — it
  returns the spliced-transcript offset in '+' order plus the REF and
  ALT alleles truncated at splice junctions (both are truncated, in
  genome orientation, BEFORE any reverse-complementing — the caller
  applies ``orient_to_transcript`` for '-' strand transcripts);
- splice-junction semantics: an allele reaching into the intron is cut
  at the exon edge; an allele spanning a full intron into the next exon
  is spliced (`ref[:remaining] + ref[start_again:]`); an allele
  starting inside the intron keeps only the part reaching into the
  exon (`ref[intronic_len:]`); alleles within <3 bp of an exon edge
  are flagged even when untruncated;
- junction numbering: 1 means the junction between exon 1 and exon 2
  (reference :44 reports exon_idx + 1 for end-side events).
"""

from __future__ import annotations

from dataclasses import dataclass

_COMPLEMENT = str.maketrans("ACGTacgt", "TGCAtgca")


def _revcomp(seq: str) -> str:
    return seq.translate(_COMPLEMENT)[::-1]


@dataclass(frozen=True)
class Exon:
    start: int  # 1-based inclusive, genomic
    end: int    # 1-based inclusive, genomic


def total_exonic_length(exons: list[Exon]) -> int:
    return sum(e.end - e.start + 1 for e in exons)


@dataclass
class RnaMapping:
    """Result of genomic→RNA mapping, still in genome ('+') orientation."""

    rna_pos: int          # 0-based offset into the '+'-oriented splice
    ref: str              # REF truncated at splice junctions
    alt: str              # ALT truncated at splice junctions
    junction: int | None  # affected junction number, None if clear


def genomic_to_rna(
    pos: int, ref: str, alt: str, exons: list[Exon]
) -> RnaMapping | None:
    """Map a genomic locus carrying REF→ALT onto the spliced transcript.

    Mirrors the reference's get_rna_position (coordinates_toolbox.py:
    9-85): walks genomic-start-ordered exons accumulating exonic length;
    truncates BOTH alleles against splice junctions (intron-start trim,
    exon-end cut, full-intron reach-through splice) and flags the
    affected junction, including the <3 bp proximity cases (:74-78).
    Returns None when the locus misses every exon (the reference prints
    and falls through with a partial offset, :82-84; the caller here
    drops such rows — the interval join guarantees exon overlap
    upstream, so this is a guard, not a hot path).
    """
    ref_len = len(ref)
    alt_len = len(alt)
    rna = 0
    junction: int | None = None
    exons_sorted = sorted(exons, key=lambda e: (e.start, e.end))
    for idx, exon in enumerate(exons_sorted):
        if exon.end < pos:
            rna += exon.end - exon.start + 1
            continue
        if exon.start >= pos + ref_len:
            # exons are start-sorted: no later exon can match either —
            # the locus is intronic / out of range (reference falls off
            # the loop into the not-found path)
            return None

        # allele starts in the intron before this exon: keep the part
        # reaching into the exon (reference :27-37; the branch guard
        # above guarantees intronic_len < ref_len here)
        if exon.start > pos:
            intronic_len = exon.start - pos
            ref = ref[intronic_len:]
            alt = alt[intronic_len:]
            ref_len = len(ref)
            alt_len = len(alt)
            pos += intronic_len
            junction = idx

        rna += pos - exon.start

        if pos + ref_len > exon.end:
            # REF runs past the exon end (includes the ends-exactly-at-
            # exon-end case, which the reference also flags, :42-44)
            remaining = exon.end - pos + 1
            junction = idx + 1
            if idx < len(exons_sorted) - 1 and pos + ref_len > exons_sorted[idx + 1].start:
                # reach-through: splice out the intron (:47-52)
                start_again = exons_sorted[idx + 1].start - pos
                ref = ref[:remaining] + ref[start_again:]
            else:
                ref = ref[:remaining]
            ref_len = len(ref)
            # ALT truncated the same way, but only when IT overruns the
            # exon (an exon-extending insertion is kept, :57-71)
            if pos + alt_len > exon.end:
                remaining = exon.end - pos + 1
                if idx < len(exons_sorted) - 1 and pos + alt_len > exons_sorted[idx + 1].start:
                    start_again = exons_sorted[idx + 1].start - pos
                    alt = alt[:remaining] + alt[start_again:]
                else:
                    alt = alt[:remaining]
                alt_len = len(alt)
        # near-junction flags, <3 bp from an exon edge (reference
        # expressions :74-78 mirrored verbatim)
        elif exon.end - pos + ref_len < 3:
            junction = idx + 1
        elif pos - exon.start < 3:
            junction = idx

        return RnaMapping(rna, ref, alt, junction)
    return None


def orient_to_transcript(
    mapping: RnaMapping, strand: str, transcript_len: int
) -> tuple[int, str, str]:
    """Convert a '+'-oriented RnaMapping into transcript orientation:
    reverse-complement the (already truncated) alleles and count the
    position from the transcript end for '-' strand (reference
    process_haplotypes.py:200-205 / process_variants.py:144-149).
    Truncation happened in genome orientation BEFORE this flip — the
    exonic side of the allele is preserved on both strands."""
    if strand != "-":
        return mapping.rna_pos, mapping.ref, mapping.alt
    return (
        transcript_len - mapping.rna_pos - len(mapping.ref),
        _revcomp(mapping.ref),
        _revcomp(mapping.alt),
    )


def genomic_to_rna_simple(pos: int, exons: list[Exon]) -> int | None:
    """Point mapping, no alleles (reference get_rna_position_simple,
    coordinates_toolbox.py:88-105). Returns None where the reference
    raises (location not exonic)."""
    rna = 0
    for exon in sorted(exons, key=lambda e: (e.start, e.end)):
        if exon.end < pos:
            rna += exon.end - exon.start + 1
        elif exon.start <= pos:
            return rna + (pos - exon.start)
        else:
            return None
    return None


def rna_to_genomic(rna_pos: int, exons: list[Exon], strand: str) -> int | None:
    """Inverse point mapping (reference rna_to_dna_loc,
    coordinates_toolbox.py:107-119): 0-based RNA position (transcript
    orientation) → 1-based genomic position."""
    exons_sorted = sorted(exons, key=lambda e: (e.start, e.end))
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
    codon_genomic_start: int | None,
    exons: list[Exon],
    strand: str,
    total_len: int | None = None,
) -> int:
    """RNA offset (transcript orientation) of an annotated start/stop
    codon's first base (U2). -1 when absent or unmappable.

    Reference: get_rna_position_simple on codon.start then the
    '-'-strand flip ``len(cdna) - loc - 3`` (process_haplotypes.py:
    137-140, process_variants.py:96-99)."""
    if codon_genomic_start is None:
        return -1
    simple = genomic_to_rna_simple(codon_genomic_start, exons)
    if simple is None:
        return -1
    if strand == "+":
        return simple
    if total_len is None:
        total_len = total_exonic_length(exons)
    return total_len - simple - 3


def check_start_change(
    original_start: int,
    original_rf: int,
    variant_rna_loc: int,
    ref_len: int,
    alt_len: int,
    ignore_frameshift: bool,
) -> tuple[int, int]:
    """U2: how does one change move the start codon?

    Returns (new_start, new_reading_frame); (-1, -1) means start lost.
    A frameshift upstream of the start is treated as start-lost unless
    ``ignore_frameshift`` (the reference's force_rf), in which case the
    start shifts and the frame is recomputed. Mirrors check_start_change
    (coordinates_toolbox.py:121-137)."""
    if variant_rna_loc < original_start + 3:
        if variant_rna_loc + ref_len > original_start:
            return -1, -1  # change overlaps the start codon itself
        if abs(alt_len - ref_len) % 3 != 0:  # frameshift before start
            if ignore_frameshift:
                return (
                    original_start + (alt_len - ref_len),
                    (original_rf + (alt_len - ref_len)) % 3,
                )
            return -1, -1
        # in-frame indel upstream: start shifts, frame preserved
        return original_start + (alt_len - ref_len), original_rf
    return original_start, original_rf

"""U3 — haplotype/variant cDNA construction and protein-consequence
annotation (the irreducible per-group kernel).

Re-implements the semantics of /root/reference/src/process_haplotypes.py
:109-505 and process_variants.py:113-267 as pure Python, executed per
transcript group inside an Arrow-batched ``applyInPandas`` stage (the
Spark analog of the reference's multiprocessing.Pool-per-transcript,
process_haplotypes.py:537-538).

Pipeline per haplotype (reference 3-pass structure):
1. validate each change against the reference cDNA (ref allele must
   match the cDNA slice — rows violating it are dropped with a flag,
   process_haplotypes.py:276-281); liftover-artifact changes whose ALT
   already equals the cDNA are dropped (process_haplotypes.py:170-213);
2. apply changes in transcript order with a cumulative length offset
   (process_haplotypes.py:272-312); reverse-strand inputs arrive
   already expressed in transcript orientation;
3. classify each change's protein consequence from the affected codon
   windows in ref vs mutated cDNA (process_haplotypes.py:322-348) and
   translate the mutated CDS to the first stop
   (process_haplotypes.py:369-401).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from prohap_spark.functions.genomics import CODON_TABLE

COMPLEMENT = str.maketrans("ACGTacgt", "TGCAtgca")


def reverse_complement(seq: str) -> str:
    return seq.translate(COMPLEMENT)[::-1]


def translate(seq: str, to_stop: bool = True) -> str:
    aas = []
    for i in range(0, len(seq) - 2, 3):
        aa = CODON_TABLE.get(seq[i : i + 3].upper(), "X")
        if aa == "*" and to_stop:
            break
        aas.append(aa)
    return "".join(aas)


@dataclass
class Change:
    """One DNA change in transcript (RNA) coordinates, 0-based."""

    rna_pos: int
    ref: str
    alt: str
    vcf_id: str = ""


@dataclass
class HaploResult:
    cdna: str
    protein: str
    reading_frame: int
    protein_prefix_length: int
    start_missing: bool
    start_lost: bool
    applied: list[Change] = field(default_factory=list)
    dropped: list[Change] = field(default_factory=list)  # ref-mismatch
    liftover_dropped: list[Change] = field(default_factory=list)
    consequences: list[str] = field(default_factory=list)
    protein_changes: list[str] = field(default_factory=list)
    # 3-frame fallback (start_missing): translation of each reading
    # frame, '|'-separated downstream (process_haplotypes.py:456-478)
    proteins_by_frame: list[str] = field(default_factory=list)


def classify_consequence(ref: str, alt: str, ref_aa: str, alt_aa: str) -> str:
    """Variant-consequence typing (process_haplotypes.py:322-348)."""
    dlen = len(alt) - len(ref)
    if dlen % 3 != 0:
        return "frameshift"
    if dlen != 0:
        return "inframe_indel"
    if alt_aa == ref_aa:
        return "synonymous"
    if "*" in alt_aa and "*" not in ref_aa:
        return "stop_gained"
    if "*" in ref_aa and "*" not in alt_aa:
        return "stop_lost"
    return "SAV"


def codon_window(seq: str, frame_start: int, pos: int, length: int) -> tuple[int, int]:
    """Codon-aligned window [lo, hi) covering [pos, pos+length) relative
    to the reading frame (coordinates_toolbox.py:139-172)."""
    rel = pos - frame_start
    lo = frame_start + (rel // 3) * 3
    rel_end = pos + max(length, 1) - frame_start
    hi = frame_start + ((rel_end + 2) // 3) * 3
    return max(lo, frame_start), hi


def apply_haplotype(
    cdna: str,
    changes: list[Change],
    start_rna: int,
    jitter_retry: bool = False,
) -> HaploResult:
    """Apply a haplotype's changes (transcript coordinates, any order)
    to the reference cDNA and annotate protein consequences.

    ``start_rna``: RNA offset of the annotated start codon, or -1 when
    missing (→ frame 0 fallback + all-3-frame translation,
    process_haplotypes.py:456-478).
    ``jitter_retry``: on REF mismatch, retry the change at rna_pos ± 1
    (the ProVar liftover-jitter recovery, process_variants.py:150-171).
    """
    ordered = sorted(changes, key=lambda c: (c.rna_pos, c.ref, c.alt))
    start_missing = start_rna < 0
    frame0 = 0 if start_missing else start_rna

    # pass 1: validate against the reference cDNA
    applied: list[Change] = []
    dropped: list[Change] = []
    lift: list[Change] = []
    for ch in ordered:
        ref_slice = cdna[ch.rna_pos : ch.rna_pos + len(ch.ref)]
        alt_slice = cdna[ch.rna_pos : ch.rna_pos + len(ch.alt)]
        if ref_slice.upper() == ch.ref.upper():
            applied.append(ch)
            continue
        if ch.alt != "" and alt_slice.upper() == ch.alt.upper():
            # liftover artifact: REF absent but ALT already present in
            # the reference build (process_haplotypes.py:170-213)
            lift.append(ch)
            continue
        if jitter_retry and ch.ref:
            # ±1 bp liftover jitter (process_variants.py:150-171)
            recovered = None
            for d in (-1, 1):
                p = ch.rna_pos + d
                if p >= 0 and cdna[p : p + len(ch.ref)].upper() == ch.ref.upper():
                    recovered = Change(p, ch.ref, ch.alt, ch.vcf_id)
                    break
            if recovered is not None:
                applied.append(recovered)
                continue
        dropped.append(ch)
    applied.sort(key=lambda c: (c.rna_pos, c.ref, c.alt))

    # pass 2: cumulative-offset application (W5 running state)
    mutated = cdna
    offset = 0
    offsets: list[int] = []
    for ch in applied:
        loc = ch.rna_pos + offset
        mutated = mutated[:loc] + ch.alt + mutated[loc + len(ch.ref) :]
        offsets.append(offset)
        offset += len(ch.alt) - len(ch.ref)

    # U2: start shift / start-lost
    shifted_start, start_lost = (frame0, False)
    if not start_missing:
        shifted_start, start_lost = _shift_start(frame0, applied)

    # pass 3: per-change consequence from codon windows
    consequences: list[str] = []
    protein_changes: list[str] = []
    for ch, off in zip(applied, offsets):
        ref_lo, ref_hi = codon_window(cdna, frame0, ch.rna_pos, len(ch.ref))
        # codon boundaries in the mutated sequence are shifted by the
        # cumulative upstream offset (codon-aligned when off % 3 == 0;
        # an upstream frameshift makes downstream typing frame-relative,
        # matching the reference's frameshift propagation)
        mut_pos = ch.rna_pos + off
        alt_lo, alt_hi = codon_window(mutated, frame0 + off, mut_pos, len(ch.alt))
        ref_aa = translate(cdna[ref_lo:ref_hi], to_stop=False)
        alt_aa = translate(mutated[alt_lo:alt_hi], to_stop=False)
        cons = classify_consequence(ch.ref, ch.alt, ref_aa, alt_aa)
        consequences.append(cons)
        aa_pos = (ref_lo - frame0) // 3 + 1
        protein_changes.append(f"{aa_pos}:{ref_aa or '-'}>{alt_aa or '-'}")

    frame = shifted_start % 3 if not start_missing else 0
    cds_start = shifted_start if (not start_missing and not start_lost) else 0
    protein = translate(mutated[cds_start:], to_stop=True)
    prefix_len = 0 if not start_missing else cds_start // 3
    # reference fallback: no annotated start → translate ALL 3 frames
    proteins_by_frame = (
        [translate(mutated[f:], to_stop=True) for f in range(3)]
        if start_missing
        else [protein]
    )

    return HaploResult(
        cdna=mutated,
        protein=protein,
        reading_frame=frame,
        protein_prefix_length=prefix_len,
        start_missing=start_missing,
        start_lost=start_lost,
        applied=applied,
        dropped=dropped,
        liftover_dropped=lift,
        consequences=consequences,
        protein_changes=protein_changes,
        proteins_by_frame=proteins_by_frame,
    )


def _shift_start(start_rna: int, changes: list[Change]) -> tuple[int, bool]:
    shifted = start_rna
    lost = False
    for ch in changes:
        if ch.rna_pos + len(ch.ref) <= start_rna:
            shifted += len(ch.alt) - len(ch.ref)
        elif ch.rna_pos < start_rna + 3:
            lost = True
    return shifted, lost

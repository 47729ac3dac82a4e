"""U3 kernel unit tests: SAV / synonymous / stop_gained / frameshift /
inframe indel / start-lost / liftover-drop / ref-mismatch drop, against
hand-computed proteins (reference semantics process_haplotypes.py and
process_variants.py; see SURVEY §5)."""

from prohap_spark.kernels.haplo import (
    Change,
    apply_haplotype,
    classify_consequence,
    reverse_complement,
    translate,
)

#       0123456789...
CDNA = "AAAATGGCTGATGAATTTGGGCCCAAATAGACGTACGTACGTACGTACGTACGTACGTA"[:60]
START = 3  # ATG at offsets 3-5 → MADEFGPK then TAG stop


def test_translate():
    assert translate("ATGGCTGATGAATTTGGGCCCAAATAG"[0:]) == "MADEFGPK"
    assert translate("ATGTAA") == "M"
    assert translate("ATGTAA", to_stop=False) == "M*"


def test_reverse_complement():
    assert reverse_complement("ATGC") == "GCAT"
    assert reverse_complement("AAaTt") == "aAtTT"


def test_reference_protein():
    res = apply_haplotype(CDNA, [], START)
    assert res.protein == "MADEFGPK"
    assert res.reading_frame == 0 and not res.start_lost and not res.start_missing


def test_sav():
    # offset 9 G>A: codon GAT→AAT, D>N
    res = apply_haplotype(CDNA, [Change(9, "G", "A")], START)
    assert res.protein == "MANEFGPK"
    assert res.consequences == ["SAV"]
    assert res.protein_changes == ["3:D>N"]


def test_synonymous():
    # offset 17 T>C: codon TTT→TTC, both F
    res = apply_haplotype(CDNA, [Change(17, "T", "C")], START)
    assert res.protein == "MADEFGPK"
    assert res.consequences == ["synonymous"]


def test_stop_gained():
    # offset 15 T>A? codon offsets 15-17 TTT; TAA early stop:
    # change offsets 16 T>A and 17 T>A → make one codon change via
    # multi-base: ref 'TTT' alt 'TAA' at offset 15
    res = apply_haplotype(CDNA, [Change(15, "TTT", "TAA")], START)
    assert res.consequences == ["stop_gained"]
    assert res.protein == "MADE"


def test_frameshift_insertion():
    # offset 7 C>CT: +1 shift downstream
    res = apply_haplotype(CDNA, [Change(7, "C", "CT")], START)
    assert res.consequences == ["frameshift"]
    # mutated CDS: ATG GCT TGA ... → early stop after frameshift
    assert res.protein == "MA"


def test_inframe_deletion():
    # offsets 12-14 'GAA' deleted (ref 'TGAA' alt 'T' at offset 11)
    res = apply_haplotype(CDNA, [Change(11, "TGAA", "T")], START)
    assert res.consequences == ["inframe_indel"]
    assert res.protein == "MADFGPK"


def test_start_lost():
    # change overlapping the start codon
    res = apply_haplotype(CDNA, [Change(4, "T", "G")], START)
    assert res.start_lost


def test_upstream_indel_shifts_start():
    # 3 nt insertion in the 5'UTR: protein unchanged
    res = apply_haplotype(CDNA, [Change(0, "A", "AGGG")], START)
    assert not res.start_lost
    assert res.protein == "MADEFGPK"


def test_ref_mismatch_dropped():
    res = apply_haplotype(CDNA, [Change(9, "C", "A")], START)  # cdna[9] is G
    assert res.applied == []
    assert len(res.dropped) == 1
    assert res.protein == "MADEFGPK"


def test_liftover_artifact_dropped():
    # "change" whose ALT already equals the reference slice
    res = apply_haplotype(CDNA, [Change(9, "A", "G")], START)  # cdna[9] already G
    assert res.applied == []
    assert len(res.liftover_dropped) == 1


def test_multi_change_cumulative_offsets():
    # insertion upstream (+3) then SNP downstream: SNP must land on the
    # shifted coordinate (W5 running offset, process_haplotypes.py:272-312)
    res = apply_haplotype(
        CDNA, [Change(0, "A", "AGGG"), Change(9, "G", "A")], START
    )
    assert res.protein == "MANEFGPK"
    assert res.consequences == ["inframe_indel", "SAV"]


def test_start_missing_frame0():
    res = apply_haplotype(CDNA, [Change(9, "G", "A")], -1)
    assert res.start_missing
    # frame-0 translation of the full sequence
    assert res.protein == translate("AAAATGGCTAATGAATTTGGGCCCAAATAG" + CDNA[30:])


def test_classify_consequence_direct():
    assert classify_consequence("A", "G", "K", "E") == "SAV"
    assert classify_consequence("A", "G", "K", "K") == "synonymous"
    assert classify_consequence("A", "AG", "K", "K") == "frameshift"
    assert classify_consequence("AAA", "", "K", "") == "inframe_indel"
    assert classify_consequence("A", "T", "K", "*") == "stop_gained"
    assert classify_consequence("A", "T", "*", "Q") == "stop_lost"


def test_three_frame_fallback():
    res = apply_haplotype(CDNA, [], -1)
    assert res.start_missing
    assert len(res.proteins_by_frame) == 3
    assert res.proteins_by_frame[0] == translate(CDNA)
    assert res.proteins_by_frame[1] == translate(CDNA[1:])
    assert res.proteins_by_frame[2] == translate(CDNA[2:])


def test_annotated_start_single_frame():
    res = apply_haplotype(CDNA, [], START)
    assert res.proteins_by_frame == ["MADEFGPK"]


def test_jitter_retry_recovers_shifted_ref():
    # ref 'G' reported at offset 10 but actually at 9 (liftover jitter)
    res = apply_haplotype(CDNA, [Change(10, "G", "C")], START, jitter_retry=True)
    assert len(res.applied) == 1 and res.applied[0].rna_pos == 9
    no_retry = apply_haplotype(CDNA, [Change(10, "G", "C")], START)
    assert no_retry.applied == [] and len(no_retry.dropped) == 1


def test_multi_frameshift_net_zero():
    """+1 insertion then -1 deletion downstream: frame restored after
    the second change; both typed frameshift (pins current behavior for
    the multi-frameshift case, NOTES_ROUND1 #4)."""
    # ins T after offset 7 (C -> CT), del G at offset 9 (ref 'TG' -> 'T'
    # at offset 8)
    res = apply_haplotype(CDNA, [Change(7, "C", "CT"), Change(8, "TG", "T")], START)
    assert res.consequences == ["frameshift", "frameshift"]
    # net sequence: ATG GCT TAT GAA ... (G at 9 replaced by inserted T
    # shifting: mutated cds = ATG GC T T AT GAA...) — verify by direct
    # construction
    mutated = CDNA[:8] + "T" + CDNA[8:]          # apply ins at 7
    mutated = mutated[:9] + "T" + mutated[11:]   # apply del at shifted 8+1
    assert res.cdna == mutated
    assert res.protein == translate(mutated[3:])


# ---- differential property: kernel vs a naive reference implementation

from hypothesis import given, settings, strategies as st


def naive_apply(cdna, changes):
    """Oracle: apply non-overlapping changes right-to-left (no offset
    bookkeeping needed)."""
    out = cdna
    for ch in sorted(changes, key=lambda c: -c.rna_pos):
        out = out[: ch.rna_pos] + ch.alt + out[ch.rna_pos + len(ch.ref) :]
    return out


@st.composite
def change_sets(draw):
    """1-5 non-overlapping valid changes against CDNA."""
    n = draw(st.integers(1, 5))
    taken = []
    changes = []
    for _ in range(n):
        pos = draw(st.integers(0, len(CDNA) - 4))
        ref_len = draw(st.integers(1, 3))
        if any(pos < t_end and t_start < pos + ref_len for t_start, t_end in taken):
            continue
        taken.append((pos, pos + ref_len))
        ref = CDNA[pos : pos + ref_len]
        alt = draw(st.text(alphabet="ACGT", min_size=1, max_size=4))
        if alt == ref:
            continue
        changes.append(Change(pos, ref, alt))
    return changes


@given(change_sets())
@settings(max_examples=200, deadline=None)
def test_apply_haplotype_matches_naive(changes):
    res = apply_haplotype(CDNA, changes, START)
    # liftover-dropped changes are ones whose alt already matches; the
    # naive oracle applies only the kernel-applied set
    assert res.cdna == naive_apply(CDNA, res.applied)
    assert len(res.applied) + len(res.liftover_dropped) + len(res.dropped) == len(changes)
    assert res.dropped == []  # all refs were taken from the cDNA

"""U1/U2 kernel unit tests — hand-computed mini fixtures per SURVEY §5:
forward/reverse strand, multi-exon, splice-junction truncation of BOTH
alleles (exact bases), intron reach-through splicing, near-junction
flagging, start-change tracking, round-trip property
(coordinates_toolbox.py:9-137 defines the semantics)."""

from hypothesis import given, strategies as st

from prohap_spark.kernels.coordinates import (
    Exon,
    check_start_change,
    genomic_to_rna,
    genomic_to_rna_simple,
    orient_to_transcript,
    reading_frame_offset,
    rna_to_genomic,
    total_exonic_length,
)

T1_EXONS = [Exon(101, 130), Exon(201, 230)]  # + strand, 60 nt
T2_EXONS = [Exon(301, 330)]  # - strand, 30 nt
T3_EXONS = [Exon(501, 520), Exon(601, 620)]  # '-' strand, 2x20 nt


def snp(pos, exons, strand="+", base="A"):
    """Map a 1-bp substitution and orient it; returns (rna_pos, junction)."""
    m = genomic_to_rna(pos, base, "C", exons)
    if m is None:
        return None
    rna, _, _ = orient_to_transcript(m, strand, total_exonic_length(exons))
    return rna, m.junction


def test_plus_strand_first_exon():
    assert snp(101, T1_EXONS) == (0, 0)  # <3bp from exon start → flagged
    assert snp(110, T1_EXONS) == (9, None)
    assert snp(130, T1_EXONS) == (29, 1)  # <3bp from exon end → flagged


def test_plus_strand_second_exon():
    assert snp(201, T1_EXONS) == (30, 1)
    assert snp(215, T1_EXONS) == (44, None)
    assert snp(230, T1_EXONS) == (59, 2)


def test_intronic_returns_none():
    assert genomic_to_rna(150, "A", "C", T1_EXONS) is None
    assert genomic_to_rna(100, "A", "C", T1_EXONS) is None
    assert genomic_to_rna(231, "AAAAA", "A", T1_EXONS) is None


def test_near_junction_flags():
    """<3 bp proximity flagging even when untruncated
    (coordinates_toolbox.py:74-78)."""
    assert snp(102, T1_EXONS) == (1, 0)
    assert snp(103, T1_EXONS) == (2, 0)  # 103-101 = 2 < 3 → flagged
    assert snp(104, T1_EXONS) == (3, None)  # 3 bp in: clear
    assert snp(129, T1_EXONS) == (28, 1)  # end-pos+len = 130-129+1 = 2 < 3
    assert snp(128, T1_EXONS) == (27, None)  # 130-128+1 = 3, not flagged


def test_junction_truncation_plus_ref_and_alt():
    """REF running past the exon end keeps the EXONIC PREFIX in genome
    orientation; ALT truncated the same way only when it overruns
    (coordinates_toolbox.py:42-71)."""
    # genomic 129..131 'RST' → exonic part 129,130 = 'RS'
    m = genomic_to_rna(129, "RST", "XY", T1_EXONS)
    assert (m.rna_pos, m.ref, m.alt, m.junction) == (28, "RS", "XY", 1)
    # ALT overruns too: 'WXYZ' at 129 → kept 'WX'
    m = genomic_to_rna(129, "RST", "WXYZ", T1_EXONS)
    assert (m.ref, m.alt) == ("RS", "WX")
    # pure insertion before the exon end is kept whole
    m = genomic_to_rna(125, "A", "AGGGGGGGGG", T1_EXONS)
    assert m.alt == "AGGGGGGGGG" and m.junction is None


def test_intron_start_trim():
    """Allele starting inside the intron keeps the EXONIC SUFFIX
    (ref[intronic_len:], coordinates_toolbox.py:27-37)."""
    m = genomic_to_rna(199, "ABCD", "ABXY", T1_EXONS)
    assert (m.rna_pos, m.ref, m.alt, m.junction) == (30, "CD", "XY", 1)


def test_reach_through_splices_intron():
    """Allele spanning a whole intron into the next exon is spliced:
    ref[:remaining] + ref[start_again:] (coordinates_toolbox.py:47-55)."""
    exons = [Exon(101, 110), Exon(115, 120)]
    # genomic 109..115: 'ab' exonic (109,110), 'cdef' intronic-ish, 'g' at 115
    m = genomic_to_rna(109, "abcdefg", "ab", exons)
    assert (m.rna_pos, m.ref, m.junction) == (8, "abg", 1)
    # ALT spliced the same way when it also spans (same length here)
    m2 = genomic_to_rna(109, "abcdefg", "ABCDEFG", exons)
    assert m2.alt == "ABG"


def test_minus_strand_exon_end_truncation_keeps_exonic_bases():
    """'-' strand: truncation happens in GENOME orientation before the
    reverse-complement — the exonic side survives (the round-2 HIGH
    bug: complementing first kept the wrong end)."""
    # T3 '-': allele at genomic 519..521 = 'GAT'; exonic = 519,520 'GA'
    m = genomic_to_rna(519, "GAT", "CCT", T3_EXONS)
    assert (m.ref, m.alt, m.junction) == ("GA", "CC", 1)
    rna, r, a = orient_to_transcript(m, "-", 40)
    # transcript orientation: revcomp('GA') = 'TC', position flips
    assert (rna, r, a) == (40 - 18 - 2, "TC", "GG")


def test_minus_strand_point_positions():
    assert snp(330, T2_EXONS, "-")[0] == 0
    assert snp(301, T2_EXONS, "-")[0] == 29
    assert snp(320, T2_EXONS, "-")[0] == 10


def test_minus_strand_multibase():
    # 3-base allele at genomic 320..322 ↔ transcript 8..10
    m = genomic_to_rna(320, "ACG", "AAA", T2_EXONS)
    rna, r, a = orient_to_transcript(m, "-", 30)
    assert rna == 8 and r == "CGT" and a == "TTT"


def test_minus_strand_multi_exon():
    total = total_exonic_length(T3_EXONS)
    assert total == 40
    assert snp(620, T3_EXONS, "-")[0] == 0
    assert snp(601, T3_EXONS, "-")[0] == 19
    assert snp(520, T3_EXONS, "-")[0] == 20
    assert snp(501, T3_EXONS, "-")[0] == 39
    assert genomic_to_rna(550, "A", "C", T3_EXONS) is None


def test_reading_frame_offset():
    assert reading_frame_offset(104, T1_EXONS, "+") == 3
    assert reading_frame_offset(None, T1_EXONS, "+") == -1
    # '-' strand: codon genomic start 328; len 30 → 30 - 27 - 3 = 0
    assert reading_frame_offset(328, T2_EXONS, "-") == 0


def test_check_start_change():
    # in-frame 3nt insertion upstream of start at rna 3 → start shifts to 6
    assert check_start_change(3, 0, 0, 1, 4, False) == (6, 0)
    # deletion overlapping the start codon → lost
    assert check_start_change(3, 0, 2, 3, 1, False) == (-1, -1)
    # frameshift upstream: lost unless force_rf
    assert check_start_change(6, 0, 0, 1, 2, False) == (-1, -1)
    assert check_start_change(6, 0, 0, 1, 2, True) == (7, 1)
    # downstream change: no effect
    assert check_start_change(3, 0, 10, 1, 1, False) == (3, 0)


def _round_trip(rna_pos, exons, strand):
    g = rna_to_genomic(rna_pos, exons, strand)
    assert g is not None
    simple = genomic_to_rna_simple(g, exons)
    assert simple is not None
    total = total_exonic_length(exons)
    back = simple if strand == "+" else total - simple - 1
    assert back == rna_pos


@given(st.integers(min_value=0, max_value=59), st.sampled_from(["+", "-"]))
def test_round_trip_rna_genomic(rna_pos, strand):
    _round_trip(rna_pos, T1_EXONS, strand)


@given(st.integers(min_value=0, max_value=39))
def test_minus_strand_round_trip(rna_pos):
    _round_trip(rna_pos, T3_EXONS, "-")


def test_total_len():
    assert total_exonic_length(T1_EXONS) == 60
    assert total_exonic_length(T2_EXONS) == 30

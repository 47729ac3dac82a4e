"""U1/U2 kernel unit tests — hand-computed mini fixtures per SURVEY §5:
forward/reverse strand, multi-exon, splice-junction truncation,
round-trip property (coordinates_toolbox.py:88-119 defines both
directions)."""

from hypothesis import given, strategies as st

from prohap_spark.kernels.coordinates import (
    Exon,
    genomic_to_rna,
    reading_frame_offset,
    rna_to_genomic,
    shift_start_by_indels,
    total_exonic_length,
)

T1_EXONS = [Exon(101, 130), Exon(201, 230)]  # + strand, 60 nt
T2_EXONS = [Exon(301, 330)]  # - strand, 30 nt


def test_plus_strand_first_exon():
    assert genomic_to_rna(101, 1, T1_EXONS, "+") == (0, 1, -1)
    assert genomic_to_rna(110, 1, T1_EXONS, "+") == (9, 1, -1)
    assert genomic_to_rna(130, 1, T1_EXONS, "+") == (29, 1, -1)


def test_plus_strand_second_exon():
    assert genomic_to_rna(201, 1, T1_EXONS, "+") == (30, 1, -1)
    assert genomic_to_rna(230, 1, T1_EXONS, "+") == (59, 1, -1)


def test_intronic_returns_none():
    assert genomic_to_rna(150, 1, T1_EXONS, "+") is None
    assert genomic_to_rna(100, 1, T1_EXONS, "+") is None
    assert genomic_to_rna(231, 5, T1_EXONS, "+") is None


def test_junction_truncation():
    # allele starts at 129, length 3 → bases 129,130 exonic, 131 intronic
    rna, kept, junction = genomic_to_rna(129, 3, T1_EXONS, "+")
    assert (rna, kept) == (28, 2)
    assert junction == 0  # truncated at exon 0's junction


def test_intron_reach_through():
    # allele starts intronic at 199, length 4 → reaches 2 bases into exon 1
    rna, kept, junction = genomic_to_rna(199, 4, T1_EXONS, "+")
    assert (rna, kept) == (30, 2)
    assert junction == 1


def test_minus_strand():
    # single 30 nt exon: genomic 330 ↔ rna 0, genomic 301 ↔ rna 29
    assert genomic_to_rna(330, 1, T2_EXONS, "-") == (0, 1, -1)
    assert genomic_to_rna(301, 1, T2_EXONS, "-") == (29, 1, -1)
    assert genomic_to_rna(320, 1, T2_EXONS, "-") == (10, 1, -1)


def test_minus_strand_multibase():
    # 3-base allele at genomic 320..322 ↔ transcript 8..10 (genomic 322
    # is the transcript-first base) → rna_pos 8
    assert genomic_to_rna(320, 3, T2_EXONS, "-") == (8, 3, -1)


def test_reading_frame_offset():
    assert reading_frame_offset(104, T1_EXONS, "+") == 3
    assert reading_frame_offset(None, T1_EXONS, "+") == -1
    # '-' strand: codon genomic start 328 = last codon base upstream
    assert reading_frame_offset(328, T2_EXONS, "-") == 0


def test_shift_start_by_indels():
    # 3 nt insertion upstream of start at rna 3 → start shifts to 6
    assert shift_start_by_indels(3, [(0, 1, 4)]) == (6, False)
    # deletion overlapping the start codon → start_lost (shift unchanged)
    assert shift_start_by_indels(3, [(2, 3, 1)]) == (3, True)
    # downstream change: no effect
    assert shift_start_by_indels(3, [(10, 1, 1)]) == (3, False)


@given(
    st.integers(min_value=0, max_value=59),
    st.sampled_from(["+", "-"]),
)
def test_round_trip_rna_genomic(rna_pos, strand):
    g = rna_to_genomic(rna_pos, T1_EXONS, strand)
    assert g is not None
    back = genomic_to_rna(g, 1, T1_EXONS, strand)
    assert back is not None and back[0] == rna_pos


def test_total_len():
    assert total_exonic_length(T1_EXONS) == 60
    assert total_exonic_length(T2_EXONS) == 30


T3_EXONS = [Exon(501, 520), Exon(601, 620)]  # '-' strand, 2x20 nt


def test_minus_strand_multi_exon():
    total = total_exonic_length(T3_EXONS)
    assert total == 40
    # transcript base 0 = genomic 620 (last base of the downstream exon)
    assert genomic_to_rna(620, 1, T3_EXONS, "-") == (0, 1, -1)
    assert genomic_to_rna(601, 1, T3_EXONS, "-") == (19, 1, -1)
    # crossing into the upstream exon: genomic 520 = rna 20, 501 = rna 39
    assert genomic_to_rna(520, 1, T3_EXONS, "-") == (20, 1, -1)
    assert genomic_to_rna(501, 1, T3_EXONS, "-") == (39, 1, -1)
    # intron position -> None
    assert genomic_to_rna(550, 1, T3_EXONS, "-") is None


@given(st.integers(min_value=0, max_value=39))
def test_minus_strand_round_trip(rna_pos):
    g = rna_to_genomic(rna_pos, T3_EXONS, "-")
    assert g is not None
    back = genomic_to_rna(g, 1, T3_EXONS, "-")
    assert back is not None and back[0] == rna_pos


def test_minus_strand_junction_truncation():
    # allele at genomic 519..521 (len 3): bases 519,520 exonic in exon 0,
    # 521 intronic -> kept 2; transcript-first base is genomic 520 = rna 20
    rna, kept, junction = genomic_to_rna(519, 3, T3_EXONS, "-")
    assert kept == 2 and junction == 0
    assert rna == 40 - (18 + 2)  # rna_plus of 519 is 18

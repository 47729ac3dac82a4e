"""Postprocess-chain tests: stop-codon split, tag-priority global
dedup, UTR removal, header simplification."""

from pyspark.sql import functions as F


def _fasta(spark, rows):
    return spark.createDataFrame(rows, ["tag", "accession", "description", "sequence"])


def test_split_stop_codon_fragments(spark):
    from prohap_spark.pipeline.postprocess import split_stop_codon_fragments

    df = _fasta(
        spark,
        [
            ("generic_var", "p1", "d", "MADEFG*KLMNOP*QR"),
            ("generic_var", "p2", "d", "SHORT*AB"),  # both fragments < 6 except SHORT? no: SHORT=5
        ],
    )
    out = {(r["accession"], r["sequence"]) for r in split_stop_codon_fragments(df).collect()}
    assert out == {("p1", "MADEFG"), ("p1_frag1", "KLMNOP")}


def test_merge_duplicate_sequences_tag_priority(spark):
    from prohap_spark.pipeline.postprocess import merge_duplicate_sequences

    df = _fasta(
        spark,
        [
            ("generic_enshap", "h1", "x", "MADEFGPK"),
            ("generic_ensref", "r1", "y", "MADEFGPK"),
            ("generic_var", "v1", "z", "OTHERSEQ"),
        ],
    )
    out = {r["sequence"]: r.asDict() for r in merge_duplicate_sequences(df).collect()}
    assert len(out) == 2
    # ensref outranks enshap (merge_duplicate_seq.py:64-80)
    assert out["MADEFGPK"]["tag"] == "ensref"
    assert "h1" in out["MADEFGPK"]["description"] and "r1" in out["MADEFGPK"]["description"]
    assert out["OTHERSEQ"]["tag"] == "var"


def test_remove_utr_only_entries(spark):
    from prohap_spark.pipeline.postprocess import (
        merge_duplicate_sequences,
        remove_utr_only_entries,
    )

    df = _fasta(
        spark,
        [
            ("generic_var", "vUTR_1", "a", "AAAAAAAA"),   # UTR-only → dropped
            ("generic_var", "v2", "b", "CCCCCCCC"),       # kept
            ("generic_var", "vUTR_3", "c", "GGGGGGGG"),   # merged with v3 → slot filtered
            ("generic_var", "v3", "d", "GGGGGGGG"),
        ],
    )
    merged = merge_duplicate_sequences(df)
    out = {r["sequence"]: r.asDict() for r in remove_utr_only_entries(merged).collect()}
    assert set(out) == {"CCCCCCCC", "GGGGGGGG"}
    assert "vUTR_3" not in out["GGGGGGGG"]["description"]
    assert "v3" in out["GGGGGGGG"]["description"]


def test_simplify_headers_gene_join(spark):
    from prohap_spark.pipeline.postprocess import simplify_headers

    fasta = _fasta(spark, [("ensref", "p1", "transcript:T1 pos:1", "MMMM")])
    tr = spark.createDataFrame(
        [("T1", "G1", "GENE1")], ["transcript_id", "gene_id", "gene_name"]
    )
    out = simplify_headers(fasta, tr).collect()[0]
    assert "gene:GENE1" in out["description"]

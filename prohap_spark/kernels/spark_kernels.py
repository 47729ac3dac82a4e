"""Arrow-batched Spark wrappers for the U1-U3 kernels.

Design note (Spark-first, not a port): the reference parallelizes with
a multiprocessing.Pool per transcript because each worker must look up
the transcript's cDNA/exons in process-global dicts
(process_haplotypes.py:537-538). Here the dimensional data (exons
array, start codon, cDNA) is JOINED onto each row *before* the kernel,
so every row is self-contained and the kernel runs in ``mapInPandas``
— no groupBy shuffle at all, plain partition-parallel Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from prohap_spark.kernels.coordinates import Exon, genomic_to_rna, reading_frame_offset
from prohap_spark.kernels.haplo import Change, apply_haplotype

ANNOTATE_SCHEMA = (
    "transcript_id string, item_id string, "
    "cdna_changes string, protein_changes string, variant_types string, "
    "mutated_cdna string, protein string, proteins_all_frames string, reading_frame int, "
    "protein_prefix_length int, start_missing boolean, start_lost boolean, "
    "splice_sites_affected string, "
    "n_applied int, n_ref_mismatch int, n_liftover_dropped int"
)


def _exon_list(raw) -> list[Exon]:
    return [Exon(int(e["start"]), int(e["end"])) for e in raw]


def _annotate_batch(pdf: pd.DataFrame, jitter_retry: bool = False) -> pd.DataFrame:
    out = []
    for row in pdf.itertuples(index=False):
        exons = _exon_list(row.exons)
        strand = row.strand
        cdna = row.cdna
        start_codon = None if pd.isna(row.start_codon) else int(row.start_codon)
        start_rna = reading_frame_offset(start_codon, exons, strand)

        changes: list[Change] = []
        n_unmappable = 0
        junctions: list[int] = []
        for ch in row.changes:
            ref, alt = ch["ref"], ch["alt"]
            ref_len = 0 if ref == "-" else len(ref)
            mapped = genomic_to_rna(int(ch["pos"]), max(ref_len, 1), exons, strand, len(cdna))
            if mapped is None:
                n_unmappable += 1
                continue
            rna_pos, kept, junction = mapped
            if junction >= 0:
                junctions.append(junction)
            r, a = ("" if ref == "-" else ref), ("" if alt == "-" else alt)
            if strand == "-":
                from prohap_spark.kernels.haplo import reverse_complement

                r, a = reverse_complement(r), reverse_complement(a)
            if kept < max(ref_len, 1) and ref_len > 0:
                r = r[:kept]  # splice-junction truncation (U1)
            changes.append(Change(rna_pos, r, a, ch.get("vcf_id") or ""))

        res = apply_haplotype(cdna, changes, start_rna, jitter_retry=jitter_retry)
        out.append(
            {
                "transcript_id": row.transcript_id,
                "item_id": row.item_id,
                "cdna_changes": ";".join(
                    f"{c.rna_pos}:{c.ref or '-'}>{c.alt or '-'}" for c in res.applied
                ),
                "protein_changes": ";".join(res.protein_changes),
                "variant_types": ";".join(res.consequences),
                "mutated_cdna": res.cdna,
                "protein": res.protein,
                "proteins_all_frames": "|".join(res.proteins_by_frame),
                "reading_frame": res.reading_frame,
                "protein_prefix_length": res.protein_prefix_length,
                "start_missing": res.start_missing,
                "start_lost": res.start_lost,
                "splice_sites_affected": ";".join(str(j) for j in sorted(set(junctions))),
                "n_applied": len(res.applied),
                "n_ref_mismatch": len(res.dropped) + n_unmappable,
                "n_liftover_dropped": len(res.liftover_dropped),
            }
        )
    return pd.DataFrame(
        out,
        columns=[
            "transcript_id", "item_id", "cdna_changes", "protein_changes",
            "variant_types", "mutated_cdna", "protein", "proteins_all_frames", "reading_frame",
            "protein_prefix_length", "start_missing", "start_lost",
            "splice_sites_affected",
            "n_applied", "n_ref_mismatch", "n_liftover_dropped",
        ],
    )


def annotate_items(df, jitter_retry: bool = False) -> "pyspark.sql.DataFrame":  # noqa: F821
    """Input rows: transcript_id, item_id, strand, exons
    array<struct<start:long,end:long>>, start_codon (nullable long),
    cdna string, changes array<struct<pos:long, ref:string, alt:string,
    vcf_id:string>>. One output row per input row (ANNOTATE_SCHEMA).

    Used for both ProVar (one change per item, jitter_retry=True to
    match the reference's ±1 bp recovery) and ProHap (a haplotype of
    changes per item)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _annotate_batch(pdf, jitter_retry)

    return df.mapInPandas(run, schema=ANNOTATE_SCHEMA)

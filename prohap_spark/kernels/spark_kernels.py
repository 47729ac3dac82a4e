"""Arrow-batched Spark wrappers for the U1-U3 kernels.

Design note (Spark-first, not a port): the reference parallelizes with
a multiprocessing.Pool per transcript because each worker must look up
the transcript's cDNA/exons in process-global dicts
(process_haplotypes.py:537-538). Here the dimensional data (exons
array, start/stop codon, cDNA) is JOINED onto each row *before* the
kernel, so every row is self-contained and the kernel runs in
``mapInPandas`` — no groupBy shuffle at all, plain partition-parallel
Arrow batches.

Rows the reference would skip (start lost under skip_start_loss, REF
mismatch after retries, synonymous-only after the UTR trim,
no-valid-change) emit no output row, mirroring the reference's
``continue`` paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from prohap_spark.kernels.coordinates import (
    Exon,
    genomic_to_rna,
    orient_to_transcript,
    reading_frame_offset,
)
from prohap_spark.kernels.haplo import Change, apply_haplotype, apply_variant

ANNOTATE_SCHEMA = (
    "transcript_id string, item_id string, "
    "cdna_changes string, all_protein_changes string, protein_changes string, "
    "variant_types string, "
    "mutated_cdna string, protein string, proteins_all_frames string, reading_frame int, "
    "protein_prefix_length int, start_missing boolean, start_lost boolean, "
    "start_gain int, splice_sites_affected string, "
    "n_applied int, n_liftover_dropped int"
)

_OUT_COLUMNS = [
    "transcript_id", "item_id", "cdna_changes", "all_protein_changes",
    "protein_changes", "variant_types", "mutated_cdna", "protein",
    "proteins_all_frames", "reading_frame", "protein_prefix_length",
    "start_missing", "start_lost", "start_gain", "splice_sites_affected",
    "n_applied", "n_liftover_dropped",
]


def _exon_list(raw) -> list[Exon]:
    return [Exon(int(e["start"]), int(e["end"])) for e in raw]


def _clean(allele: str) -> str:
    return "" if allele == "-" else allele


def _map_change(ch, exons, strand, cdna_len) -> Change | None:
    mapped = genomic_to_rna(int(ch["pos"]), _clean(ch["ref"]), _clean(ch["alt"]), exons)
    if mapped is None:
        return None
    rna_pos, r, a = orient_to_transcript(mapped, strand, cdna_len)
    return Change(rna_pos, r, a, ch.get("vcf_id") or "", mapped.junction)


def _result_row(row, res) -> dict:
    return {
        "transcript_id": row.transcript_id,
        "item_id": row.item_id,
        "cdna_changes": ";".join(res.cdna_change_strs),
        "all_protein_changes": ";".join(res.all_protein_changes),
        "protein_changes": ";".join(res.protein_changes),
        "variant_types": ";".join(res.consequences),
        "mutated_cdna": res.cdna,
        "protein": res.protein,
        "proteins_all_frames": "|".join(res.proteins_by_frame),
        "reading_frame": res.reading_frame,
        "protein_prefix_length": res.protein_prefix_length,
        "start_missing": res.start_missing,
        "start_lost": res.start_lost,
        "start_gain": res.start_gain,
        "splice_sites_affected": ";".join(str(j) for j in res.junctions) or "-",
        "n_applied": len(res.applied),
        "n_liftover_dropped": len(res.liftover_dropped),
    }


def _annotate_batch(
    pdf: pd.DataFrame,
    variant_mode: bool,
    force_rf: bool,
    skip_start_loss: bool,
    ignore_utr: bool,
    passthrough: tuple[str, ...] = (),
) -> pd.DataFrame:
    out = []
    for row in pdf.itertuples(index=False):
        exons = _exon_list(row.exons)
        strand = row.strand
        cdna = row.cdna
        start_codon = None if pd.isna(row.start_codon) else int(row.start_codon)
        start_rna = reading_frame_offset(start_codon, exons, strand, len(cdna))
        stop_codon = getattr(row, "stop_codon", None)
        stop_codon = None if stop_codon is None or pd.isna(stop_codon) else int(stop_codon)
        stop_rna = reading_frame_offset(stop_codon, exons, strand, len(cdna))
        rf_from_stop = stop_rna % 3 if stop_rna >= 0 else -1

        if variant_mode:
            # ProVar: one change per row, genomic ±1 bp liftover-jitter
            # retry (process_variants.py:150-171; the reference re-maps
            # the already-truncated alleles on retry — here the retry
            # re-maps the ORIGINAL alleles, the unambiguous intent)
            ch = row.changes[0]
            change = None
            for delta in (0, 1, -1):
                shifted = dict(ch)
                shifted["pos"] = int(ch["pos"]) + delta
                cand = _map_change(shifted, exons, strand, len(cdna))
                if cand is not None and (
                    cdna[cand.rna_pos : cand.rna_pos + len(cand.ref)].upper()
                    == cand.ref.upper()
                ):
                    change = cand
                    break
            if change is None:
                continue  # REF never matched the cDNA → skip variant
            res = apply_variant(cdna, change, start_rna, rf_from_stop, force_rf)
        else:
            changes: list[Change] = []
            for ch in row.changes:
                mapped = _map_change(ch, exons, strand, len(cdna))
                if mapped is not None:
                    changes.append(mapped)
            if not changes:
                continue
            res = apply_haplotype(
                cdna, changes, start_rna, rf_from_stop,
                force_rf, skip_start_loss, ignore_utr,
            )
            if res is None:
                continue  # haplotype dropped (reference continue paths)
        rec = _result_row(row, res)
        for c in passthrough:
            rec[c] = getattr(row, c)
        out.append(rec)
    return pd.DataFrame(out, columns=_OUT_COLUMNS + list(passthrough))


def annotate_items(
    df,
    variant_mode: bool = False,
    force_rf: bool = False,
    skip_start_loss: bool = True,
    ignore_utr: bool = True,
    passthrough: tuple[str, ...] = (),
) -> "pyspark.sql.DataFrame":  # noqa: F821
    """Input rows: transcript_id, item_id, strand, exons
    array<struct<start:long,end:long>>, start_codon (nullable long),
    stop_codon (nullable long, optional column), cdna string, changes
    array<struct<pos:long, ref:string, alt:string, vcf_id:string>>.
    ≤1 output row per input row (ANNOTATE_SCHEMA; dropped rows mirror
    the reference's skip paths).

    ``variant_mode``: ProVar flavor — one change per item, ±1 bp
    genomic jitter retry, no UTR trim, start-gain scan.
    ``force_rf``: infer the frame from the stop codon when the start is
    unannotated, and tolerate frameshifts upstream of the start
    (reference force_rf). ``skip_start_loss``: drop haplotypes whose
    start codon is lost (reference default). ``ignore_utr``: trim UTRs
    and remove UTR-only variants after applying all changes.

    ``passthrough``: input columns echoed unchanged into the output —
    metadata rides THROUGH the Arrow stage instead of being joined back
    afterwards (at scale that join is a full-table shuffle; the echo is
    free column traffic on data already co-located with the row)."""
    from pyspark.sql.types import StructType

    base = StructType.fromDDL(ANNOTATE_SCHEMA)
    schema = StructType(base.fields + [df.schema[c] for c in passthrough])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _annotate_batch(
                    pdf, variant_mode, force_rf, skip_start_loss, ignore_utr, passthrough
                )

    return df.mapInPandas(run, schema=schema)

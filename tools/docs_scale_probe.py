"""Measured scaling probe for the training-data (documents) operators.

Replicates the sf0.1 documents corpus R× (doc_ids offset per replica,
text perturbed with a replica-tag word so replicas are near- but not
exact duplicates) and times the heavy text operators at increasing
corpus sizes — evidence for (not a guess about) how each plan behaves
as the corpus grows. The interesting shapes:

- text_line_dedup: segment aggregate + join — should scale ~linearly;
  replica tags multiply the duplicated-segment surface, so this also
  stresses the join side.
- pack_context_windows: per-shard window cumsum — linear, and the
  shard count bounds the largest sort.
- dedup_minhash_lsh_capped: bucket equi-join with the k² cap — the cap
  is exactly what keeps replica-inflated buckets from going quadratic.
- dedup_semantic (embeddings replicated the same way): within-cell
  pairwise — quadratic IN THE CELL. Replicas keep the original
  embedding, so every replica lands in its source's cell and each cell
  is R× hotter: exactly the hot-cell degenerate the max_cell_size
  guard exists for. The probe times the uncapped pass (grows ~R² in
  the pair stage) against the capped one (max_cell_size=700 — above
  the 1× cell sizes, exceeded by every cell from 2× on, so the capped
  series must stay bounded).

Usage: python tools/docs_scale_probe.py [replicas...]   (default 1 4 8)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
replicas = [int(a) for a in sys.argv[1:]] or [1, 4, 8]


def replicated_docs(spark, r: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = spark.range(r).select(F.col("id").alias("rep"))
    return (
        d.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )


def replicated_embeddings(spark, r: int):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rep = spark.range(r).select(F.col("id").alias("rep"))
    return e.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        "embedding",
        "label",
    )


def main() -> None:
    from prohap_spark.operators.dedup import (
        minhash_dedup_pairs,
        segment_dedup,
        substring_dedup,
        winnowing_pairs,
    )
    from prohap_spark.operators.packing import pack_context_windows
    from prohap_spark.operators.similarity import (
        semantic_dedup_flags,
        train_centroids_by_label,
    )
    from prohap_spark.queries.textdata import curation_funnel
    from prohap_spark.session import get_spark

    spark = get_spark("docs-scale-probe")
    # warmup at 1x
    segment_dedup(replicated_docs(spark, 1), "doc_id", "text").count()

    out = {}
    for r in replicas:
        docs = replicated_docs(spark, r)
        embs = replicated_embeddings(spark, r)
        row = {}

        t0 = time.monotonic()
        row["line_dedup_rows"] = segment_dedup(docs, "doc_id", "text").count()
        row["line_dedup_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["substr_rows"] = substring_dedup(docs, "doc_id", "text", k=8).count()
        row["substr_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["pack_rows"] = pack_context_windows(
            docs, "doc_id", "text", seq_len=128, n_shards=32
        ).count()
        row["pack_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["lsh_pairs"] = minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.6, num_hashes=16,
            band_size=4, ngram=2, max_bucket_size=200,
        ).count()
        row["lsh_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["winnow_pairs"] = winnowing_pairs(
            docs, "doc_id", "text", ngram=3, window=4, min_shared=2, max_fp_docs=20
        ).count()
        row["winnow_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        cent = train_centroids_by_label(embs, "label", "embedding")
        row["semdedup_rows"] = semantic_dedup_flags(
            embs, cent, "vec_id", "embedding", threshold=0.25
        ).count()
        row["semdedup_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["semdedup_capped_rows"] = semantic_dedup_flags(
            embs, cent, "vec_id", "embedding", threshold=0.25, max_cell_size=700
        ).count()
        row["semdedup_capped_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["funnel_rows"] = curation_funnel(docs).count()
        row["funnel_sec"] = round(time.monotonic() - t0, 3)

        # r9 sketches: the Bloom probe should be corpus-LINEAR with a
        # FIXED sketch (bench side constant — the 2114-word filter is
        # broadcast; the corpus side is one map-side pass), and the
        # CMS build corpus-linear with CONSTANT state (d*w counters
        # regardless of r) — the defining property of both sketches
        from prohap_spark.functions.sketches import (
            bloom_build,
            bloom_probe_hits,
            cms_build,
        )
        from prohap_spark.operators.dedup import shingle_table

        bench_grams = (
            shingle_table(
                spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
                    F.col("doc_id") % 17 == 0
                ),
                "doc_id", "text", 3,
            )
            .select(F.explode("__tokens").alias("gram"))
            .distinct()
        )
        bloom = bloom_build(bench_grams, "gram", 4, 1 << 17)
        corpus_grams = shingle_table(docs, "doc_id", "text", 3).select(
            "doc_id", F.explode("__tokens").alias("gram")
        )
        t0 = time.monotonic()
        row["bloom_probe_rows"] = bloom_probe_hits(
            corpus_grams, ["doc_id"], "gram", bloom, 4, 1 << 17
        ).where(F.col("bloom_hit")).count()
        row["bloom_probe_sec"] = round(time.monotonic() - t0, 3)

        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
        )
        t0 = time.monotonic()
        cms = cms_build(toks, "tok", 4, 1024)
        row["cms_counters"] = cms.count()
        row["cms_build_sec"] = round(time.monotonic() - t0, 3)

        # peptides chain (r6 verdict #8): the bench's J6→J11+U4 chain
        # over the replicated corpus — the workload builder multiplies
        # with the docs, so this measures the explode/containment/
        # window chain's scale shape, not just the sf0.1 point
        from prohap_spark.pipeline.peptides import annotate_peptides
        from prohap_spark.queries.peptide_board import peptide_workload

        pep_src = docs.where(
            (F.col("doc_id") % 5 == 0)
            & (F.length(F.regexp_replace("text", " ", "")) >= 140)
        ).select(
            "doc_id",
            F.upper(
                F.substring(F.regexp_replace("text", " ", ""), 1, 120)
            ).alias("base"),
        )
        t0 = time.monotonic()
        peptides, canonical, alleles = peptide_workload(pep_src)
        row["peptides_rows"] = annotate_peptides(
            peptides, canonical, alleles
        ).count()
        row["peptides_sec"] = round(time.monotonic() - t0, 3)

        # incremental ingest: the base corpus GROWS with r while the
        # delta stays fixed (500 docs, half near-copies of base). The
        # claim under test: with the persisted index, per-ingest cost
        # is O(delta + candidates) — the *_idx_sec series should stay
        # ~flat while the recompute series grows with the base.
        import shutil
        import tempfile

        from prohap_spark.operators.dedup import (
            exact_key_index,
            incremental_dedup,
            incremental_lsh_pairs,
            lsh_band_index,
        )

        base = docs
        delta_src = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
            F.col("doc_id") < 500
        )
        delta = delta_src.where(F.col("doc_id") < 250).select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            F.concat("text", F.lit(" rep0 tail")).alias("text"),
        ).unionAll(
            delta_src.where(F.col("doc_id") >= 250).select(
                (F.col("doc_id") + 60_000_000).alias("doc_id"),
                F.concat(F.lit("fresh prefix "), "text").alias("text"),
            )
        )

        t0 = time.monotonic()
        row["incr_exact_rows"] = incremental_dedup(base, delta, "doc_id", "text").count()
        row["incr_exact_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        row["incr_near_pairs"] = incremental_lsh_pairs(
            base, delta, "doc_id", "text", threshold=0.6, max_bucket_size=200
        ).count()
        row["incr_near_sec"] = round(time.monotonic() - t0, 3)

        tmp = tempfile.mkdtemp(prefix="incr_index_")
        try:
            # the validated persistence path (manifest write + checked
            # read) — the probe times what a deployment actually runs,
            # including the one-scan load validation that makes a torn
            # index fail loud instead of silently under-dedup
            from prohap_spark.operators.dedup import (
                read_dedup_index,
                write_dedup_index,
            )

            write_dedup_index(exact_key_index(base, "text"), f"{tmp}/keys")
            write_dedup_index(
                lsh_band_index(base, "doc_id", "text"), f"{tmp}/bands"
            )

            t0 = time.monotonic()
            incremental_dedup(
                None, delta, "doc_id", "text",
                base_keys=read_dedup_index(spark, f"{tmp}/keys"),
            ).count()
            row["incr_exact_idx_sec"] = round(time.monotonic() - t0, 3)

            t0 = time.monotonic()
            incremental_lsh_pairs(
                base, delta, "doc_id", "text", threshold=0.6, max_bucket_size=200,
                base_bands=read_dedup_index(spark, f"{tmp}/bands"),
            ).count()
            row["incr_near_idx_sec"] = round(time.monotonic() - t0, 3)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        out[r] = row
        print(
            f"x{r:2d}: line_dedup {row['line_dedup_sec']:6.2f}s  "
            f"substr {row['substr_sec']:6.2f}s  "
            f"pack {row['pack_sec']:6.2f}s  lsh {row['lsh_sec']:6.2f}s  "
            f"winnow {row['winnow_sec']:6.2f}s  "
            f"semdedup {row['semdedup_sec']:6.2f}s  "
            f"semdedup_capped {row['semdedup_capped_sec']:6.2f}s  "
            f"funnel {row['funnel_sec']:6.2f}s  "
            f"bloom {row['bloom_probe_sec']:6.2f}s  "
            f"cms {row['cms_build_sec']:6.2f}s  "
            f"peptides {row['peptides_sec']:6.2f}s  "
            f"incr_exact {row['incr_exact_sec']:6.2f}s"
            f"/{row['incr_exact_idx_sec']:5.2f}s(idx)  "
            f"incr_near {row['incr_near_sec']:6.2f}s"
            f"/{row['incr_near_idx_sec']:5.2f}s(idx)",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

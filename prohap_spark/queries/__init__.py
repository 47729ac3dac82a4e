"""Query registry: every implemented SURVEY.md §2 operator declared as
a (spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the same tables.

Column-name contract: Spark aliases and oracle SQL aliases MUST match
(the driver sorts columns by name before value-hashing).
"""

from prohap_spark.queries.registry import REGISTRY, register, table

# import for registration side effects
from prohap_spark.queries import relational  # noqa: F401
from prohap_spark.queries import windowed  # noqa: F401
from prohap_spark.queries import textdata  # noqa: F401
from prohap_spark.queries import simsearch  # noqa: F401
from prohap_spark.queries import scalars  # noqa: F401
from prohap_spark.queries import classic  # noqa: F401
from prohap_spark.queries import domain_oracle  # noqa: F401
from prohap_spark.queries import roundtrip  # noqa: F401
from prohap_spark.queries import peptide_board  # noqa: F401
from prohap_spark.queries import minus_strand  # noqa: F401
from prohap_spark.queries import indel_haplo  # noqa: F401
from prohap_spark.queries import start_codon  # noqa: F401
from prohap_spark.queries import sink_board  # noqa: F401
from prohap_spark.queries import junction  # noqa: F401
from prohap_spark.queries import force_rf  # noqa: F401
from prohap_spark.queries import junction_haplo  # noqa: F401
from prohap_spark.queries import peptide_grid  # noqa: F401
from prohap_spark.queries import threeexon  # noqa: F401
from prohap_spark.queries import threeexon_haplo  # noqa: F401

# The correctness harness verifies queries in dict order with a bounded
# budget (~50 entries/round; the registry is larger), so ordering IS
# coverage. ROTATION SCHEDULE (stated so coverage-over-time is
# auditable): each round the front is (a) queries never driver-checked,
# (b) queries that erred in the immediately preceding round, (c) queries
# rotated out of (dark in) the preceding round, and (d) the rows-only
# core pipelines; queries hash-green in the immediately preceding round
# fill the middle, and the most redundantly-demonstrated of them absorb
# the budget overflow in _BACK (they rotate back to the front the next
# round via rule (c)). Net effect: every registered query is hash-green
# within any trailing two-round window.
#
# Round-5 state: _FRONT = 13 new (r5) + the full dark-in-r4 set (35:
# the 34 r4 _BACK entries + agg_cube_grouping, rule (c) — nothing may
# go dark two rounds running) + 2 re-checks whose INPUTS changed this
# round (the synthetic cohort moved to v2 with X/PAR transcripts + the
# bench set grew). Exactly 50 = the driver budget. _BACK = the
# remaining 48: every hash-bearing one is green in CORRECTNESS_r04
# (verified by the rotation audit in NOTES_ROUND5), and the two
# demoted rows-only cores carry no hash signal to lose — their
# pipelines are hash-checked FRONT by the snp oracles on the same
# cohort v2 — so the trailing two-round invariant holds whatever the
# driver truncates. Queries registered mid-round AFTER the front
# window filled sit in the middle: dark this round, locally hash-green
# via tools/check.py, and front-listed next round under rule (a) —
# `python tools/rotation_audit.py` prints the exact, current list
# (the fourth/fifth-wave additions: grid/gene-header/threeexon/PQ/BPE/
# PII, line-dedup, packing, semantic dedup, unigram logprob, token
# budget, JPEG codec, fuzzy ER join, 3-exon haplotype oracle,
# winnowing, funnel, ntile ranks, char entropy, corpus curation e2e).
_FRONT = [
    # (a) new in round 5, never driver-checked:
    "domain_prohap_indel_oracle", "domain_provar_start_oracle",
    "multimodal_bmp_codec", "multimodal_wav_codec", "multimodal_png_codec",
    "s7_tsv_gz_roundtrip", "s10_partitioned_prune", "f2_allele_validity",
    "domain_provar_junction_oracle", "domain_provar_forcerf_oracle",
    "f10_sample_subset_prohap", "f8_count_threshold_prohap",
    "domain_prohap_junction_oracle",
    # (c) dark in r4 (green r3 or earlier; code unchanged since):
    "agg_cube_grouping",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "agg_exact_distinct", "w_lead_lag", "c_json_extract",
    "sql_api_q6", "s1_scan_pushdown_projection",
    "f1_regex_threshold", "f4_isin_filter",
    "f5_group_conditional_filter", "f9_array_mask_filter",
    "j2_normalized_key_join", "j3_star_dim_join", "j4_semi_join",
    "j11_anti_join", "a3_conditional_denominator",
    "a11_synthesize_missing_groups", "c15_map_merge_explode",
    "w5_running_offset", "a2_signature_grouping",
    "a4_group_frequency_maps", "a7_priority_dedup",
    "dedup_minhash_lsh", "dedup_simhash",
    "c_math_hash", "c2_regex_split_explode",
    "w3_array_sort_analytics", "emb_centroid_cosine",
    "text_fingerprint_dedup", "sim_bruteforce_topk",
    "stream_live_session_windows", "j6_explode_equijoin",
    "dedup_exact_docs", "sim_ivf_ann",
    # (e) inputs changed this round — the cohort parquet moved to
    # v3 (X/PAR transcripts + mixed-sex denominators, then the PAR1
    # dense-index placement fix), so every cohort-reading oracle must
    # re-prove itself:
    "domain_prohap_snp_oracle", "domain_provar_snp_oracle",
]
_BACK = [
    # hash-green in CORRECTNESS_r04 AND the primitive is redundantly
    # demonstrated by a front sibling — dark this round, front-listed
    # next round via rule (c):
    "dedup_simhash_near",       # Hamming-ball probing ⊃ dedup_simhash (front)
    "dedup_minhash_lsh_capped", # cap ⊃ dedup_minhash_lsh (front)
    "dedup_cluster_reps", "text_bm25_topk", "sampling_hash_split",
    "agg_salted_skew", "sim_sq_ann", "multimodal_audio_windows",
    "u4_peptide_classes",       # newly bench-timed; value check green r4
    "domain_provar_minus_strand",
    "domain_provar_indel_oracle",  # single-variant flavor ⊂ the new
                                   # multi-variant haplotype oracle (front)
    "w1_islands_sessionize", "j10_asof_join", "stream_tumbling_window",
    "j9_containment_join", "f12_liftover_artifact_filter",
    "stream_session_window", "c7_reverse_translate",
    "w2_deterministic_row_number", "agg_rollup", "agg_pivot",
    "agg_quantiles", "so_set_ops", "text_quality", "text_langid",
    "stream_sliding_window", "j1b_interval_overlap_join",
    "w1b_interval_islands", "dedup_jaccard_pairs",
    "q1_pricing_summary", "c_string_surgery", "topk_per_group",
    "j1_interval_join_binned", "text_token_counts",
    "dedup_embedding_cosine", "stream_stateful_user_stats",
    "multimodal_decode_features",
    # green r4, inputs unchanged; demoted to make front room for the
    # two new real-codec queries (which subsume their capability
    # demonstration this round):
    "stream_click_attribution", "multimodal_resize_stats",
    # green r4; demoted for the three new sink/filter-board queries —
    # the text-source family stays front-represented by the S7/S10
    # sink roundtrips, which read the same cohort parquet truth:
    "s1_vcf_roundtrip", "s4_gtf_roundtrip", "s5_fasta_roundtrip",
    # rows-only by design; its recall floor is pinned in pytest
    # (tests/test_operators.py) — demoted for the F8 threshold oracle:
    "sim_lsh_ann",
    # rows-only by design; its value signal moved to the pytest
    # error-bound tolerance test this round (tests/test_operators.py),
    # so the driver row adds nothing — demoted for the force_rf oracle:
    "agg_approx_sketches",
    # green r4; demoted for the F10 subset oracle — its provar core
    # re-proves itself on cohort v2 via domain_provar_snp_oracle
    # (front), and the postprocess stage logic is input-shape-agnostic:
    "domain_postprocess_chain",
    # green r4; demoted for the junction oracle — its provar core
    # re-proves itself on cohort v2 via domain_provar_snp_oracle
    # (front), and the fasta-dedup stage logic is unchanged:
    "domain_provar_fasta_oracle",
    # rows-only by design (no hash signal to lose); demoted for the
    # junction-HAPLOTYPE oracle — the same ProHap pipeline on the same
    # cohort v2 is hash-checked end-to-end by domain_prohap_snp_oracle
    # (front), a strictly stronger signal than this rows-only row:
    "domain_prohap_synthetic",
    # rows-only by design (no hash signal to lose); demoted for the
    # compressed-PNG codec oracle — the ProVar core is hash-checked
    # front on cohort v2 by domain_provar_snp_oracle:
    "domain_provar_synthetic",
]


def _ordered():
    front = [n for n in _FRONT if n in REGISTRY]
    back = [n for n in _BACK if n in REGISTRY]
    mid = [n for n in REGISTRY if n not in _FRONT and n not in _BACK]
    return front + mid + back


def queries():
    return {name: REGISTRY[name][0] for name in _ordered()}


def oracle_sql():
    return {
        name: REGISTRY[name][1] for name in _ordered() if REGISTRY[name][1] is not None
    }

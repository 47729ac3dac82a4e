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
from prohap_spark.queries import canary  # noqa: F401
from prohap_spark.queries import junction  # noqa: F401
from prohap_spark.queries import force_rf  # noqa: F401
from prohap_spark.queries import junction_haplo  # noqa: F401
from prohap_spark.queries import peptide_grid  # noqa: F401
from prohap_spark.queries import threeexon  # noqa: F401
from prohap_spark.queries import threeexon_haplo  # noqa: F401
from prohap_spark.queries import shim_board  # noqa: F401
from prohap_spark.queries import maintenance  # noqa: F401

# The correctness harness verifies queries in dict order with a bounded
# budget (~50 entries/round; the registry is larger), so ordering IS
# coverage. ROTATION SCHEDULE (stated so coverage-over-time is
# auditable): each round the front is (a) queries never driver-checked,
# (b) queries that erred or went hash-red in the immediately preceding
# round, and (c) queries whose last green round is two rounds back
# (nothing may go dark three rounds running). Everything else fills the
# middle/back. Net effect: every registered query is hash-green within
# any trailing THREE-round window (restated r6; registry HARD-CAPPED at
# 150 = 3x50). tools/rotation_audit.py verifies this mechanically
# against the CORRECTNESS_r*.json files.
#
# Round-14 state. Obligations were 51 against the 50 budget: (b)
# sim_embedding_board (red r11/r12/r13 — r14 removes its last two
# unique surfaces per VERDICT r13: the struct-in-lambda oracle
# dialect is retired for _ex2_sql's unnest+generate_subscripts
# idiom, and the brute leg hashes the FULL all-pairs integer scored
# table so no double influences even row selection) + (a) the 3
# r13-tail registrations never driver-checked (q_join_board,
# float_env_canary, text_preference_pairs) + (c) the 47 r11-greens
# going dark. Resolution per the documented precedence (b > a > c),
# visibly: the two rule-(c) IVF singletons sim_ivf_ann +
# sim_ivf_index_probe MERGED into sim_ivf_board (the slot-freeing
# device, 16th use; queries/simsearch.py — they already shared one
# oracle, and the board additionally pins direct-path == index-path
# value equality) — the board carries both members' rule-(c)
# obligation and fronts NOW, bringing the front to exactly
# 1 + 3 + 1 + 45 = 50. No entry was bumped or silently dropped.
# Registry: 148 (two slots of headroom under the 150 cap).
#
# (Round-13 for the record: obligations were 51; text_quality +
# text_langid merged into text_quality_board — 14th use — and
# q3_shipping_priority + q5_local_supplier_volume into q_join_board
# — 15th — funding float_env_canary and text_preference_pairs.)
#
# Overflow precedence (first exercised r8, exercised again this
# round): if a round's obligations exceed the 50 budget, priority is
# (b) red/err > (a) never-checked > (c) going-dark, and the displaced
# lowest-priority entries either get bumped ONE round with an explicit
# note here or a redundant entry is deregistered/merged to make room,
# whichever keeps total coverage higher. Silent omission is never an
# option — the audit's exit code enforces that the resolution is
# visible.
_FRONT = [
    # rule-(b): the r11/r12/r13 red — r14 retires the struct-dialect
    # oracle AND the float-ordered row selection (see simsearch.py):
    "sim_embedding_board",
    # rule-(a): the 3 r13-tail registrations, never driver-checked:
    "q_join_board", "float_env_canary", "text_preference_pairs",
    # rule-(a): the r14 merge board (carries sim_ivf_ann +
    # sim_ivf_index_probe's rule-(c) obligation — the overflow
    # resolution):
    "sim_ivf_board",
    # rule-(c): the 45 remaining r11-greens — dark r12 and r13, the
    # window forces them now:
    "a11_synthesize_missing_groups", "a2_signature_grouping",
    "a3_conditional_denominator", "a4_group_frequency_maps",
    "a7_priority_dedup", "agg_cube_grouping", "agg_exact_distinct",
    "c15_map_merge_explode", "c_scalar_board", "dedup_cdc_chunking",
    "dedup_exact_docs", "domain_prohap_indel_oracle",
    "domain_prohap_junction_oracle", "domain_prohap_snp_oracle",
    "domain_provar_forcerf_oracle", "domain_provar_junction_oracle",
    "domain_provar_snp_oracle", "domain_provar_start_oracle",
    "f10_sample_subset_prohap", "f1_regex_threshold",
    "f2_allele_validity", "f4_isin_filter",
    "f5_group_conditional_filter", "f8_count_threshold_prohap",
    "f9_array_mask_filter", "j11_anti_join",
    "j12_bucketed_colocated_join", "j2_normalized_key_join",
    "j3_star_dim_join", "j4_semi_join", "j6_explode_equijoin",
    "multimodal_bmp_png_codec", "s10_partitioned_prune",
    "s14_s15_shim_board", "s1_scan_pushdown_projection",
    "s7_tsv_gz_roundtrip", "sql_api_q6", "stream_live_session_windows",
    "stream_sketch_board", "text_bpe_train", "text_fingerprint_dedup",
    "text_info_board", "w3_array_sort_analytics", "w5_running_offset",
    "w_lead_lag",
]
_BACK = [
    # last green r12 — the r15 rule-(c) obligations (they may go dark
    # r13 AND r14 without violating the three-round window); the
    # 49 r13-greens land mid-registry and become the r16 front.
    "agg_quantile_sketch", "sketch_algebra_board", "j13_bloom_semi_join",
    "layout_zorder_cluster", "w1_islands_board", "stream_batch_parity_board",
    "sim_quantized_ann_board", "j1_interval_board",
    "dedup_minhash_lsh_board", "dedup_simhash_board",
    "multimodal_audio_window_codec", "text_quality_classifier",
    "q1_pricing_summary", "er_fuzzy_blocked_join",
    "w2_deterministic_row_number", "topk_per_group", "j10_asof_join",
    "events_funnel", "w_ntile_percent_rank", "dedup_jaccard_pairs",
    "dedup_cluster_reps", "text_bm25_topk", "sampling_hash_split",
    "text_decontaminate", "text_repetition_stats",
    "sampling_stratified_rates", "text_bpe_tokens", "text_pii_scrub",
    "text_line_dedup", "pack_context_windows", "sampling_token_budget",
    "dedup_winnowing", "corpus_curation_e2e", "dedup_embedding_cosine",
    "dedup_semantic", "j9_containment_join",
    "stream_stateful_user_stats", "agg_salted_skew",
    "multimodal_jpeg_codec", "agg_grouping_sets",
    "domain_provar_fasta_oracle", "domain_postprocess_chain",
    "u4_peptide_classes", "domain_provar_minus_strand",
    "domain_provar_indel_oracle", "j8_gene_header_annotation",
    "u4_full_class_grid", "domain_provar_threeexon_oracle",
    "domain_prohap_threeexon_oracle",
]


ROWS_ONLY_BY_DESIGN = {
    # EMPTY as of r9 — every registered query now carries a value-hash
    # oracle. The last two holdouts were de-weakened:
    # - text_quality_classifier (r9): gate swapped from the L-BFGS demo
    #   (float-iteration coefficients no SQL engine replays; the
    #   production filter quality_classifier_scores stays the library
    #   API with its held-out-accuracy pytest) to the integer
    #   fixed-point linear probe — training AND per-document scoring
    #   replay bit-exactly as unrolled DuckDB CTEs
    #   (operators/classifier.py).
    # - agg_approx_sketches (r9): projection restructured to exact
    #   aggregates + the deterministic-HLL replay
    #   (functions/sketches.py) + PROPERTY booleans asserting the
    #   engine-native sketches landed inside their error envelopes
    #   (the raw register-dependent values stay unprojected — they are
    #   the one thing no other engine can replay; the booleans are
    #   what IS portable).
    # - text_bpe_train left this set in r8: the full 8-iteration
    #   trainer unrolls into materialized DuckDB CTEs (functions/
    #   bpe.py bpe_train_oracle_sql). The r6 'DuckDB recursion hangs'
    #   verdict was a 2^K CTE-inlining blow-up, not infeasibility.
}


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

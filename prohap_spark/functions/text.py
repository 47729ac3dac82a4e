"""Text-analysis expressions for training-data pipelines — language ID,
quality scoring, token counting, fingerprinting. All JVM-side column
expressions (no UDFs): they stay inside whole-stage codegen and scale
linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def _words(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def words_array_expr(text: str | Column) -> Column:
    """Public form of :func:`_words` — the exact token array every
    ratio in this module derives from (lower → trim → split on \\s+).
    Materialize THIS as a column and pass it back via ``words=`` when
    several token-array consumers share one projection."""
    return _words(text)


def _ws_or(text: str | Column, words: str | Column | None) -> Column:
    """The token array driving every ratio below: ``words`` when the
    caller pre-materialized it, else split from ``text``.

    r14 (guide §1.2 per-task work): the quality+langid battery
    references the token array ~40 times; callers that inline the raw
    split get it RE-EVALUATED per reference, because the array HOFs
    (filter/aggregate) are CodegenFallback — whole-stage codegen's
    common-subexpression elimination never sees them. Materializing
    the split as a real column in its own projection (referenced >=2x
    so CollapseProject keeps it) computes it once per row: the merged
    quality board measured 0.65 s -> 0.39 s at sf0.1, byte-identical
    output."""
    if words is None:
        return _words(text)
    return F.col(words) if isinstance(words, str) else words


def whitespace_token_count(
    text: str | Column, words: str | Column | None = None
) -> Column:
    return F.size(_ws_or(text, words))


def regex_token_count(text: str | Column, pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]") -> Column:
    """BPE-ish token count: alpha runs, digit runs, single punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def stopword_ratio(
    text: str | Column, stopwords=DEFAULT_STOPWORDS,
    words: str | Column | None = None,
) -> Column:
    ws = _ws_or(text, words)
    hits = F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def punct_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_length(
    text: str | Column, words: str | Column | None = None
) -> Column:
    ws = _ws_or(text, words)
    total = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def quality_score_expr(
    text: str | Column, stopwords=DEFAULT_STOPWORDS,
    words: str | Column | None = None,
) -> Column:
    """Heuristic document quality in [0, 1]: rewards being inside a
    sane length band, having a natural mean word length, containing
    stopwords, and low punctuation density (Gopher/C4-style rules).
    ``words``: optional pre-materialized token array (see
    :func:`_ws_or` — pass it whenever this composes with other
    token-array consumers in one projection)."""
    from prohap_spark.functions.hof import bind_once

    c = F.col(text) if isinstance(text, str) else text
    n_words = whitespace_token_count(c, words=words).cast("double")
    len_ok = F.when((n_words >= 10) & (n_words <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    # r14: the band test references mwl twice and its O(n) aggregate()
    # body is CodegenFallback (re-evaluated per reference) — bind it
    # so the token-length fold runs once per row
    mwl_ok = bind_once(
        mean_word_length(c, words=words),
        lambda m: F.when((m >= 2.0) & (m <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    sw = stopword_ratio(c, stopwords, words=words)
    sw_ok = F.least(sw * 5.0, F.lit(1.0))
    pr = punct_ratio(c)
    pr_ok = F.lit(1.0) - F.least(pr * 5.0, F.lit(1.0))
    return (len_ok + mwl_ok + sw_ok + pr_ok) / 4.0


def lang_id_expr(
    text: str | Column, profiles: dict[str, tuple] = LANG_PROFILES,
    min_ratio: float = 0.05, words: str | Column | None = None,
) -> Column:
    """Pick the language whose stopword profile matches the largest
    share of tokens; 'und' (undetermined) when the best share is below
    ``min_ratio``. Ties resolve in profile-insertion order.
    ``words``: optional pre-materialized token array (see _ws_or)."""
    from prohap_spark.functions.hof import bind_once

    langs = list(profiles.keys())
    ratios = F.array(
        *[stopword_ratio(text, sw, words=words) for sw in profiles.values()]
    )
    # r14: evaluate the 4 profile ratios ONCE per row (bound array) —
    # the previous greatest()/when-chain form re-referenced each
    # ratio's O(n) CodegenFallback filter() ~5x (once per CASE branch
    # plus the shared argmax), ~20 token-array scans per row. Inside
    # the bind, array_max/element_at on the bound 4-element array are
    # O(1). Same values: array_max == greatest on never-null doubles
    # (the ratios coalesce to 0.0), tie order preserved by the same
    # reversed when-chain.
    def body(r: Column) -> Column:
        best = F.array_max(r)
        pick = F.lit("und")
        # reverse order so earlier profiles win ties
        for i in reversed(range(len(langs))):
            s = F.element_at(r, i + 1)
            pick = F.when(
                (s == best) & (best >= min_ratio), F.lit(langs[i])
            ).otherwise(pick)
        return pick

    return bind_once(ratios, body)


TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref|ref_src)="


def canonicalize_url(url: str | Column) -> Column:
    """Canonical dedup key for a URL — the crawl-dedup staple that
    collapses the tracking-parameter/fragment/case/trailing-slash
    variants one page accumulates across snapshots:

    - scheme and host lowercased; port dropped (parse_url HOST is
      host-only — http://a:80/ and http://a/ collapse, as do any
      explicit non-default ports, which for a DEDUP key is the safe
      direction: it can only merge true near-variants);
    - fragment dropped (never reaches the server);
    - tracking params removed (utm_*, fbclid, gclid, msclkid, mc_eid,
      ref, ref_src), remaining query params SORTED so param order
      doesn't split a key, '=' -joined as given;
    - path's trailing slash stripped (root normalizes to empty path).

    Pure JVM column expressions (try_parse_url + filter/array_sort
    inside one projection) — no UDF. Returns NULL for rows the parser
    rejects or that lack a host (ANSI parse_url THROWS on malformed
    input — try_parse_url is the tolerant form), so malformed urls
    never collide on a shared key."""
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))
    path_norm = F.when(
        path.isNull() | (path == "") | (path == "/"), F.lit("")
    ).otherwise(F.regexp_replace(path, "/$", ""))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.when(
        host.isNotNull() & proto.isNotNull(),
        F.concat(proto, F.lit("://"), host, path_norm, qs),
    )

"""Real byte-pair-encoding tokenization (not the BPE-ish regex proxy
in functions/text.py) — greedy rank-ordered merges over a fixed merge
vocabulary, the accounting primitive a training-data pipeline needs
for token budgets.

Algorithm (standard BPE, Sennrich et al. 2016 — public method): a word
starts as its character list; repeatedly find the LOWEST-RANK merge
rule whose pair occurs anywhere in the list and merge ALL its
occurrences simultaneously; stop when no rule applies.

The merge loop is inherently sequential per word, so it runs inside an
Arrow-batched ``mapInPandas`` stage (the sanctioned Python path —
the distributed axis is Spark partitioning, the per-row work is a
short loop over ≤ word-length iterations).

Vocabulary constraint (checked at import): every rule's left and right
symbols DIFFER. With distinct-sided rules two occurrences of one pair
can never overlap ("A A A" needs left == right), so "merge all
occurrences simultaneously" is order-free — which is exactly what
makes the DuckDB oracle expressible as a recursive CTE applying the
same per-iteration list rewrite.
"""

from __future__ import annotations

# (left, right) in rank order — merging produces left+right. A small
# English-frequency-flavored vocabulary; deterministic, engine-neutral.
MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"),
    ("e", "n"), ("a", "t"), ("o", "u"), ("i", "s"), ("i", "t"),
    ("a", "l"), ("e", "d"), ("n", "g"), ("in", "g"), ("t", "o"),
    ("a", "r"), ("o", "f"), ("e", "s"), ("l", "e"), ("c", "h"),
]

for _l, _r in MERGES:
    assert _l != _r, "BPE merge rules must have distinct sides (see module doc)"

_RANK = {pair: i for i, pair in enumerate(MERGES)}


def bpe_encode_word(word: str) -> list[str]:
    """BPE-encode one (already lowercased) word against MERGES."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = _RANK.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        left, right = MERGES[best]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_doc_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per document: word count, REAL BPE token count, and an md5
    digest of the ordered token stream (the sharp cross-engine check —
    any mis-merged word anywhere in the doc changes it). Words are the
    ``[a-z]+`` runs of the lowercased text."""
    import hashlib
    import re

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401  (API parity)

    word_re = re.compile(r"[a-z]+")

    def run(batches):
        for pdf in batches:
            ids, n_words, n_tokens, digests = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = word_re.findall((text or "").lower())
                toks: list[str] = []
                for w in words:
                    toks.extend(bpe_encode_word(w))
                ids.append(doc_id)
                n_words.append(len(words))
                n_tokens.append(len(toks))
                digests.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_bpe_tokens": n_tokens,
                    "token_digest": digests,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_words long, n_bpe_tokens long, token_digest string"
    )


def bpe_train_oracle_sql(
    num_merges: int = 8,
    min_count: int = 2,
    docs_table: str = "documents",
    text_col: str = "text",
) -> str:
    """Unrolled-iteration DuckDB replay of :func:`bpe_train` — the
    device that turned pagerank and pack_best_fit value-checkable,
    applied to the last 'irreducible' rows-only entry (r7 verdict #7).

    Why this works where the r6 recursion probe hung: the Spark
    trainer folds over the WORD-TYPE table (one row per distinct word,
    weighted by corpus frequency), not the corpus — so the oracle's
    per-iteration state is vocab-sized, and because ``num_merges`` is
    a fixed plan parameter the loop unrolls into ``num_merges`` CTE
    triples (pair-count -> bounded argmax -> list rewrite) with no
    recursive CTE at all. Every CTE is AS MATERIALIZED: v_k is
    referenced by both p_{k+1} and v_{k+1}, and letting DuckDB inline
    it twice per level would blow up 2^K — plausibly the real reason
    the earlier recursive formulation appeared to hang.

    Iteration parity with the Spark trainer, piece by piece:
    - words: split trim(lower(text)) on \\s+, drop '', weight by count.
    - pairs: adjacent (l, r) with l != r, weighted sum of word freq.
    - argmax: ORDER BY cnt DESC, l, r LIMIT 1 with cnt >= min_count —
      an empty b_k replays the trainer's early ``break`` (vocab then
      passes through unchanged, so every later b is empty too).
    - rewrite: element i becomes l||r when (s[i], s[i+1]) == (l, r)
      and is dropped when (s[i-1], s[i]) == (l, r); with l != r the
      conditions are disjoint (module invariant), so the one-pass
      transform+filter below is exact. The filter indexes the
      ORIGINAL array (i > 1 guard: index 0 is NULL in DuckDB, and a
      NULL predicate would silently DROP the first element)."""
    esc_text = text_col
    parts = [
        f"words AS MATERIALIZED (\n"
        f"      SELECT w, count(*) AS freq FROM (\n"
        f"        SELECT unnest(string_split_regex(trim(lower({esc_text})), '\\s+')) AS w\n"
        f"        FROM {docs_table}\n"
        f"      ) WHERE w != '' GROUP BY w\n"
        f"    )",
        "v0 AS MATERIALIZED (\n"
        "      SELECT list_transform(range(1, length(w) + 1),\n"
        "               i -> substr(w, CAST(i AS INT), 1)) AS syms, freq\n"
        "      FROM words\n"
        "    )",
    ]
    for k in range(1, num_merges + 1):
        p = k - 1
        parts.append(
            f"p{k} AS MATERIALIZED (\n"
            f"      SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (\n"
            f"        SELECT syms[CAST(t.i AS INT)] AS l,\n"
            f"               syms[CAST(t.i AS INT) + 1] AS r, freq\n"
            f"        FROM v{p}, unnest(range(1, len(syms))) t(i)\n"
            f"      ) WHERE l != r GROUP BY l, r\n"
            f"    )"
        )
        parts.append(
            f"b{k} AS MATERIALIZED (\n"
            f"      SELECT l, r, cnt FROM p{k} WHERE cnt >= {min_count}\n"
            f"      ORDER BY cnt DESC, l, r LIMIT 1\n"
            f"    )"
        )
        parts.append(
            f"v{k} AS MATERIALIZED (\n"
            f"      SELECT CASE WHEN b.l IS NULL THEN syms ELSE\n"
            f"        list_filter(\n"
            f"          list_transform(syms, (x, i) ->\n"
            f"            CASE WHEN x = b.l AND syms[i + 1] = b.r\n"
            f"                 THEN b.l || b.r ELSE x END),\n"
            f"          (x, i) -> NOT (i > 1 AND syms[i] = b.r\n"
            f"                         AND syms[i - 1] = b.l))\n"
            f"        END AS syms, freq\n"
            f"      FROM v{p} LEFT JOIN b{k} b ON TRUE\n"
            f"    )"
        )
    selects = "\n      UNION ALL ".join(
        f'SELECT {k - 1} AS rank, l AS "left", r AS "right", cnt AS pair_count FROM b{k}'
        for k in range(1, num_merges + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT CAST(rank AS INT) AS rank, \"left\", \"right\","
        + f" pair_count FROM (\n      {selects}\n    )"
    )


def bpe_train(
    df,
    text_col: str = "text",
    num_merges: int = 16,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """DISTRIBUTED BPE training (Sennrich et al. 2016, public method):
    learn up to ``num_merges`` merge rules from a corpus. Returns
    [(left, right, pair_count)] in learned (rank) order.

    The 100 TB shape: the corpus is touched EXACTLY ONCE — the word-
    frequency aggregation (map-side partial agg on the word). Every
    training iteration thereafter runs on the VOCAB table (one row per
    distinct word, weighted by freq): a pair-count aggregate, a
    driver-side argmax of one row, and a pure-JVM array rewrite that
    applies the chosen merge to every word simultaneously. The vocab
    table is cached and re-cached per iteration (the iterative-
    algorithm pattern — lineage would otherwise grow to O(K) passes),
    and everything is unpersisted before returning.

    Determinism: argmax ties break on (count DESC, left ASC, right
    ASC). Same-sided pairs (left == right, e.g. 'l'+'l') are EXCLUDED
    from candidates — the module-level constraint that makes
    "merge all occurrences" order-free (see module docstring) — so the
    one-pass zip_with rewrite below is exact. Training stops early
    when the best remaining pair's count drops below ``min_count``."""
    from pyspark.sql import functions as F

    def pair_struct(a, b):
        return F.struct(a.alias("l"), b.alias("r"))

    vocab = (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("w", "").alias("syms"), "freq")
        .where(F.size("syms") > 0)
    )
    vocab = vocab.persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(num_merges):
            s = F.col("syms")
            shifted = F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0)))
            pairs = (
                vocab.select(
                    "freq",
                    F.explode(
                        F.zip_with(
                            s,
                            shifted,
                            lambda a, b: F.when(b.isNotNull(), pair_struct(a, b)),
                        )
                    ).alias("p"),
                )
                .where(F.col("p").isNotNull() & (F.col("p.l") != F.col("p.r")))
                .groupBy("p")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.col("p.l"), F.col("p.r"))
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0]["cnt"] < min_count:
                break
            left, right = pairs[0]["p"]["l"], pairs[0]["p"]["r"]
            merges.append((left, right, int(pairs[0]["cnt"])))
            # apply the merge to every word: element i becomes left+right
            # when (s[i], s[i+1]) == (left, right); element i is DROPPED
            # when (s[i-1], s[i]) == (left, right). With left != right the
            # two conditions are disjoint, so the rewrite is one pass of
            # constant-reference array ops (no element_at-in-lambda trap).
            prv = F.concat(F.array(F.lit("")), F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))))
            nxt = F.concat(F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))), F.array(F.lit("")))
            vals = F.zip_with(
                s, nxt,
                lambda x, n: F.when((x == left) & (n == right), F.lit(left + right)).otherwise(x),
            )
            keep = F.zip_with(
                s, prv,
                lambda x, p: ~((x == right) & (p == left)),
            )
            merged = F.filter(
                F.zip_with(vals, keep, lambda v, k: F.struct(v.alias("v"), k.alias("k"))),
                lambda z: z["k"],
            )
            new_vocab = vocab.select(
                F.transform(merged, lambda z: z["v"]).alias("syms"), "freq"
            ).persist()
            new_vocab.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges

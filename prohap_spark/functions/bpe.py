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

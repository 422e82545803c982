"""Canonical pure-Python BPE reference model (Sennrich-style), shared
by the fixed-corpus pin (test_text_filters) and the hypothesis
property test (test_properties) so a semantics fix lands in ONE place.

Semantics must mirror aws_etl_spark.text.bpe exactly: lowercase
whitespace words filtered to ^[a-z]{1,20}$, char symbols + END_MARK,
all-adjacent-positions pair counting weighted by word freq, argmax by
(count desc, pair asc), LEFT-TO-RIGHT greedy merge, early stop when no
pairs remain.
"""

from __future__ import annotations

from collections import Counter

from aws_etl_spark.text.bpe import END_MARK


def word_inventory(texts: list[str]) -> Counter:
    words: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if w.isalpha() and len(w) <= 20:
                words[w] += 1
    return words


def greedy_merge(s: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def canonical_bpe(
    texts: list[str], n_rounds: int
) -> tuple[list[tuple], dict[str, int]]:
    """(merges, vocab): merge rows are (round, sym_a, sym_b, merged,
    pair_count); vocab maps final symbol -> freq-weighted count."""
    words = word_inventory(texts)
    seqs = {w: [*w, END_MARK] for w in words}

    def pair_counts() -> Counter:
        c: Counter = Counter()
        for w, s in seqs.items():
            for a, b in zip(s, s[1:]):
                c[(a, b)] += words[w]
        return c

    merges: list[tuple] = []
    for r in range(1, n_rounds + 1):
        pc = pair_counts()
        if not pc:
            break  # fully merged: same early stop as bpe_train
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, n))
        seqs = {w: greedy_merge(s, a, b) for w, s in seqs.items()}

    vocab: Counter = Counter()
    for w, s in seqs.items():
        for sym in s:
            vocab[sym] += words[w]
    return merges, dict(vocab)

"""Byte-pair-encoding tokenizer (Sennrich et al. 2016, ACL — the
subword algorithm behind GPT-2-family vocabularies), from scratch and
fully deterministic.

Training (`train_bpe`) runs on an aggregated WORD-FREQUENCY table,
not the corpus: the classic formulation — each word is a symbol
sequence ending in the `</w>` marker; each round counts adjacent
symbol-pair frequencies weighted by word count and merges the most
frequent pair everywhere. Tie-break is pinned (highest count, then
lexicographically smallest pair) so the merge list is a pure function
of the word counts. This is what makes the trainer scale-correct on
Spark: the corpus-sized work (word counting) is a distributed
map-side-combined aggregate, and only the BOUNDED vocabulary table
(top-N words) reaches the driver — the same bounded-collect
discipline as PQ codebook training.

Encoding (`encode_word`) is the standard greedy ranked-merge loop:
repeatedly merge the adjacent pair with the lowest merge rank until
none applies. Deterministic; `''.join(tokens)` always reconstructs
`word + '</w>'` (the roundtrip property test).
"""

from __future__ import annotations

from collections import Counter

END = "</w>"


def train_bpe(word_counts: dict[str, int],
              n_merges: int) -> list[tuple[str, str]]:
    """Learn up to n_merges merge rules from a word-frequency table.
    Deterministic: ties on pair frequency break to the
    lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = {_merge_syms(syms, best): c for syms, c in vocab.items()}
    return merges


def _merge_syms(syms: tuple[str, ...],
                pair: tuple[str, str]) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right occurrence of
    `pair` in `syms` with its concatenation."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str,
                ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy ranked-merge encode: apply the lowest-rank applicable
    merge (all its occurrences) until none applies."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_syms(syms, best_pair)
    return list(syms)

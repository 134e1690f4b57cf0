"""Zipf-vocabulary corpus generator (VERDICT r12 item 2).

The driver fixture's documents table has a 31-token vocabulary with
median df ~78% of the corpus — the documented WORST CASE for every
selective-term mechanism in the repo (hybrid_rrf_topk's rare-term
probe, bm25_search's term filter, the PPJoin prefix rank): posting
lists are ≈ the corpus, so the pruned paths run but their selectivity
win is unmeasurable. Real corpora (e.g. the Gutenberg texts the
reference tests on, main/test-mr.sh:34) are Zipf-distributed: a few
very common words, a long tail of rare ones, and a query's rarest
terms are SELECTIVE. This generator produces such a corpus —
deterministically — so tests/test_zipf.py can measure the selective
regime and SCALE.md can carry the numbers.

Shape:
- rank-frequency P(r) ∝ 1/r^1.07 over a `vocab`-word vocabulary;
  word spellings are base-26 letter strings (common words short, like
  real text), with quality.SEARCH_TERMS spliced in at fixed ranks so
  bm25_search's literal query is answerable;
- `n_clone_pairs` documents are near-duplicates (a seeded clone with
  ~3 replaced tokens) so the set-similarity joins have qualifying
  pairs to find;
- an embeddings table (vec_id ≡ doc_id, dim 64, 16 fixture labels)
  so the dense side of hybrid retrieval runs against the same corpus.

Determinism: numpy default_rng with a fixed seed — stable for the
in-repo measurements this feeds (these are selectivity/equality
tests, NOT cross-engine oracles; the registered sf0.01 oracles are
untouched).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEARCH_TERM_RANKS = {"spark": 40, "window": 400, "hash": 1500}


def idx_to_word(i: int) -> str:
    """Bijective base-26 spelling: 0->'a', 25->'z', 26->'aa', ..."""
    out = []
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out.append(chr(ord("a") + r))
    return "".join(reversed(out))


def build(out_dir: str, n_docs: int = 500, vocab: int = 4096,
          seed: int = 13, n_clone_pairs: int = 40,
          dim: int = 64) -> str:
    """Write documents.parquet + embeddings.parquet under out_dir."""
    rng = np.random.default_rng(seed)
    words = [idx_to_word(i) for i in range(vocab)]
    for term, rank in SEARCH_TERM_RANKS.items():
        words[rank] = term
    w = 1.0 / np.arange(1, vocab + 1) ** 1.07
    p = w / w.sum()

    texts: list[str] = []
    for i in range(n_docs):
        length = int(rng.integers(60, 160))
        toks = rng.choice(vocab, size=length, p=p)
        texts.append(" ".join(words[t] for t in toks))
    # near-duplicate pairs: doc (n_docs-1-i) becomes a light
    # perturbation of doc i — ~3 replaced tokens keeps the 3-gram
    # shingle Jaccard well above the 0.5 threshold
    for i in range(n_clone_pairs):
        src = texts[i].split(" ")
        for j in rng.choice(len(src), size=3, replace=False):
            src[int(j)] = words[int(rng.integers(0, vocab))]
        texts[n_docs - 1 - i] = " ".join(src)

    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n_docs, pa.string()),
        "source": pa.array([f"src{i % 5}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    emb = rng.normal(0.0, 1.0, size=(n_docs, dim)).astype(np.float32)
    embeddings = pa.table({
        "vec_id": pa.array(range(n_docs), pa.int64()),
        "embedding": pa.array([list(map(float, row)) for row in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(
            [int(x) for x in rng.integers(0, 16, size=n_docs)],
            pa.int32()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(embeddings,
                   os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


if __name__ == "__main__":
    import sys

    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf_fixture")

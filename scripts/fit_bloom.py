"""Fit the decontamination Bloom bitmap OFFLINE and ship it as an
artifact (learnhtml_spark/artifacts/bloom_bitmap.npz) — the same
constants-shipping pattern as the IVF centroids and PCA components:
production decontamination builds the bitmap ONCE from the benchmark
suite and serves it read-only to every pipeline run
(``bloom_decontaminate(docs, bitmap=...)``).

Shingle and hash semantics are the exact Python mirror of the Spark/SQL
pair (pinned by tests/test_chunking.py's bloom fuzz test): lowercase,
trim ASCII spaces only, split on \\s+, whole-text gram when the doc has
fewer than k tokens, blank grams dropped, distinct per doc; probes are
(h1 + i*h2) mod m from the two 13-hex-digit halves of the gram md5.

Usage: python scripts/fit_bloom.py [sf_dir] [eval_n] [k] [m_bits] [n_hash]
"""

import hashlib
import os
import re
import sys

import numpy as np

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "learnhtml_spark",
    "artifacts",
    "bloom_bitmap.npz",
)


def text_grams(text: str, k: int) -> set:
    t = text.lower().strip(" ")
    toks = re.split(r"\s+", t) if len(t) else []
    if not toks:
        return set()
    gs = (
        [" ".join(toks)]
        if len(toks) < k
        else [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
    )
    return {g for g in gs if g.strip(" ")}


def gram_probes(g: str, m_bits: int, n_hash: int):
    mh = hashlib.md5(g.encode("utf-8")).hexdigest()
    h1, h2 = int(mh[:13], 16), int(mh[13:26], 16)
    return [(h1 + i * h2) % m_bits for i in range(n_hash)]


def fit_bloom(texts, k: int, m_bits: int, n_hash: int):
    """(words, n_distinct_grams): int64 word array (m_bits/32 words, 32
    bits used per word) with every DISTINCT gram across all texts
    folded in, plus the distinct-gram count (the number the 'm_bits ~
    10 bits/gram' sizing rule applies to)."""
    words = np.zeros(m_bits // 32, dtype=np.int64)
    grams = set()
    for text in texts:
        grams |= text_grams(text, k)
    for g in grams:
        for p in gram_probes(g, m_bits, n_hash):
            words[p // 32] |= np.int64(1) << (p % 32)
    return words, len(grams)


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    eval_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    m_bits = int(sys.argv[4]) if len(sys.argv) > 4 else 32768
    n_hash = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    texts = [
        r[0]
        for r in duckdb.sql(
            f"select text from read_parquet('{sf_dir}/documents.parquet') "
            f"order by doc_id limit {eval_n}"
        ).fetchall()
    ]
    words, n_grams = fit_bloom(texts, k, m_bits, n_hash)
    set_bits = int(sum(bin(int(w) & 0xFFFFFFFF).count("1") for w in words))
    np.savez(
        ARTIFACT,
        words=words,
        m_bits=np.int64(m_bits),
        n_hash=np.int64(n_hash),
        k=np.int64(k),
        fit_sf_dir=np.array(sf_dir),
    )
    print(
        f"bloom fitted: {n_grams} grams, {set_bits}/{m_bits} bits set "
        f"(fp/probe ~ {(set_bits / m_bits) ** n_hash:.2e}) -> {ARTIFACT}"
    )


if __name__ == "__main__":
    main()

"""Deterministic synthetic Common-Crawl-style corpus with planted duplicate
clusters (FIXTURES.md F1). Shape fixed by BASELINE.json input_hint:
documents(url string, warc_ts timestamp, html binary, text string,
lang string).

Ground truth emitted alongside:
* truth_pairs(url_a, url_b, jaccard)  — url_a < url_b, all within-cluster pairs
* truth_clusters(url, cluster_id)

Everything is seeded (no wall clock) so resume/regeneration is
byte-identical (SURVEY.md H7).
"""

from __future__ import annotations

import datetime as dt

import numpy as np

def _make_vocab(n: int = 20000, seed: int = 777) -> list[str]:
    """Deterministic pseudo-word vocabulary. Must be LARGE: with a tiny
    vocabulary, two random documents share most of their char shingles and
    the whole corpus becomes one near-dup blob (baseline Jaccard between
    unrelated docs must be ~0, as in real webtext)."""
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.randint(4, 10, size=n)
    return ["".join(letters[rng.randint(0, 26, size=l)]) for l in lens]


_WORDS = _make_vocab()

_LANGS = ["en", "de", "zh"]

BASE_TS = dt.datetime(2026, 1, 1)


def _doc_words(rng: np.random.RandomState, n_words: int) -> list[str]:
    idx = rng.randint(0, len(_WORDS), size=n_words)
    return [_WORDS[i] for i in idx]


def _mutate(rng: np.random.RandomState, words: list[str], edit_frac: float) -> list[str]:
    """token-level edits: substitute ~edit_frac of tokens."""
    out = list(words)
    n_edit = max(1, int(len(out) * edit_frac))
    pos = rng.randint(0, len(out), size=n_edit)
    repl = rng.randint(0, len(_WORDS), size=n_edit)
    for p, r in zip(pos, repl):
        out[p] = _WORDS[r]
    return out


def generate_corpus(n_docs: int = 1000, seed: int = 42, n_sites: int = 50,
                    dup_frac: float = 0.3, boilerplate_clusters: int = 2):
    """Returns (documents, truth_clusters) as lists of tuples.

    documents: (url, warc_ts, html, text, lang)
    truth_clusters: (url, cluster_id) — only docs in planted clusters of
    size >= 2.
    """
    rng = np.random.RandomState(seed)
    docs: list[tuple] = []
    truth: list[tuple[str, str]] = []

    def emit(i: int, text: str):
        url = f"https://site{i % n_sites}.example/page/{i}"
        ts = BASE_TS + dt.timedelta(seconds=int(i) * 37)
        lang = _LANGS[0 if i % 20 < 16 else (1 if i % 20 < 19 else 2)]
        html = b"<html><body>" + text.encode() + b"</body></html>"
        docs.append((url, ts, html, text, lang))
        return url

    i = 0
    n_dup_docs = int(n_docs * dup_frac)
    # planted duplicate clusters (sizes 2-8): exact copies + near-dups
    while len(docs) < n_dup_docs:
        size = int(rng.randint(2, 9))
        base = _doc_words(rng, int(rng.randint(300, 1200)))
        cluster_id = f"cluster_{i}"
        for j_member in range(size):
            if len(docs) >= n_dup_docs:
                break
            if j_member == 0:
                words = base
            elif rng.rand() < 0.4:
                words = base  # exact copy
            else:
                # near-dup: 1-4% token edits (above threshold) — truncation
                words = _mutate(rng, base, edit_frac=float(rng.uniform(0.01, 0.04)))
                if rng.rand() < 0.2:
                    cut = int(len(words) * rng.uniform(0.95, 0.99))
                    words = words[:cut]
            url = emit(i, " ".join(words))
            truth.append((url, cluster_id))
            i += 1
    # boilerplate-heavy pages: 90% shared template (exercises hot buckets,
    # but pairwise est_sim stays *below* threshold)
    template = _doc_words(rng, 400)
    for _ in range(boilerplate_clusters):
        n_bp = int(rng.randint(10, 20))
        for _ in range(n_bp):
            unique = _doc_words(rng, 160)
            words = template[:360] + unique
            emit(i, " ".join(words))
            i += 1
    # unique base documents
    while i < n_docs:
        emit(i, " ".join(_doc_words(rng, int(rng.randint(300, 1200)))))
        i += 1

    return docs, truth


def corpus_dataframe(spark, n_docs: int = 1000, seed: int = 42):
    """(documents_df, truth_clusters_df) with the input_hint schema."""
    docs, truth = generate_corpus(n_docs, seed)
    docs_df = spark.createDataFrame(
        docs, schema="url string, warc_ts timestamp, html binary, text string, lang string")
    truth_df = spark.createDataFrame(truth, schema="url string, cluster_id string")
    return docs_df, truth_df

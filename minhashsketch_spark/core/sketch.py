"""Per-document MinHash sketches + the reference similarity estimator.

* ``gen_sig`` = the intended per-document semantics of ``genSig``
  (``/root/reference/src/MinhashSketch.cu:302-379``): for each of t hash
  functions, the m smallest *distinct* SpookyHash values over all k-mer
  windows, ascending, padded with UINT64_MAX (``src/MinhashSketch.cu:309``).
* ``compute_sim`` = the reference's non-standard estimator
  (``src/Hash.cu:65-86``): per function, a two-pointer intersection count of
  the two sorted m-lists (padding UINT64_MAX values match each other —
  quirk Q2), summed over t, divided by t*m.
* ``r_merge`` = the host merge (``src/MinhashSketch.cu:284-300``), exposed
  for associativity property tests and for distributed partial aggregation.
"""

from __future__ import annotations

import numpy as np

from . import rng as _rng
from . import spooky as _spooky
from .kmer import window_words

UINT64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def bottom_m_distinct(hashes: np.ndarray, m: int) -> np.ndarray:
    """m smallest distinct values, ascending, padded with UINT64_MAX."""
    u = np.unique(hashes)  # sorts + dedups (O8+O9+O11 in one call)
    out = np.full(m, UINT64_MAX, dtype=np.uint64)
    take = min(m, u.shape[0])
    out[:take] = u[:take]
    return out


def gen_sig(seq: bytes, k: int, m: int, t: int, seed: int | None = None,
            hashes_b: list[int] | None = None) -> np.ndarray:
    """(t, m) uint64 signature of one document, reference semantics."""
    if hashes_b is None:
        assert seed is not None
        hashes_b = _rng.generate_hashes_b(t, seed)
    words = window_words(seq, k)
    sig = np.empty((t, m), dtype=np.uint64)
    for j, b in enumerate(hashes_b):
        if len(words) == 1:
            h = _spooky.hash64_w1(words[0], b)
        else:
            h = _spooky.hash64_w2(words[0], words[1], b)
        sig[j] = bottom_m_distinct(h, m)
    return sig


def compute_sim_row(v1: np.ndarray, v2: np.ndarray) -> int:
    """Two-pointer match count on one sorted m-list pair (src/Hash.cu:65-78).

    Lists are distinct except for the UINT64_MAX padding tail, so the count
    is |set-intersection of real values| + min(#pad1, #pad2) (quirk Q2: the
    reference's two-pointer advances both pointers on equality, matching
    padding values pairwise until either list is exhausted — quirk Q6).
    """
    r1 = v1[v1 != UINT64_MAX]
    r2 = v2[v2 != UINT64_MAX]
    count = np.intersect1d(r1, r2, assume_unique=True).shape[0]
    count += min(v1.shape[0] - r1.shape[0], v2.shape[0] - r2.shape[0])
    return int(count)


def compute_sim(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Reference estimator (src/Hash.cu:80-86): sum of per-function match
    counts / (t*m)."""
    t, m = sig1.shape
    j = sum(compute_sim_row(sig1[h], sig2[h]) for h in range(t))
    return float(j) / float(t * m)


def compute_sim_two_pointer(v1: np.ndarray, v2: np.ndarray) -> int:
    """Literal transcription of the reference loop, for property tests."""
    i = j = count = 0
    while i < v1.shape[0] and j < v2.shape[0]:
        if v1[i] == v2[j]:
            count += 1
            i += 1
            j += 1
        elif v1[i] > v2[j]:
            j += 1
        else:
            i += 1
    return count


def r_merge(m: int, sketch: np.ndarray, output: np.ndarray) -> np.ndarray:
    """bottom-m of the union of two sorted distinct-ish m-lists
    (src/MinhashSketch.cu:284-300) — NumPy equivalent."""
    return bottom_m_distinct(np.concatenate([sketch, output]), m)

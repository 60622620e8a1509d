"""Vectorized k-mer window packing with reference parity.

Replicates the rolling 2-bit pack of ``BlockGetHashValues``
(``/root/reference/src/MinhashSketch.cu:48-103``) and the CPU ``getList``
(``src/main.cu:94-150``) without chunking: per *document* semantics (the
library API of ``README.md:169-181``), which genSig's chunk/overlap
machinery reconstructs for clean inputs.

Semantics replicated exactly:
* ``A,C,G,T -> 0..3``; any other char is *skipped but a hash is still
  emitted at that position* with the stale window (quirk Q4,
  ``src/MinhashSketch.cu:68-70``) — k<32 path only; the k>=32 paths of the
  reference disagree with each other on invalid chars (SURVEY.md Q5), so we
  require clean input there.
* one emission per position ``k-1 .. n-1`` (n-k+1 total).
"""

from __future__ import annotations

import numpy as np

# base2int lookup table (src/Utils.cu:5-18): A,C,G,T -> 0..3, else 255 (=invalid)
BASE_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    BASE_LUT[_b] = _i


def _rolling_pack(codes: np.ndarray, w: int, mod_bits: int) -> np.ndarray:
    """value after each push j (j=0..len-1) of a width-``w`` rolling 2-bit
    pack kept mod 2**mod_bits; leading zeros emulate the empty warm-up
    window (cur_seq starts at 0)."""
    n = codes.shape[0]
    out = np.zeros(n, dtype=np.uint64)
    c64 = codes.astype(np.uint64)
    for j in range(w):
        # term for the code pushed j steps before the current position
        shift = np.uint64(2 * j)
        if j == 0:
            out += c64
        else:
            out[j:] += c64[:-j] << shift
    if mod_bits < 64:
        out &= np.uint64((1 << mod_bits) - 1)
    return out


def window_words(seq: bytes, k: int) -> tuple[np.ndarray, ...]:
    """Packed window word(s) at every emit position ``k-1..n-1``.

    Returns a 1-tuple (k<32: one uint64 word) or 2-tuple (32<=k<64:
    ``cur_seq[0]``, ``cur_seq[1]``), matching the byte layout hashed by
    ``getHashValue`` (``src/MinhashSketch.cu:40-42``).
    """
    if not 1 <= k < 64:
        raise ValueError("k must be in [1, 64) (reference supports k//32+1 words; k>=64 untested there)")
    arr = np.frombuffer(seq, dtype=np.uint8)
    n = arr.shape[0]
    if n < k:
        raise ValueError("k cannot be greater than the size of any document (src/main.cu:221-224)")
    codes = BASE_LUT[arr]
    valid = codes != 255

    if k < 32:
        v = codes[valid]
        if v.shape[0] == 0:
            # all-invalid input: skip-but-emit hashes the never-updated
            # zero window at every position (src/MinhashSketch.cu:68-70)
            return (np.zeros(n - k + 1, dtype=np.uint64),)
        packs = _rolling_pack(v, k, 2 * k)  # value after each valid push
        # window value at original position i = value after the last push <= i
        cnt = np.cumsum(valid)  # pushes completed up to and including i
        idx = cnt[k - 1:] - 1
        words = np.where(idx >= 0, packs[np.maximum(idx, 0)], np.uint64(0))
        return (words.astype(np.uint64),)

    if not valid.all():
        raise ValueError(
            "k>=32 with non-ACGT characters: reference GPU/CPU paths diverge here (SURVEY.md Q5); refusing"
        )
    if k == 32:
        # reference shifts by (k%32)*2-2 == -2 (src/main.cu:139) — C++ UB
        raise ValueError("k=32 is undefined behavior in the reference (negative shift, src/main.cu:139)")
    r = k - 32  # = k % 32
    w32 = _rolling_pack(codes, 32, 64)   # 32-wide window ending at each push
    wr = _rolling_pack(codes, r, 2 * r)
    word1 = wr
    # cur_seq[0] = 32-window ending r pushes earlier
    word0 = np.zeros(n, dtype=np.uint64)
    word0[r:] = w32[:-r]
    return (word0[k - 1:], word1[k - 1:])

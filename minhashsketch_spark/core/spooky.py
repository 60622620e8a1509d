"""Vectorized SpookyHash V2 (Bob Jenkins, public domain) — the *Short* path
only, exactly as reachable from the reference's ``getHashValue``
(``/root/reference/src/MinhashSketch.cu:40-42``): messages are
``(k//32 + 1) * 8`` bytes, i.e. 8 bytes for k<32 and 16 bytes for
32<=k<64, always entering ``Short`` (length < 192,
``src/SpookyV2_d.cu:135-138``).

* length 8  → ``case 8`` fold + ``ShortEnd``        (``src/SpookyV2_d.cu:96-98,119``)
* length 16 → one ``ShortMix`` + case 0 + ``ShortEnd`` (``src/SpookyV2_d.cu:66-73,115-119``)

Both are branch-free for a fixed length, so they vectorize over NumPy
``uint64`` arrays (wrap-around add/xor/rot are exact uint64 semantics).
A scalar general Short path (any length < 192) is provided for webtext
shingles and property tests.
"""

from __future__ import annotations

import numpy as np

SC_CONST = np.uint64(0xDEADBEEFDEADBEEF)
_U64 = np.uint64


def _rot(x: np.ndarray, k: int) -> np.ndarray:
    k = _U64(k)
    return (x << k) | (x >> (_U64(64) - k))


def _short_mix(a, b, c, d):
    c = _rot(c, 50); c += d; a ^= c
    d = _rot(d, 52); d += a; b ^= d
    a = _rot(a, 30); a += b; c ^= a
    b = _rot(b, 41); b += c; d ^= b
    c = _rot(c, 54); c += d; a ^= c
    d = _rot(d, 48); d += a; b ^= d
    a = _rot(a, 38); a += b; c ^= a
    b = _rot(b, 37); b += c; d ^= b
    c = _rot(c, 62); c += d; a ^= c
    d = _rot(d, 34); d += a; b ^= d
    a = _rot(a, 5);  a += b; c ^= a
    b = _rot(b, 36); b += c; d ^= b
    return a, b, c, d


def _short_end(a, b, c, d):
    d ^= c; c = _rot(c, 15); d += c
    a ^= d; d = _rot(d, 52); a += d
    b ^= a; a = _rot(a, 26); b += a
    c ^= b; b = _rot(b, 51); c += b
    d ^= c; c = _rot(c, 28); d += c
    a ^= d; d = _rot(d, 9);  a += d
    b ^= a; a = _rot(a, 47); b += a
    c ^= b; b = _rot(b, 54); c += b
    d ^= c; c = _rot(c, 32); d += c
    a ^= d; d = _rot(d, 25); a += d
    b ^= a; a = _rot(a, 63); b += a
    return a, b, c, d


def hash64_w1(words: np.ndarray, seed: int) -> np.ndarray:
    """SpookyHash_d::Hash64 of an 8-byte message per element.

    ``words`` is a uint64 array, each element the little-endian 8-byte
    message (= ``cur_seq[0]`` of the reference's k<32 path).
    """
    words = np.ascontiguousarray(words, dtype=np.uint64)
    a = np.full_like(words, _U64(seed & 0xFFFFFFFFFFFFFFFF))
    b = a.copy()
    # remainder 8: d += length<<56 ; case 8: c += p64[0]
    c = words + SC_CONST
    d = np.full_like(words, SC_CONST + (_U64(8) << _U64(56)))
    a, b, c, d = _short_end(a, b, c, d)
    return a


def hash64_w2(w0: np.ndarray, w1: np.ndarray, seed: int) -> np.ndarray:
    """SpookyHash_d::Hash64 of a 16-byte message per element
    (words w0, w1 little-endian — the k in [32,64) path)."""
    w0 = np.ascontiguousarray(w0, dtype=np.uint64)
    w1 = np.ascontiguousarray(w1, dtype=np.uint64)
    a = np.full_like(w0, _U64(seed & 0xFFFFFFFFFFFFFFFF))
    b = a.copy()
    c = w0 + SC_CONST
    d = w1 + SC_CONST
    a, b, c, d = _short_mix(a, b, c, d)
    # remainder now 0: d += length<<56 ; case 0: c += const, d += const
    d += (_U64(16) << _U64(56)) + SC_CONST
    c = c + SC_CONST
    a, b, c, d = _short_end(a, b, c, d)
    return a


def hash64_bytes(message: bytes, seed: int) -> int:
    """Scalar general Short path (length < 192) — reference
    ``src/SpookyV2_d.cu:22-122``. Used for tests and odd-length shingles."""
    length = len(message)
    assert length < 192, "long path not implemented (never reached by reference)"
    u64 = lambda x: x & 0xFFFFFFFFFFFFFFFF

    def rot(x, k):
        return u64((x << k) | (x >> (64 - k)))

    remainder = length % 32
    a = seed & 0xFFFFFFFFFFFFFFFF
    b = a
    c = 0xDEADBEEFDEADBEEF
    d = 0xDEADBEEFDEADBEEF
    pos = 0

    def mix():
        nonlocal a, b, c, d
        c = rot(c, 50); c = u64(c + d); a ^= c
        d = rot(d, 52); d = u64(d + a); b ^= d
        a = rot(a, 30); a = u64(a + b); c ^= a
        b = rot(b, 41); b = u64(b + c); d ^= b
        c = rot(c, 54); c = u64(c + d); a ^= c
        d = rot(d, 48); d = u64(d + a); b ^= d
        a = rot(a, 38); a = u64(a + b); c ^= a
        b = rot(b, 37); b = u64(b + c); d ^= b
        c = rot(c, 62); c = u64(c + d); a ^= c
        d = rot(d, 34); d = u64(d + a); b ^= d
        a = rot(a, 5);  a = u64(a + b); c ^= a
        b = rot(b, 36); b = u64(b + c); d ^= b

    def rd64(p):
        return int.from_bytes(message[p:p + 8], "little")

    if length > 15:
        end = (length // 32) * 32
        while pos < end:
            c = u64(c + rd64(pos)); d = u64(d + rd64(pos + 8))
            mix()
            a = u64(a + rd64(pos + 16)); b = u64(b + rd64(pos + 24))
            pos += 32
        if remainder >= 16:
            c = u64(c + rd64(pos)); d = u64(d + rd64(pos + 8))
            mix()
            pos += 16
            remainder -= 16

    d = u64(d + (length << 56))
    m = message
    if remainder == 0:
        c = u64(c + 0xDEADBEEFDEADBEEF)
        d = u64(d + 0xDEADBEEFDEADBEEF)
    else:
        if remainder >= 12:
            if remainder == 15: d = u64(d + (m[pos + 14] << 48))
            if remainder >= 14: d = u64(d + (m[pos + 13] << 40))
            if remainder >= 13: d = u64(d + (m[pos + 12] << 32))
            d = u64(d + int.from_bytes(m[pos + 8:pos + 12], "little"))
            c = u64(c + rd64(pos))
        elif remainder >= 8:
            if remainder == 11: d = u64(d + (m[pos + 10] << 16))
            if remainder >= 10: d = u64(d + (m[pos + 9] << 8))
            if remainder >= 9:  d = u64(d + m[pos + 8])
            c = u64(c + rd64(pos))
        elif remainder >= 4:
            if remainder == 7: c = u64(c + (m[pos + 6] << 48))
            if remainder >= 6: c = u64(c + (m[pos + 5] << 40))
            if remainder >= 5: c = u64(c + (m[pos + 4] << 32))
            c = u64(c + int.from_bytes(m[pos:pos + 4], "little"))
        else:
            if remainder == 3: c = u64(c + (m[pos + 2] << 16))
            if remainder >= 2: c = u64(c + (m[pos + 1] << 8))
            if remainder >= 1: c = u64(c + m[pos])

    # ShortEnd
    d ^= c; c = rot(c, 15); d = u64(d + c)
    a ^= d; d = rot(d, 52); a = u64(a + d)
    b ^= a; a = rot(a, 26); b = u64(b + a)
    c ^= b; b = rot(b, 51); c = u64(c + b)
    d ^= c; c = rot(c, 28); d = u64(d + c)
    a ^= d; d = rot(d, 9);  a = u64(a + d)
    b ^= a; a = rot(a, 47); b = u64(b + a)
    c ^= b; b = rot(b, 54); c = u64(c + b)
    d ^= c; c = rot(c, 32); d = u64(d + c)
    a ^= d; d = rot(d, 25); a = u64(a + d)
    b ^= a; a = rot(a, 63); b = u64(b + a)
    return a

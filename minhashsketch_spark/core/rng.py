"""Deterministic RNG with bit-for-bit parity to the reference's hash-family
generation (``/root/reference/src/Hash.cu:39-63``, ``src/Hash.h:30-38``).

The reference seeds ``std::mt19937`` and draws via libstdc++'s
``std::uniform_int_distribution``.  ``mt19937`` is pinned by the C++
standard; the *distribution* is implementation-defined, so this module
vendors libstdc++'s exact down-/up-scaling algorithm
(bits/uniform_int_dist.h) for a 32-bit URBG whose ``result_type`` is the
64-bit ``uint_fast32_t`` (x86-64 Linux ABI — the platform that produced the
published transcript ``git_picture/running_example1.png``).

Everything here is plain Python integers: only O(t) draws happen per
pipeline run, on the driver, and the resulting (a, b) tables are broadcast.
"""

from __future__ import annotations

INT_MAX = 2**31 - 1
U32 = 0xFFFFFFFF
U64 = 0xFFFFFFFFFFFFFFFF

#: hardcoded prime of the reference: 3 * 2**62 + 17
#: (``src/Hash.h:32``, ``src/Hash.cu:53``)
MERSENNE_P = 13835058055282163729


class MT19937:
    """std::mt19937 (32-bit Mersenne Twister), C++11 seeding semantics."""

    N = 624
    M = 397
    MATRIX_A = 0x9908B0DF
    UPPER_MASK = 0x80000000
    LOWER_MASK = 0x7FFFFFFF

    def __init__(self, seed: int) -> None:
        mt = [0] * self.N
        mt[0] = seed & U32
        for i in range(1, self.N):
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) & U32
        self.mt = mt
        self.mti = self.N

    def __call__(self) -> int:
        mt = self.mt
        if self.mti >= self.N:
            for i in range(self.N):
                y = (mt[i] & self.UPPER_MASK) | (mt[(i + 1) % self.N] & self.LOWER_MASK)
                mt[i] = mt[(i + self.M) % self.N] ^ (y >> 1) ^ (self.MATRIX_A if y & 1 else 0)
            self.mti = 0
        y = mt[self.mti]
        self.mti += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & U32


def uniform_int(rng: MT19937, lo: int, hi: int, lemire: bool = False) -> int:
    """libstdc++ ``uniform_int_distribution<T>{lo, hi}(rng)`` for a 32-bit
    mt19937 whose common type with T is 64-bit (T = int or uint64 on LP64).

    Two libstdc++ generations are supported:
    * ``lemire=False`` — the pre-GCC-10 two-division rejection downscale
      (the generation that produced the reference's 2018 published
      transcript ``git_picture/running_example1.png``).
    * ``lemire=True`` — GCC >= 10's nearly-divisionless Lemire downscale
      (bits/uniform_int_dist.h ``_S_nd``), verified against g++ 12 here.
    The upscaling branch (urange > 2**32-1) is identical in both; only the
    nested downscale call differs.
    """
    urngrange = U32  # rng.max() - rng.min()
    urange = hi - lo
    if urngrange > urange:
        uerange = urange + 1
        if lemire:
            # _S_nd<uint64>(urng, uerange): product = g()*range in 64 bits
            product = rng() * uerange
            low = product & 0xFFFFFFFF
            if low < uerange:
                threshold = (2**32 - uerange) % uerange
                while low < threshold:
                    product = rng() * uerange
                    low = product & 0xFFFFFFFF
            ret = product >> 32
        else:
            scaling = urngrange // uerange
            past = uerange * scaling
            while True:
                ret = rng()
                if ret < past:
                    break
            ret //= scaling
    elif urngrange < urange:
        # upscaling: recursive high-word draw * 2**32 + low word
        uerngrange = urngrange + 1
        while True:
            tmp = (uerngrange * uniform_int(rng, 0, urange // uerngrange, lemire)) & U64
            ret = (tmp + rng()) & U64
            if not (ret > urange or ret < tmp):
                break
    else:
        ret = rng()
    return ret + lo


def generate_hashes_b(t: int, seed: int, lemire: bool = True) -> list[int]:
    """Spooky per-function seeds — parity with ``generateHashes_b``
    (``src/Hash.cu:49-63``): outer mt19937(seed) draws an int seed per
    function; an inner mt19937(seed_h) draws b in [0, p-1].

    Default ``lemire=True`` is bit-for-bit identical to the reference's own
    ``Hash.cu`` compiled with this environment's toolchain (g++ 12) —
    verified in tests/test_parity.py against tests/goldens_refcompiled.json.
    """
    rng = MT19937(seed)
    out = []
    for _ in range(t):
        seed_h = uniform_int(rng, 0, INT_MAX, lemire)
        rng_h = MT19937(seed_h)
        out.append(uniform_int(rng_h, 0, MERSENNE_P - 1, lemire))
    return out


def generate_hashes_ab(t: int, seed: int, lemire: bool = True) -> list[tuple[int, int]]:
    """(a, b) pairs of the k-independent family h(x) = (a*x + b) mod p —
    parity with ``generateHashes`` + ``Hash::Hash`` (``src/Hash.cu:39-47``,
    ``src/Hash.h:30-38``): a in [1, p-1] then b in [0, p-1] from the same
    inner mt19937.
    """
    rng = MT19937(seed)
    out = []
    for _ in range(t):
        seed_i = uniform_int(rng, 0, INT_MAX, lemire)
        rng_i = MT19937(seed_i)
        a = uniform_int(rng_i, 1, MERSENNE_P - 1, lemire)
        b = uniform_int(rng_i, 0, MERSENNE_P - 1, lemire)
        out.append((a, b))
    return out

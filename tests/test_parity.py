"""Bit-for-bit parity suite vs the reference compiled from its own sources.

Oracle: tests/goldens_refcompiled.json, produced by tests/golden_gen/ which
links the REFERENCE'S OWN Hash.cu + SpookyV2.cu (see golden_gen/README.md).
"""

import json
import os

import numpy as np
import pytest

from minhashsketch_spark.core import (
    MT19937,
    UINT64_MAX,
    bottom_m_distinct,
    compute_sim,
    fasta_to_string,
    gen_sig,
    generate_hashes_b,
    r_merge,
)
from minhashsketch_spark.core.rng import INT_MAX, MERSENNE_P, uniform_int
from minhashsketch_spark.core import spooky
from minhashsketch_spark.core.sketch import compute_sim_row, compute_sim_two_pointer

HERE = os.path.dirname(__file__)
GOLD = json.load(open(os.path.join(HERE, "goldens_refcompiled.json")))
CLIPS = "/root/reference/testing_files"


def _clip(n):
    _, seq = fasta_to_string(f"{CLIPS}/sequence_clip{n}.fasta")
    return seq


def test_mt19937_standard_vector():
    # C++ standard: the 10000th consecutive invocation of mt19937(5489)
    r = MT19937(5489)
    for _ in range(9999):
        r()
    assert r() == 4123659995


def test_hashes_b_parity():
    assert generate_hashes_b(10, 123) == GOLD["hashes_b_t10_s123"]
    assert generate_hashes_b(5, 540484695) == GOLD["hashes_b_t5_s540484695"]


def test_spooky_8byte_vs_reference():
    # goldens printed by tests/golden_gen (reference SpookyV2.cu)
    cases = [
        (81985529216486895, 0, 12240691328683257384),
        (81985529216486895, 1, 1265416581860892343),
        (0, 0, 16597512551923142582),
        (18446744073709551615, 0, 16347819065341748644),
        (42, 4415557262054654361, 1617690155677581808),
    ]
    for msg, seed, want in cases:
        got = int(spooky.hash64_w1(np.array([msg], dtype=np.uint64), seed)[0])
        assert got == want
        assert spooky.hash64_bytes(int(msg).to_bytes(8, "little"), seed) == want


def test_spooky_16byte_vs_reference():
    cases = [
        (81985529216486895, 18364758544493064720, 0, 18093421753061472907),
        (81985529216486895, 18364758544493064720, 4415557262054654361, 17615213624569645964),
    ]
    for w0, w1, seed, want in cases:
        got = int(spooky.hash64_w2(np.array([w0], dtype=np.uint64),
                                   np.array([w1], dtype=np.uint64), seed)[0])
        assert got == want


def test_clip_lengths():
    assert [len(_clip(1)), len(_clip(2)), len(_clip(3))] == GOLD["clip_lens"]


@pytest.mark.parametrize("n,key", [(1, "sig_clip1_k5"), (2, "sig_clip2_k5"), (3, "sig_clip3_k5")])
def test_signatures_k5(n, key):
    bs = generate_hashes_b(10, 123)
    sig = gen_sig(_clip(n).encode(), 5, 10, 10, hashes_b=bs)
    assert sig.tolist() == GOLD[key]


@pytest.mark.parametrize("n,key", [(1, "sig_clip1_k31"), (2, "sig_clip2_k31")])
def test_signatures_k31(n, key):
    bs = generate_hashes_b(5, 540484695)
    sig = gen_sig(_clip(n).encode(), 31, 9, 5, hashes_b=bs)
    assert sig.tolist() == GOLD[key]


def test_similarities_vs_reference_computeSim():
    bs = generate_hashes_b(10, 123)
    s1 = gen_sig(_clip(1).encode(), 5, 10, 10, hashes_b=bs)
    s2 = gen_sig(_clip(2).encode(), 5, 10, 10, hashes_b=bs)
    s3 = gen_sig(_clip(3).encode(), 5, 10, 10, hashes_b=bs)
    assert compute_sim(s1, s2) == GOLD["sim_clip12_k5"]
    assert compute_sim(s1, s3) == GOLD["sim_clip13_k5"]
    assert compute_sim(s1, s1) == GOLD["sim_clip11_k5"]
    bs31 = generate_hashes_b(5, 540484695)
    t1 = gen_sig(_clip(1).encode(), 31, 9, 5, hashes_b=bs31)
    t2 = gen_sig(_clip(2).encode(), 31, 9, 5, hashes_b=bs31)
    assert compute_sim(t1, t2) == GOLD["sim_clip12_k31"]


def test_padding_quirk_q2():
    # tiny doc with < m distinct k-mers: UINT64_MAX padding matches itself
    bs = generate_hashes_b(10, 123)
    sig = gen_sig(b"ACGTACGTAC", 5, 10, 10, hashes_b=bs)
    assert sig.tolist() == GOLD["sig_tiny_k5"]
    assert compute_sim(sig, sig) == GOLD["sim_tiny_self"] == 1.0
    # padding really is present
    assert any(UINT64_MAX in row for row in sig)


def test_skip_but_emit_quirk_q4():
    # non-ACGT chars: window not updated but a hash IS emitted (stale window)
    bs = generate_hashes_b(2, 7)
    clean = b"ACGTACGTTGCA"
    dirty = b"ACGTACGNTTGCA"  # N at index 7
    sig_clean = gen_sig(clean, 5, 20, 2, hashes_b=bs)
    sig_dirty = gen_sig(dirty, 5, 20, 2, hashes_b=bs)
    # dirty doc re-emits the stale window at the N position: its distinct
    # hash SET equals the clean doc's plus possibly different windows at the
    # boundary. Check against a literal scalar transcription instead:
    from minhashsketch_spark.core.kmer import BASE_LUT

    def scalar_windows(seq, k):
        cur = 0
        out = []
        for i, ch in enumerate(seq):
            c = BASE_LUT[ch]
            if c != 255:
                cur = ((cur << 2) % (1 << (2 * k))) + int(c)
            if i >= k - 1:
                out.append(cur)
        return out

    for seq, sig in [(clean, sig_clean), (dirty, sig_dirty)]:
        ws = scalar_windows(seq, 5)
        h = np.array([spooky.hash64_bytes(w.to_bytes(8, "little"), bs[0]) for w in ws],
                     dtype=np.uint64)
        assert sig[0].tolist() == bottom_m_distinct(h, 20).tolist()


def test_kmer_k_ge_32_matches_scalar_transcription():
    # vectorized two-word path vs literal CPU getList loop (src/main.cu:125-147)
    rng = np.random.RandomState(3)
    seq = bytes(rng.choice(list(b"ACGT"), 500).astype(np.uint8))
    k = 33
    from minhashsketch_spark.core.kmer import window_words

    w0, w1 = window_words(seq, k)

    cur = [0, 0]
    outs = []
    for i, ch in enumerate(seq):
        c = {65: 0, 67: 1, 71: 2, 84: 3}[ch]
        if i < k:
            cur[i // 32] = ((cur[i // 32] << 2) % (2**64 - 1) + c) & 0xFFFFFFFFFFFFFFFF
            if i == k - 1:
                outs.append(tuple(cur))
        else:
            cur[0] = ((cur[0] << 2) + (cur[1] >> ((k % 32) * 2 - 2))) & 0xFFFFFFFFFFFFFFFF
            cur[1] = ((cur[1] << 2) % (1 << (2 * (k % 32)))) + c
            outs.append(tuple(cur))
    assert [(int(a), int(b)) for a, b in zip(w0, w1)] == outs


def test_compute_sim_row_equals_two_pointer():
    rng = np.random.RandomState(0)
    for _ in range(200):
        m = rng.randint(1, 12)
        n1 = rng.randint(0, m + 1)
        n2 = rng.randint(0, m + 1)
        pool = np.unique(rng.randint(0, 30, size=20).astype(np.uint64))
        v1 = np.sort(rng.choice(pool, size=min(n1, len(pool)), replace=False))
        v2 = np.sort(rng.choice(pool, size=min(n2, len(pool)), replace=False))
        v1 = np.concatenate([v1, np.full(m - len(v1), UINT64_MAX, dtype=np.uint64)])
        v2 = np.concatenate([v2, np.full(m - len(v2), UINT64_MAX, dtype=np.uint64)])
        assert compute_sim_row(v1, v2) == compute_sim_two_pointer(v1, v2)


def test_merge_associativity():
    # bottom-m(union) == fold of pairwise rMerge (src/MinhashSketch.cu:284-300)
    rng = np.random.RandomState(1)
    m = 8
    lists = [bottom_m_distinct(rng.randint(0, 2**40, size=30).astype(np.uint64), m)
             for _ in range(5)]
    folded = lists[0]
    for nxt in lists[1:]:
        folded = r_merge(m, nxt, folded)
    assert folded.tolist() == bottom_m_distinct(np.concatenate(lists), m).tolist()


def test_k_validation():
    with pytest.raises(ValueError):
        gen_sig(b"ACG", 5, 4, 1, seed=1)  # k > doc length (src/main.cu:221-224)
    with pytest.raises(ValueError):
        gen_sig(b"A" * 100, 32, 4, 1, seed=1)  # k=32 UB in reference

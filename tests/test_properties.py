"""Property-based tests (hypothesis) for the core kernels — FIXTURES.md F4."""

import numpy as np
from hypothesis import given, settings, strategies as st

from minhashsketch_spark.core import (
    UINT64_MAX,
    bottom_m_distinct,
    compute_sim,
    gen_sig,
    r_merge,
)
from minhashsketch_spark.core.shingles import (
    distinct_shingles,
    exact_jaccard,
    get_family,
    minhash_matrix,
    shingle_hashes,
)
from minhashsketch_spark.core.sketch import compute_sim_row, compute_sim_two_pointer

dna = st.text(alphabet="ACGT", min_size=6, max_size=200)
dirty_dna = st.text(alphabet="ACGTN x", min_size=6, max_size=200)


@given(dna, st.integers(1, 8), st.integers(1, 6))
@settings(max_examples=50, deadline=None)
def test_self_similarity_is_one(seq, m, t):
    sig = gen_sig(seq.encode(), 5, m, t, seed=99)
    assert compute_sim(sig, sig) == 1.0


@given(dirty_dna, st.integers(2, 12))
@settings(max_examples=50, deadline=None)
def test_sig_rows_sorted_distinct_padded(seq, m):
    sig = gen_sig(seq.encode(), 5, m, 3, seed=5)
    for row in sig:
        real = row[row != UINT64_MAX]
        assert np.all(np.diff(real.astype(object)) > 0)  # strictly ascending
        pad_start = real.shape[0]
        assert np.all(row[pad_start:] == UINT64_MAX)


@given(st.lists(st.lists(st.integers(0, 2**50), min_size=0, max_size=40),
                min_size=2, max_size=6),
       st.integers(1, 10))
@settings(max_examples=50, deadline=None)
def test_merge_associativity(lists, m):
    sketches = [bottom_m_distinct(np.array(l or [0], dtype=np.uint64), m) for l in lists]
    folded = sketches[0]
    for s in sketches[1:]:
        folded = r_merge(m, s, folded)
    union = bottom_m_distinct(np.concatenate(sketches), m)
    assert folded.tolist() == union.tolist()


@given(st.lists(st.integers(0, 60), min_size=0, max_size=10, unique=True),
       st.lists(st.integers(0, 60), min_size=0, max_size=10, unique=True),
       st.integers(0, 4), st.integers(0, 4))
@settings(max_examples=200, deadline=None)
def test_sim_row_equals_literal_two_pointer(a, b, pad_a, pad_b):
    v1 = np.concatenate([np.sort(np.array(a, dtype=np.uint64)),
                         np.full(pad_a, UINT64_MAX, dtype=np.uint64)])
    v2 = np.concatenate([np.sort(np.array(b, dtype=np.uint64)),
                         np.full(pad_b, UINT64_MAX, dtype=np.uint64)])
    assert compute_sim_row(v1, v2) == compute_sim_two_pointer(v1, v2)


text = st.text(min_size=0, max_size=300)


@given(text)
@settings(max_examples=80, deadline=None)
def test_shingle_count(s):
    bs = s.encode("utf-8", "surrogatepass")
    hs = shingle_hashes(bs, 9)
    assert hs.shape[0] == max(0, len(bs) - 8)


@given(text, text)
@settings(max_examples=50, deadline=None)
def test_minhash_estimates_jaccard_direction(s1, s2):
    """identical texts -> identical signatures; jaccard bounds hold"""
    a_par, b_par = get_family(16, 3)
    x1 = distinct_shingles(s1.encode("utf-8", "surrogatepass"), 4)
    x2 = distinct_shingles(s2.encode("utf-8", "surrogatepass"), 4)
    m1 = minhash_matrix(x1, a_par, b_par)
    m2 = minhash_matrix(x2, a_par, b_par)
    j = exact_jaccard(x1, x2)
    if s1 == s2:
        assert np.array_equal(m1, m2)
        assert j == 1.0
    if j == 1.0 and x1.shape[0] > 0:
        assert np.array_equal(m1, m2)
    assert 0.0 <= j <= 1.0


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30),
                min_size=1, max_size=5))
@settings(max_examples=30, deadline=None)
def test_minhash_doc_order_invariance(texts):
    """signatures are per-doc: corpus order never changes them"""
    a_par, b_par = get_family(8, 11)
    sigs1 = [minhash_matrix(distinct_shingles(t.encode(), 3), a_par, b_par) for t in texts]
    sigs2 = [minhash_matrix(distinct_shingles(t.encode(), 3), a_par, b_par)
             for t in reversed(texts)]
    for s1, s2 in zip(sigs1, reversed(sigs2)):
        assert np.array_equal(s1, s2)


def test_native_minhash_equals_numpy():
    import os

    from minhashsketch_spark.core import _native

    rng = np.random.RandomState(9)
    a_par, b_par = get_family(64, 21)
    for n in (0, 1, 7, 1000):
        xs = np.unique(rng.randint(0, 2**63, size=max(n, 1)).astype(np.uint64))[:n]
        os.environ["MHS_DISABLE_NATIVE"] = "1"
        _native._tried = False
        _native._lib = None
        ref = minhash_matrix(xs, a_par, b_par)
        del os.environ["MHS_DISABLE_NATIVE"]
        _native._tried = False
        _native._lib = None
        got = minhash_matrix(xs, a_par, b_par)
        assert np.array_equal(ref, got)


def test_gram_hashes_equals_shingle_hashes():
    """O(n) prefix-hash formulation (invertible multiplier mod 2**64) is
    value-identical to the per-length rolling loop for every (n, L)."""
    from minhashsketch_spark.core.shingles import gram_hashes, shingle_hashes

    rng = np.random.RandomState(3)
    for n in (0, 1, 2, 9, 63, 300, 1500):
        b = bytes(rng.randint(0, 256, n, dtype=np.uint8).tobytes())
        for L in (1, 2, 8, 9, 64, 299, 300, 301):
            assert np.array_equal(shingle_hashes(b, L), gram_hashes(b, L)), (n, L)


def test_plan_bands_layouts():
    from minhashsketch_spark.config import plan_bands

    # the flagship config's own layout: 128 fns at 0.7 -> 32x4 passes 0.99
    b, r = plan_bands(128, 0.7)
    assert b * r == 128
    assert 1.0 - (1.0 - 0.7 ** r) ** b >= 0.99
    assert r >= 4  # 32x4 recall at 0.7 is ~0.9996; planner must not undershoot
    # high threshold affords deeper rows (more selective bands)
    b2, r2 = plan_bands(128, 0.9)
    assert b2 * r2 == 128 and r2 >= r
    # r=1 fallback when nothing else meets recall
    assert plan_bands(4, 0.05) == (4, 1)


def test_merge_sketches_equals_r_merge_fold():
    """The vectorized corpus-sketch merge must equal the reference's rMerge
    fold row-by-row for arbitrary inputs (padding, dups, order)."""
    import numpy as np

    from minhashsketch_spark.core.sketch import UINT64_MAX, r_merge
    from minhashsketch_spark.operators.corpus_sketch import merge_sketches

    rng = np.random.default_rng(5)
    t, m, n_mats = 7, 4, 5
    for trial in range(20):
        mats = []
        for _ in range(n_mats):
            vals = rng.integers(0, 12, size=(t, m * 3)).astype(np.uint64)
            mat = np.sort(vals, axis=1)[:, :m]  # sorted rows, dups likely
            pad = rng.random((t, m)) < 0.3
            mat[pad] = UINT64_MAX
            mats.append(np.sort(mat, axis=1))
        got = merge_sketches([m_.copy() for m_ in mats], m)
        want = np.full((t, m), UINT64_MAX, dtype=np.uint64)
        for mat in mats:
            for j in range(t):
                want[j] = r_merge(m, mat[j], want[j])
        assert np.array_equal(got, want), trial

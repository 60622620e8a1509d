"""Exact-substring duplicate pass: winnowing guarantee + LCS verification."""

import numpy as np

from minhashsketch_spark.operators.substring import _lcs_len, substring_dup_pairs


def test_lcs_len_exact():
    assert _lcs_len(b"hello world foo", b"xx world fyy") == len(" world f")
    assert _lcs_len(b"abc", b"xyz") == 0
    assert _lcs_len(b"same string", b"same string") == len("same string")
    assert _lcs_len(b"", b"anything") == 0
    rng = np.random.RandomState(0)
    base = bytes(rng.randint(97, 123, size=500).astype(np.uint8))
    a = bytes(rng.randint(97, 123, size=100).astype(np.uint8)) + base[100:300]
    b = base[100:300] + bytes(rng.randint(97, 123, size=80).astype(np.uint8))
    assert _lcs_len(a, b) >= 200  # shared 200-byte block


def test_substring_dup_pairs(spark):
    rng = np.random.RandomState(7)

    def rnd(n):
        return "".join(chr(c) for c in rng.randint(97, 123, size=n))

    shared = rnd(300)
    rows = [
        ("u1", rnd(200) + shared + rnd(100)),   # contains shared
        ("u2", shared + rnd(250)),              # contains shared
        ("u3", rnd(600)),                       # unrelated
        ("u4", rnd(50)),                        # short unrelated
    ]
    docs = spark.createDataFrame(rows, schema="url string, text string")
    out = substring_dup_pairs(docs, k=8, w=16, min_shared=2, min_lcs=200)
    got = {(r["url_a"], r["url_b"]): r for r in out.collect()}
    assert ("u1", "u2") in got
    r = got[("u1", "u2")]
    assert r["lcs_len"] >= 300
    assert r["is_substring_dup"]
    for pair, row in got.items():
        if pair != ("u1", "u2"):
            assert not row["is_substring_dup"], (pair, row)

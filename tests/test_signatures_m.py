"""General-m (bottom-m sketch) distributed path: bit-parity of the Spark
signature/estimator stages vs the local NumPy kernel (the reference's
published run is m=9/t=5 — m>1 is the shape that matters for parity)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.core.shingles import bottom_m_matrix, distinct_shingles, get_family
from minhashsketch_spark.core.sketch import compute_sim
from minhashsketch_spark.operators.lsh import candidate_pairs
from minhashsketch_spark.operators.signatures import compute_signatures_m
from minhashsketch_spark.operators.verify import minhash_estimate_m

CFG = PipelineConfig(k=9, m=4, t=16, bands=8, rows=2, seed=7, threshold=0.5)


@pytest.fixture(scope="module")
def docs(spark):
    from minhashsketch_spark.sources.corpus import generate_corpus

    rows, _ = generate_corpus(n_docs=200, seed=31)
    return spark.createDataFrame(
        [(r[0], r[3]) for r in rows], schema="url string, text string")


def test_spark_m4_signatures_bit_for_bit(spark, docs):
    got = {r["url"]: (r["n_shingles"], np.asarray(r["sig"], dtype=np.int64).view(np.uint64))
           for r in compute_signatures_m(docs, CFG).collect()}
    a, b = get_family(CFG.t, CFG.seed)
    for row in docs.collect():
        xs = distinct_shingles(row["text"].encode("utf-8", "surrogatepass"), CFG.k)
        want = bottom_m_matrix(xs, a, b, CFG.m).reshape(-1)
        n, sig = got[row["url"]]
        assert n == xs.shape[0]
        assert np.array_equal(sig, want), row["url"]


def test_spark_m4_estimator_matches_core_compute_sim(spark, docs):
    sigs = compute_signatures_m(docs, CFG).persist()
    pairs = candidate_pairs(sigs, CFG)
    est = {(r["url_a"], r["url_b"]): r["est_sim"]
           for r in minhash_estimate_m(pairs, sigs, CFG).collect()}
    assert len(est) > 0  # the corpus plants duplicate clusters
    local = {r["url"]: np.asarray(r["sig"], dtype=np.int64).view(np.uint64).reshape(CFG.t, CFG.m)
             for r in sigs.collect()}
    for (ua, ub), e in est.items():
        assert e == compute_sim(local[ua], local[ub]), (ua, ub)


def test_m4_bands_group_identical_sketches(spark, docs):
    """Exact duplicates must always be candidates under the m>1 banding."""
    sigs = compute_signatures_m(docs, CFG).persist()
    dup_urls = [r["u"] for r in
                docs.groupBy("text").agg(F.collect_list("url").alias("us"))
                .filter(F.size("us") >= 2).select(F.explode("us").alias("u")).collect()]
    if not dup_urls:
        pytest.skip("corpus has no exact dups at this size")
    cand = {(r["url_a"], r["url_b"]) for r in candidate_pairs(sigs, CFG).collect()}
    texts = {r["url"]: r["text"] for r in docs.collect()}
    for i, ua in enumerate(dup_urls):
        for ub in dup_urls[i + 1:]:
            if texts[ua] == texts[ub]:
                assert (min(ua, ub), max(ua, ub)) in cand


def test_compute_signatures_keep_text_passthrough(spark):
    """keep_text=True must append the exact input text as a trailing
    column while leaving every signature column identical to the
    keep_text=False output (the Arrow passthrough replaces the index
    build's sigs-join-texts shuffle, so byte identity is the contract)."""
    from pyspark.sql import functions as F

    from minhashsketch_spark.config import PipelineConfig
    from minhashsketch_spark.operators.signatures import compute_signatures

    cfg = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=7, threshold=0.7)
    docs = spark.createDataFrame(
        [("u1", "some text body"), ("u2", ""), ("u3", None),
         ("u4", "ünïcode € text"), ("u5", "x" * 2000)],
        "url string, text string")
    plain = {r["url"]: r for r in compute_signatures(docs, cfg).collect()}
    kept = {r["url"]: r for r in
            compute_signatures(docs, cfg, keep_text=True).collect()}
    texts = {r["url"]: r["text"] for r in docs.collect()}
    assert set(kept) == set(plain) == set(texts)
    for u in plain:
        for c in ("n_shingles", "sig", "bands", "sig_key"):
            assert kept[u][c] == plain[u][c], (u, c)
        assert kept[u]["text"] == texts[u], u

"""Embedding similarity search: LSH near-dup recall vs brute force on a
planted corpus, and salting/cap behavior on hot buckets."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from minhashsketch_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
)

DIM = 64


def _planted_embeddings(spark, n_base=200, n_dups=60, noise=0.08, seed=11):
    """Random unit-ish vectors plus planted near-dups (base + small noise:
    cosine ~0.97). Returns (df, truth_pairs set at cosine >= 0.9)."""
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_base, DIM))
    dup_src = rng.randint(0, n_base, size=n_dups)
    dups = base[dup_src] + noise * rng.standard_normal((n_dups, DIM))
    vecs = np.vstack([base, dups])
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, schema="vec_id bigint, embedding array<double>")

    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    iu = np.triu_indices(len(vecs), 1)
    truth = {(int(a), int(b)) for a, b in zip(*iu) if sims[a, b] >= 0.9}
    assert len(truth) >= n_dups  # the plant worked
    return df, truth


def test_embedding_near_dup_recall_vs_brute_force(spark):
    df, truth = _planted_embeddings(spark)
    found = embedding_near_dup_pairs(df, threshold=0.9, n_tables=16,
                                     n_planes=4, dim=DIM)
    got = {(r["id_a"], r["id_b"]) for r in found.collect()}
    # no false positives possible (exact cosine filter) ...
    assert got <= truth
    # ... and multi-table LSH recall is high
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"recall {recall} over {len(truth)} truth pairs"


def test_embedding_near_dup_hot_bucket_cap_keeps_identical_vectors(spark):
    """A pile of identical vectors forms one mega-bucket in every table;
    salting must keep every identical pair reachable (chain links)."""
    rng = np.random.RandomState(3)
    v = rng.standard_normal(DIM)
    rows = [(i, [float(x) for x in v]) for i in range(40)]
    rows += [(100 + i, [float(x) for x in rng.standard_normal(DIM)]) for i in range(20)]
    df = spark.createDataFrame(rows, schema="vec_id bigint, embedding array<double>")
    found = embedding_near_dup_pairs(df, threshold=0.999, n_tables=8,
                                     n_planes=4, dim=DIM, bucket_cap=8)
    got = {(r["id_a"], r["id_b"]) for r in found.collect()}
    # chain links guarantee the identical group stays *connected* (union-find
    # recovers the full cluster), even though salting splits the mega-bucket
    ids = sorted({i for p in got for i in p if i < 100})
    assert ids == list(range(40))
    parent = {i: i for i in range(40)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        if a < 100 and b < 100:
            parent[find(a)] = find(b)
    assert len({find(i) for i in range(40)}) == 1


def test_lsh_topk_recall_vs_brute_force(spark):
    """Multi-probe hyperplane LSH top-k must find the planted near-dup as
    the top-1 neighbor for (almost) every duplicated query vector."""
    from minhashsketch_spark.operators.similarity import lsh_cosine_topk

    df, _ = _planted_embeddings(spark, n_base=150, n_dups=40, seed=13)
    brute = cosine_topk(df, df.filter(F.col("vec_id") >= 150).select(
        F.col("vec_id").alias("query_id"), "embedding"), k=1)
    approx = lsh_cosine_topk(df, df.filter(F.col("vec_id") >= 150).select(
        F.col("vec_id").alias("query_id"), "embedding"), k=1, dim=DIM)
    want = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.9, f"top-1 recall {recall}"


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF (spherical k-means + nprobe cells) must find the planted
    near-dup as top-1 for (almost) every duplicated query vector."""
    from minhashsketch_spark.operators.similarity import ivf_cosine_topk

    df, _ = _planted_embeddings(spark, n_base=150, n_dups=40, seed=17)
    qs = df.filter(F.col("vec_id") >= 150).select(
        F.col("vec_id").alias("query_id"), "embedding")
    brute = cosine_topk(df, qs, k=1)
    approx = ivf_cosine_topk(df, qs, k=1, n_centroids=8, nprobe=3)
    want = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.9, f"IVF top-1 recall {recall}"


def test_ensure_parallelism_guard(spark):
    from minhashsketch_spark.partitioning import ensure_parallelism

    # single-row-group parquet scan -> one partition -> guard widens it
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    assert docs.rdd.getNumPartitions() == 1
    up = ensure_parallelism(docs, 8)
    assert up.rdd.getNumPartitions() == 8
    assert up.count() == docs.count()
    # identity on plans that made their own partitioning decision
    wide = spark.range(100).repartition(16)
    assert ensure_parallelism(wide, 8) is wide
    cached = spark.range(100).cache()
    assert ensure_parallelism(cached, 999) is cached


def test_cosine_topk_matches_numpy(spark):
    df, _ = _planted_embeddings(spark, n_base=50, n_dups=10)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(df, queries, k=5).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    for qid in range(3):
        q = vecs[qid]
        scored = sorted(
            ((round(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 6), -i)
             for i, v in vecs.items() if i != qid),
            reverse=True)[:5]
        expect = [(-i, c) for c, i in scored]
        rows = sorted((r for r in got if r["query_id"] == qid), key=lambda r: r["rank"])
        assert [(r["neighbor_id"], r["cosine"]) for r in rows] == expect

"""Dedup corpus output: keep-set correctness + byte-identical text."""

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.operators.dedup_corpus import exact_dedup_corpus, near_dedup_corpus
from minhashsketch_spark.pipeline import run_pipeline
from minhashsketch_spark.sources.corpus import corpus_dataframe

CFG = PipelineConfig(k=9, m=1, t=32, bands=8, rows=4, seed=7, threshold=0.7)


def test_exact_dedup_corpus(spark):
    rows = [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "aaa")]
    docs = spark.createDataFrame(rows, schema="doc_id bigint, text string")
    kept = sorted((r["doc_id"], r["text"]) for r in exact_dedup_corpus(docs).collect())
    assert kept == [(1, "aaa"), (2, "bbb"), (4, "ccc")]


def test_near_dedup_corpus_invariants(spark):
    docs_df, _ = corpus_dataframe(spark, n_docs=120, seed=13)
    res = run_pipeline(spark, docs_df, CFG)
    clusters = res["clusters"]
    kept = near_dedup_corpus(docs_df, clusters)

    n_docs = docs_df.count()
    n_clustered = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    # kept = all docs - (clustered - one keeper per cluster)
    assert kept.count() == n_docs - (n_clustered - n_clusters)
    # exactly one member of each cluster survives, and it's the cluster_id
    surviving = kept.join(clusters, "url").collect()
    assert len(surviving) == n_clusters
    assert all(r["url"] == r["cluster_id"] for r in surviving)
    # byte-identical text for every kept url
    orig = {r["url"]: r["text"] for r in docs_df.select("url", "text").collect()}
    for r in kept.select("url", "text").collect():
        assert orig[r["url"]] == r["text"]


def test_line_dedup_stats_edges(spark):
    """Line-level dedup: boilerplate lines (df >= min_df) drop from EVERY
    document, order of kept lines is preserved, all-boilerplate and empty
    docs yield the empty cleaned text."""
    import hashlib

    from pyspark.sql import functions as F

    from minhashsketch_spark.operators.dedup_corpus import line_dedup_stats

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    docs = spark.createDataFrame([
        (1, "HEADER\nunique one\nFOOTER"),
        (2, "HEADER\nunique two a\nunique two b\nFOOTER"),
        (3, "HEADER\nFOOTER"),          # all lines are boilerplate
        (4, ""),                         # one empty line, df=1 -> kept
        (5, "z last\na first"),          # order: original, not sorted
    ], "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in line_dedup_stats(docs, min_df=2).collect()}
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 1)
    assert got[1]["cleaned_md5"] == md5("unique one")
    assert got[2]["cleaned_md5"] == md5("unique two a\nunique two b")
    assert (got[3]["n_kept"], got[3]["cleaned_md5"]) == (0, md5(""))
    assert (got[4]["n_lines"], got[4]["n_kept"]) == (1, 1)
    assert got[4]["cleaned_md5"] == md5("")  # the kept line IS ""
    assert got[5]["cleaned_md5"] == md5("z last\na first")


def test_url_operators(spark):
    """normalize_url_expr canonicalization matrix + blocklist anti-join."""
    from pyspark.sql import functions as F

    from minhashsketch_spark.operators.urls import (
        filter_blocked_domains, host_expr, normalize_url_expr)

    cases = [
        (1, "HTTP://Example.COM:80/A/b?q=1#frag", "http://example.com/A/b?q=1"),
        (2, "https://site.org:443/", "https://site.org/"),
        (3, "https://site.org:8443/x", "https://site.org:8443/x"),  # non-default port kept
        (4, "http://host.com", "http://host.com/"),                 # empty path -> /
        (5, "http://host.com/p?", "http://host.com/p"),             # trailing empty query
        (6, "not a url #fragment", "not a url "),                   # un-parseable: fragment strip only
        (7, "ftp://Mixed.Case/KeepPathCase", "ftp://mixed.case/KeepPathCase"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "id bigint, url string")
    got = {r["id"]: r["n"] for r in
           df.select("id", normalize_url_expr().alias("n")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    hosts = {r["id"]: r["h"] for r in
             df.select("id", host_expr().alias("h")).collect()}
    assert hosts[1] == "example.com" and hosts[3] == "site.org" and hosts[6] == ""

    blocked = spark.createDataFrame([("Example.COM",), ("spam.net",)],
                                    "domain string")
    kept = {r["id"] for r in filter_blocked_domains(df, blocked).collect()}
    assert kept == {2, 3, 4, 5, 6, 7}  # id 1 (example.com) dropped


def test_hash_sampling_properties(spark):
    """Deterministic threshold sampling: stable across runs, subset
    property across fractions, disjoint + exhaustive splits."""
    import pytest

    from minhashsketch_spark.operators.sampling import hash_sample, hash_split

    docs = spark.range(0, 2000).selectExpr("concat('u-', id) AS url", "id")
    s10a = {r["id"] for r in hash_sample(docs, 0.10).collect()}
    s10b = {r["id"] for r in hash_sample(docs, 0.10).collect()}
    s30 = {r["id"] for r in hash_sample(docs, 0.30).collect()}
    assert s10a == s10b                      # reproducible
    assert s10a <= s30                       # subset property
    assert 0.05 < len(s10a) / 2000 < 0.15    # roughly the asked fraction
    assert len(hash_sample(docs, 0.0).collect()) == 0
    assert len(hash_sample(docs, 1.0).collect()) == 2000

    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = split.collect()
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["id"])
    assert set(by) == {"train", "val", "test"}  # fractions sum to 1 -> no NULL
    assert sum(len(v) for v in by.values()) == 2000
    assert by["train"] & by["val"] == set() and by["val"] & by["test"] == set()
    # sample(0.8) IS the train band (same threshold construction)
    assert {r["id"] for r in hash_sample(docs, 0.8).collect()} == by["train"]

    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)

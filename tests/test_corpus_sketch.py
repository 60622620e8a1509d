"""Corpus-level sketch: distributed partial+final aggregation equals the
single-machine bottom-m over the union (the O12/O13 merge algebra)."""

import numpy as np

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.core.shingles import bottom_m_matrix, distinct_shingles, get_family
from minhashsketch_spark.operators.corpus_sketch import corpus_sketch, corpus_sketch_df
from minhashsketch_spark.sources.corpus import corpus_dataframe, generate_corpus

CFG = PipelineConfig(k=9, m=5, t=8, bands=2, rows=4, seed=13, threshold=0.7)


def test_corpus_sketch_equals_local_union(spark):
    n = 80
    docs_df, _ = corpus_dataframe(spark, n_docs=n, seed=31)
    got = corpus_sketch(docs_df.repartition(7), CFG)

    docs, _ = generate_corpus(n_docs=n, seed=31)
    all_shingles = np.unique(np.concatenate([
        distinct_shingles(d[3].encode(), CFG.k) for d in docs]))
    a_par, b_par = get_family(CFG.t, CFG.seed)
    want = bottom_m_matrix(all_shingles, a_par, b_par, CFG.m)
    assert np.array_equal(got, want)


def test_corpus_sketch_df_shape(spark):
    docs_df, _ = corpus_dataframe(spark, n_docs=20, seed=31)
    df = corpus_sketch_df(docs_df, CFG)
    rows = df.collect()
    assert len(rows) == CFG.t * CFG.m
    assert df.columns == ["hash_idx", "rank", "value"]

"""Edge semantics of the round-3 text operators (the oracle harness covers
the bulk corpus; these pin the boundary rows both engines must agree on)."""

from minhashsketch_spark.operators.text import repetition_stats, tfidf_top_terms


def test_repetition_stats_edges(spark):
    docs = spark.createDataFrame(
        [(1, "one"), (2, "a a a a"), (3, "a b a b"), (4, "   ")],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}  # blank doc emits no row (matches oracle)
    # single token: no bigrams, frac 0 (and no ANSI element_at(0) blowup)
    assert rows[1]["n_tokens"] == 1 and rows[1]["dup_bigram_frac"] == 0.0
    # all-repeat doc: 4 tokens 1 distinct; bigrams [a a]x3 -> 1 - 1/3
    assert rows[2]["dup_token_frac"] == 0.75
    assert rows[2]["dup_bigram_frac"] == 0.666667
    # alternating: tokens 4/2 -> 0.5; bigrams [a b, b a, a b] -> 1 - 2/3
    assert rows[3]["dup_token_frac"] == 0.5
    assert rows[3]["dup_bigram_frac"] == 0.333333


def test_tfidf_top_terms_ordering(spark):
    # corpus of 4 docs; "rare" appears in 1 doc, "common" in all
    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common x"), (3, "common y"),
         (4, "common z")],
        "doc_id bigint, text string")
    rows = [(r["rank"], r["term"], r["tf"], r["df"])
            for r in tfidf_top_terms(docs, k=2).filter("doc_id = 1").collect()]
    # doc 1 scores: rare = 1*4/1 = 4, common = 2*4/4 = 2 -> rare first
    assert rows == [(1, "rare", 1, 1), (2, "common", 2, 4)]

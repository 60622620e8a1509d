"""Benchmark decontamination (GPT-3-style n-gram rule): planted verbatim
spans must flag, clean docs must not, short docs must not crash the n-gram
builder (ANSI sequence hazard), and the corpus side must never shuffle raw
text for the match."""

import pytest

from pyspark.sql import functions as F

from minhashsketch_spark.operators.decontam import (
    contamination_stats,
    decontaminate,
    ngram_keys,
)

BENCH_SPAN = " ".join(f"bench{i}" for i in range(13))   # exactly 13 tokens


def _docs(spark):
    rows = [
        (1, "clean words " + " ".join(f"w{i}" for i in range(30))),
        (2, "prefix " + BENCH_SPAN + " suffix"),        # contains the span
        (3, BENCH_SPAN),                                # IS the span
        (4, "short doc"),                               # < n tokens
        (5, ""),                                        # empty
        (6, " ".join(f"bench{i}" for i in range(12))),  # 12 of 13 — no hit
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(BENCH_SPAN + " and some trailing benchmark context",)], "text string")


def test_contamination_stats_flags_planted_spans(spark):
    got = {r["doc_id"]: r for r in
           contamination_stats(_docs(spark), _bench(spark), n=13).collect()}
    assert len(got) == 6                       # spine keeps every doc
    assert got[2]["contaminated"] and got[3]["contaminated"]
    for d in (1, 4, 5, 6):
        assert not got[d]["contaminated"], d
        assert got[d]["n_matched"] == 0
    assert got[3]["n_ngrams"] == 1 and got[3]["n_matched"] == 1
    assert got[2]["n_ngrams"] == 3             # 15 tokens -> 3 grams
    assert got[2]["n_matched"] == 1            # only the exact span matches
    assert got[4]["n_ngrams"] == 0 and got[5]["n_ngrams"] == 0


def test_decontaminate_drops_flagged_and_preserves_bytes(spark):
    docs = _docs(spark)
    out = decontaminate(docs, _bench(spark), n=13)
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(kept) == {1, 4, 5, 6}
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d in kept:                              # byte-identical passthrough
        assert kept[d] == orig[d]


def test_min_distinct_hits_threshold(spark):
    # with a 2-distinct-gram threshold the single-span docs survive
    out = decontaminate(_docs(spark), _bench(spark), n=13,
                        min_distinct_hits=2)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3, 4, 5, 6}


def test_ngram_keys_deterministic_and_positional(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    k2 = sorted(r["gram_key"] for r in ngram_keys(df, n=2).collect())
    assert len(k2) == 3
    # same text -> same keys (md5-prefix is deterministic)
    assert k2 == sorted(r["gram_key"] for r in ngram_keys(df, n=2).collect())


def test_contamination_plan_shape(spark):
    """The benchmark gram set must broadcast and the corpus text must not
    cross an Exchange — only matched (id, gram_key) rows shuffle."""
    import re

    docs = _docs(spark)
    plan = contamination_stats(docs, _bench(spark), n=13) \
        ._sc._jvm.PythonSQLUtils.explainString(
        contamination_stats(docs, _bench(spark), n=13)
        ._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    blocks = re.split(r"^\(\d+\) ", plan, flags=re.M)
    for blk in blocks:
        if blk.startswith("Exchange") and "broadcast" not in blk.split("\n")[0]:
            inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", blk)
            assert inp and not re.search(r"\btext\b|_toks", inp.group(1)), blk

"""Composed curation pipeline: monotone accounting, dedup applied,
byte-identical surviving text."""

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.curate import curate
from minhashsketch_spark.sources.corpus import corpus_dataframe

CFG = PipelineConfig(k=9, m=1, t=32, bands=8, rows=4, seed=7, threshold=0.7)


def test_curate_end_to_end(spark):
    docs_df, _ = corpus_dataframe(spark, n_docs=150, seed=21)
    out = curate(spark, docs_df, CFG, min_quality=10.0,
                 langs=("en", "unknown"))
    acc = out["accounting"]
    assert acc["input"] == 150
    # each step only removes rows
    assert acc["input"] >= acc["after_exact_dedup"] >= acc["after_near_dedup"] \
        >= acc["after_quality_lang"]
    # dedup really removed something (corpus plants exact + near dups)
    assert acc["after_near_dedup"] < acc["input"]
    assert acc["after_quality_lang"] > 0
    # byte-identical text per url for every survivor
    orig = {r["url"]: r["text"] for r in docs_df.select("url", "text").collect()}
    for r in out["curated"].select("url", "text").collect():
        assert orig[r["url"]] == r["text"]
    # curated schema preserves the input_hint columns
    assert set(out["curated"].columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_curate_keeper_best_keeps_highest_quality(spark, tmp_path):
    """keeper='best' must keep each near-dup cluster's highest-quality
    member, where keeper='min' keeps the min url."""
    from pyspark.sql import functions as F

    from minhashsketch_spark.config import PipelineConfig
    from minhashsketch_spark.curate import curate

    base = " ".join(f"alpha{i} beta{i}" for i in range(30))
    rows = [
        # a near-dup pair: u-a has digits (lower quality), u-b is clean
        ("u-a", base + " tail one 123456789012345678901234567890"),
        ("u-b", base + " tail two"),
        # an unclustered doc
        ("u-z", " ".join(f"solo{i} token{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    cfg = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=3, threshold=0.7)

    kept_min = {r["url"] for r in curate(
        spark, docs, cfg, min_quality=0.0, langs=("unknown",),
        checkpoint_root=str(tmp_path / "c1"), with_accounting=False,
        keeper="min")["curated"].collect()}
    kept_best = {r["url"] for r in curate(
        spark, docs, cfg, min_quality=0.0, langs=("unknown",),
        checkpoint_root=str(tmp_path / "c2"), with_accounting=False,
        keeper="best")["curated"].collect()}
    assert kept_min == {"u-a", "u-z"}   # lexicographic min
    assert kept_best == {"u-b", "u-z"}  # higher quality (no digit penalty)

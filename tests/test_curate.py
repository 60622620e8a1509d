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


def test_curate_with_benchmark_decontaminates(spark):
    """--benchmark wiring: a benchmark built from one surviving doc's text
    must remove exactly the docs sharing a 13-gram with it (itself + any
    exact/near dups of it), with accounting showing the extra step."""
    from pyspark.sql import functions as F

    docs_df, _ = corpus_dataframe(spark, n_docs=150, seed=21)
    base = curate(spark, docs_df, CFG, min_quality=10.0,
                  langs=("en", "unknown"))
    survivors = base["curated"].select("url", "text").collect()
    victim = sorted((r["url"], r["text"]) for r in survivors)[0]
    bench = spark.createDataFrame([(victim[1],)], "text string")

    out = curate(spark, docs_df, CFG, min_quality=10.0,
                 langs=("en", "unknown"), benchmark=bench)
    acc = out["accounting"]
    assert "after_decontam" in acc
    assert acc["after_decontam"] < acc["after_quality_lang"]
    kept = {r["url"] for r in out["curated"].select("url").collect()}
    assert victim[0] not in kept
    # every removed doc really shares a 13-gram with the benchmark text
    from minhashsketch_spark.operators.decontam import contamination_stats

    removed = {r["url"] for r in base["curated"].select("url").collect()} - kept
    stats = {r["url"]: r["contaminated"] for r in contamination_stats(
        base["curated"], bench, n=13, id_col="url").collect()}
    assert all(stats[u] for u in removed)
    assert not any(stats[u] for u in kept)


def test_curate_with_robots_filters_first(spark):
    """--robots wiring: disallowed urls are gone from the output, the
    accounting shows the step, and the stage key depends on the policy
    (different robots -> no stale resume)."""
    docs_df, _ = corpus_dataframe(spark, n_docs=120, seed=21)
    # corpus urls are https://site{i%n_sites}.example/page/{i}; disallow
    # one site's /page prefix entirely
    robots = spark.createDataFrame(
        [("site1.example", "User-agent: *\nDisallow: /page")],
        "domain string, robots_txt string")
    out = curate(spark, docs_df, CFG, min_quality=10.0,
                 langs=("en", "unknown"), robots=robots)
    acc = out["accounting"]
    assert acc["after_robots"] < acc["input"]
    kept = [r["url"] for r in out["curated"].select("url").collect()]
    assert kept and all("site1.example" not in u for u in kept)

"""Streaming ingest: incremental signatures equal the batch stage, and a
restart does not duplicate work (exactly-once bookkeeping)."""

import numpy as np

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.operators.signatures import compute_signatures
from minhashsketch_spark.sources.corpus import corpus_dataframe
from minhashsketch_spark.streaming import incremental_signatures

CFG = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=3, threshold=0.7)


def test_incremental_signatures_match_batch(spark, tmp_path):
    docs_df, _ = corpus_dataframe(spark, n_docs=60, seed=23)
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")
    docs_df.repartition(4).write.parquet(inp)

    q = incremental_signatures(spark, inp, out, ckpt, CFG)
    assert q.awaitTermination(120), "stream did not drain in 120s"

    got = {r["url"]: r["sig"] for r in spark.read.parquet(out).collect()}
    want = {r["url"]: r["sig"] for r in compute_signatures(docs_df, CFG).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k]

    # drain again: checkpoint prevents reprocessing -> no duplicate rows
    q2 = incremental_signatures(spark, inp, out, ckpt, CFG)
    assert q2.awaitTermination(120), "stream did not drain in 120s"
    n = spark.read.parquet(out).count()
    assert n == len(want)


def test_replayed_batch_does_not_duplicate(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a crash-replay by writing the
    same micro-batch twice — the batch_id-partition dynamic overwrite must
    leave exactly one copy."""
    from minhashsketch_spark.streaming.ingest import write_signature_batch

    docs_df, _ = corpus_dataframe(spark, n_docs=30, seed=5)
    n_docs = docs_df.count()
    out = str(tmp_path / "sigs")
    sigs = compute_signatures(docs_df, CFG)
    write_signature_batch(sigs, 0, out)
    n1 = spark.read.parquet(out).count()
    write_signature_batch(sigs, 0, out)  # replay after simulated crash
    assert spark.read.parquet(out).count() == n1 == n_docs
    # a *new* batch still appends (its own partition)
    write_signature_batch(sigs.limit(5), 1, out)
    assert spark.read.parquet(out).count() == n_docs + 5


def test_windowed_event_counts_match_batch(spark, tmp_path):
    from minhashsketch_spark.streaming.windows import (
        batch_windowed_event_counts,
        windowed_event_counts,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    inp = str(tmp_path / "events")
    events.repartition(3).write.parquet(inp)

    q = windowed_event_counts(spark, inp, query_name="we_test")
    assert q.awaitTermination(120), "stream did not drain in 120s"
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM we_test").collect())
    want = sorted(tuple(r) for r in batch_windowed_event_counts(events).collect())
    assert got == want and len(got) > 0


def test_stateful_dedup_first_seen_and_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState exact-dedup: (1) draining one drop equals the
    batch first-seen oracle; (2) a second drop re-offering already-seen
    fingerprints emits nothing for them (state persisted via checkpoint),
    while genuinely new content still comes through."""
    from minhashsketch_spark.streaming.stateful_dedup import (
        batch_first_seen,
        streaming_exact_dedup,
    )

    docs_df, _ = corpus_dataframe(spark, n_docs=80, seed=9)
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")
    # <= maxFilesPerTrigger files -> one micro-batch -> the stream keeper is
    # the global min url, comparable to the batch oracle
    docs_df.coalesce(2).write.parquet(inp)

    q = streaming_exact_dedup(spark, inp, ckpt, out)
    assert q.awaitTermination(120), "stream did not drain in 120s"
    got = {r["fingerprint"]: (r["url"], r["n_chars"])
           for r in spark.read.parquet(out).collect()}
    want = {r["fingerprint"]: (r["url"], r["n_chars"])
            for r in batch_first_seen(docs_df).collect()}
    assert got == want and len(got) > 0

    # second drop: the same docs again (all dup fingerprints) + fresh docs
    extra, _ = corpus_dataframe(spark, n_docs=20, seed=77)
    extra = extra.selectExpr("concat(url, '?v2') AS url", "warc_ts", "html",
                             "concat(text, ' fresh-content-marker') AS text",
                             "lang")
    docs_df.coalesce(1).write.mode("append").parquet(inp)
    extra.coalesce(1).write.mode("append").parquet(inp)

    q2 = streaming_exact_dedup(spark, inp, ckpt, out)
    assert q2.awaitTermination(120), "stream did not drain in 120s"
    rows = spark.read.parquet(out).collect()
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps)), "a fingerprint was emitted twice"
    n_new = len(rows) - len(want)
    assert n_new == extra.select("text").distinct().count()


def test_incremental_near_dedup_drains_and_resumes(spark, tmp_path):
    """Streaming incremental near-dup: drop 1 drains against the seed
    index; the stream stops; drop 2 lands; a RESTARTED stream (same
    checkpoint) processes only drop 2, against seed + drop 1's delta —
    batch-1 pairs appear once, batch-0 pairs are not duplicated."""
    import os

    from pyspark.sql import functions as F

    from minhashsketch_spark.operators.cross_dedup import build_band_index
    from minhashsketch_spark.streaming.incremental_dedup import (
        streaming_incremental_dedup)

    # three groups of near-identical docs: one doc per group per tier
    def tier_docs(tier):
        rows = []
        for g in range(6):
            # per-group vocabulary is fully distinct so cross-group pairs
            # are NOT near-dups; tiers of one group differ only in a tail
            body = " ".join(f"group{g}word{i}token" for i in range(40))
            rows.append((f"t{tier}-g{g}", body + f" tier {tier} tail"))
        return spark.createDataFrame(rows, "url string, text string")

    seed = tier_docs(0).localCheckpoint()
    cfg = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=3, threshold=0.7)
    build_band_index(spark, seed, cfg, "t_incr", n_buckets=4,
                     path_root=str(tmp_path / "idx"))
    inp, delta, pairs, ckpt = [str(tmp_path / p)
                               for p in ("in", "delta", "pairs", "ckpt")]
    os.makedirs(inp)

    def land(tier, mtime):
        import glob
        import shutil

        d = str(tmp_path / f"drop{tier}")
        (tier_docs(tier)
         .select("url", F.lit(None).cast("timestamp").alias("warc_ts"),
                 F.lit(None).cast("binary").alias("html"), "text",
                 F.lit("en").alias("lang"))
         .coalesce(1).write.mode("overwrite").parquet(d))
        dst = f"{inp}/drop{tier}.parquet"
        shutil.copyfile(glob.glob(f"{d}/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    try:
        land(1, 1700000000)
        q = streaming_incremental_dedup(spark, inp, "t_incr", delta,
                                        pairs, ckpt, cfg)
        assert q.awaitTermination(240), "stream did not drain in 240s"
        p1 = spark.read.parquet(pairs).filter("is_dup") \
            .select("url_new", "url_idx").collect()
        got1 = {(r["url_new"], r["url_idx"]) for r in p1}
        assert got1 == {(f"t1-g{g}", f"t0-g{g}") for g in range(6)}
        assert len(p1) == len(got1)  # no duplicate rows

        land(2, 1700000100)
        q = streaming_incremental_dedup(spark, inp, "t_incr", delta,
                                        pairs, ckpt, cfg)  # same checkpoint
        assert q.awaitTermination(240), "stream did not drain in 240s"
        p2 = spark.read.parquet(pairs).filter("is_dup") \
            .select("url_new", "url_idx").collect()
        got2 = {(r["url_new"], r["url_idx"]) for r in p2}
        want2 = got1 \
            | {(f"t2-g{g}", f"t0-g{g}") for g in range(6)} \
            | {(f"t2-g{g}", f"t1-g{g}") for g in range(6)}
        assert got2 == want2
        assert len(p2) == len(got2)  # drop-1 pairs not re-emitted/duplicated

        # compaction folds drops 1+2 into the bucketed index (clearing the
        # delta); drop 3 then pairs with ALL prior tiers via the index alone
        from minhashsketch_spark.streaming.incremental_dedup import (
            compact_band_index)

        n = compact_band_index(spark, "t_incr", delta, cfg, n_buckets=4,
                               path_root=str(tmp_path / "idx2"))
        assert n == 12
        assert not os.path.exists(delta)
        land(3, 1700000200)
        q = streaming_incremental_dedup(spark, inp, "t_incr", delta,
                                        pairs, ckpt, cfg)
        assert q.awaitTermination(240), "stream did not drain in 240s"
        p3 = spark.read.parquet(pairs).filter("is_dup") \
            .select("url_new", "url_idx").collect()
        got3 = {(r["url_new"], r["url_idx"]) for r in p3}
        want3 = want2 | {(f"t3-g{g}", f"t{t}-g{g}")
                         for g in range(6) for t in range(3)}
        assert got3 == want3
        assert len(p3) == len(got3)
    finally:
        for s in ("sigs", "bands", "dim"):
            spark.sql(f"DROP TABLE IF EXISTS t_incr_{s}")


def test_compaction_crash_window_is_idempotent(spark, tmp_path):
    """ADVICE r4: a crash after the _sigs rewrite but before the delta
    clear leaves delta docs in BOTH index and delta. A batch running in
    that window must not emit duplicate pair rows, and a compaction re-run
    must not fold the delta in twice (no duplicate urls in _sigs)."""
    import shutil

    from pyspark.sql import functions as F

    from minhashsketch_spark.operators.cross_dedup import build_band_index
    from minhashsketch_spark.streaming.incremental_dedup import (
        compact_band_index,
        dedup_batch_against_index,
    )

    def tier(t):
        rows = []
        for g in range(4):
            body = " ".join(f"grp{g}tok{i}word" for i in range(40))
            rows.append((f"t{t}-g{g}", body + f" tier {t} tail"))
        return spark.createDataFrame(rows, "url string, text string")

    cfg = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=3, threshold=0.7)
    delta = str(tmp_path / "delta")
    try:
        build_band_index(spark, tier(0).localCheckpoint(), cfg, "t_cw",
                         n_buckets=4, path_root=str(tmp_path / "idx"))
        # delta partition for batch 1 (what the stream handler writes)
        from minhashsketch_spark.operators.signatures import compute_signatures

        b1 = tier(1).localCheckpoint()
        (compute_signatures(b1, cfg).join(b1, "url")
         .withColumn("batch_id", F.lit(1))
         .write.partitionBy("batch_id").parquet(delta))
        saved = str(tmp_path / "delta_saved")
        shutil.copytree(delta, saved)

        assert compact_band_index(spark, "t_cw", delta, cfg, n_buckets=4,
                                  path_root=str(tmp_path / "idx2")) == 4
        # simulate the crash window: _sigs already holds batch 1, and the
        # delta clear "didn't happen"
        shutil.copytree(saved, delta)

        ver = dedup_batch_against_index(spark, tier(2), 2, "t_cw", delta, cfg)
        rows = ver.filter("is_dup").select("url_new", "url_idx").collect()
        got = [(r["url_new"], r["url_idx"]) for r in rows]
        want = {(f"t2-g{g}", f"t{t}-g{g}") for g in range(4) for t in (0, 1)}
        assert set(got) == want
        assert len(got) == len(want), "window batch emitted duplicate rows"

        # re-run compaction over the restored delta: must converge, not
        # double-fold
        assert compact_band_index(spark, "t_cw", delta, cfg, n_buckets=4,
                                  path_root=str(tmp_path / "idx3")) == 4
        sigs = spark.table("t_cw_sigs")
        assert sigs.count() == sigs.select("url").distinct().count() == 8
    finally:
        for s in ("sigs", "bands", "dim"):
            spark.sql(f"DROP TABLE IF EXISTS t_cw_{s}")

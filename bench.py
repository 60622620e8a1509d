#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measurement protocol (CLAUDE.md "bench protocol"): each query runs
$SPARK_GRAFT_BENCH_REPS times (default 2) and ``queries`` reports the
per-query MIN; every individual rep plus /proc/loadavg before each rep is
recorded so a reader can adjudicate co-tenant load spikes (this host has
measured the same bench at 90 s and 119 s twenty minutes apart purely from
external load) without trusting prose. ``value`` is the sum of per-query
minimums.

Artifact hardening (round 5 — BENCH_r04.json arrived tail-truncated with
``parsed: null`` and loadavg 2.3-7.9):

* The stdout line is the COMPACT summary (metric/value/queries/loadavg) —
  short enough that tail capture cannot truncate it mid-object. The full
  per-rep record (``reps``, ``rep_loadavg1``) is written to its own file,
  ``BENCH/bench_full.json`` (override: $SPARK_GRAFT_BENCH_OUT), whose path
  the summary carries as ``full_artifact``.
* The loadavg gate is enforced, not advised: if loadavg(1m) >= 1.5 at
  start, bench.py WAITS for the host to go idle (up to
  $SPARK_GRAFT_BENCH_WAIT s, default 600, polling every 15 s) and then
  REFUSES (exit 2) if it never does — unless ``--force`` /
  $SPARK_GRAFT_BENCH_FORCE=1, which proceeds and stamps
  ``"gate_forced": true`` into both artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:  # non-Linux fallback
        return list(os.getloadavg())


LOAD_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_LOADGATE", "1.5"))


def _enforce_load_gate(force: bool) -> tuple[list[float], bool]:
    """Block until loadavg(1m) < LOAD_GATE (polling 15 s, up to
    $SPARK_GRAFT_BENCH_WAIT s); exit 2 if the host never settles and
    --force wasn't given. Returns (loadavg_at_go, gate_forced)."""
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT", "600"))
    deadline = time.time() + max_wait
    load = _loadavg()
    while load[0] >= LOAD_GATE and time.time() < deadline:
        print(f"loadavg {load[0]} >= {LOAD_GATE} — waiting for host to idle "
              f"({int(deadline - time.time())}s left; --force overrides)",
              file=sys.stderr)
        time.sleep(15.0)
        load = _loadavg()
    if load[0] >= LOAD_GATE:
        if not force:
            print(f"REFUSING to bench: loadavg {load[0]} >= {LOAD_GATE} after "
                  f"{max_wait:.0f}s wait; rerun when idle or pass --force",
                  file=sys.stderr)
            sys.exit(2)
        print(f"WARNING: benching under load {load[0]} (--force) — timings "
              "are inflated by co-tenant load", file=sys.stderr)
        return load, True
    return load, False

HEADLINE = [
    # the flagship near-dup pipeline stages
    "doc_shingle_counts",
    "minhash_signatures",
    "minhash_candidates",
    "near_dup_pairs",
    "near_dup_containment",
    "near_dup_pairs_m4",
    "near_dup_clusters",
    "cross_corpus_dups",
    "cross_corpus_dups_indexed",
    # the composed end-to-end curation pipeline
    "curated_corpus",
    # crawl ingestion + dedup + text analysis
    "html_extract",
    "warc_roundtrip",
    "pii_scrub",
    "robots_filter",
    "exact_dedup",
    "exact_dedup_corpus",
    "line_dedup",
    "url_dedup",
    "domain_stats",
    "corpus_splits",
    "contamination",
    "near_dedup_corpus",
    "near_dedup_best",
    "ngram_jaccard",
    "simhash_pairs",
    "token_stats",
    "quality_score",
    "language_id",
    "repetition_stats",
    "compression_ratio",
    "tfidf_top_terms",
    "md5_fingerprint",
    "winnow_fingerprint",
    "substring_dups",
    "corpus_sketch",
    # similarity search
    "embedding_topk",
    "embedding_topk_lsh",
    "embedding_topk_ivf",
    "embedding_near_dup",
    # multimodal + event analytics
    "audio_stats",
    "multimodal_features",
    "jpeg_features",
    "user_sessions",
    "windowed_event_counts",
    "streaming_dedup",
    "streaming_incremental_dedup",
    "orders_rollup",
    # reference parity surface (clip FASTAs — constant size, not sf-scaled)
    "dna_similarity",
    "dna_sketches",
    # relational
    "tpch_q1",
    "tpch_q3_like",
    "revenue_by_nation",
    "parts_by_brand",
    "top_events_per_user",
    "event_type_stats",
]


def _warmup(spark) -> None:
    """Untimed, disclosed: spin up the local[N] Python UDF workers and the
    codegen/Arrow machinery once before the clock. The first UDF-bearing
    query otherwise pays ~5 s of session-global process startup (measured on
    doc_shingle_counts: 7.6 s first-in-session vs 1.8 s warm) that belongs
    to the JVM session, not the query being measured."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1 << 14, 1, int(CPUS))

    def ident(batches):
        yield from batches

    (df.mapInPandas(ident, schema="id bigint")
       .groupBy((F.col("id") % 7).alias("k")).count()
       .write.format("noop").mode("overwrite").save())
    # touch the signature UDF once per worker: the first real task in each
    # of the N reused worker processes imports the package + numpy and
    # dlopens the C kernel (~3.4 s across 32 workers, measured at sf0.1) —
    # session infrastructure, not per-query work
    from minhashsketch_spark.config import PipelineConfig
    from minhashsketch_spark.operators.signatures import compute_signatures

    docs = spark.range(0, 2 * int(CPUS), 1, int(CPUS)).select(
        F.format_string("w-%03d", F.col("id")).alias("url"),
        F.lit("warmup text payload for the kernel").alias("text"))
    cfg = PipelineConfig(k=9, m=1, t=2, bands=1, rows=2, seed=1, threshold=0.7)
    compute_signatures(docs, cfg).write.format("noop").mode("overwrite").save()


def main() -> None:
    force = ("--force" in sys.argv
             or os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1")
    load_start, gate_forced = _enforce_load_gate(force)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("minhashsketch-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    _warmup(spark)
    qs = entry_mod.queries()
    missing = sorted(set(qs) - set(HEADLINE))
    if missing:  # keep the perf surface total: every driver query is benched
        print(f"WARNING: queries missing from HEADLINE: {missing}", file=sys.stderr)
    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    rep_load: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        reps[name] = []
        rep_load[name] = []
        for _ in range(REPS):
            rep_load[name].append(_loadavg()[0])
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.time() - t0, 3))
            # queries are standalone: drop their persist()ed blocks and
            # collect the JVM heap so one rep's cache pressure can't tax the
            # next (measured: regex-heavy scans degrade up to ~30x once the
            # heap fills with stale cache blocks from earlier queries)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)  # block removal is async — settle off the clock
        timings[name] = min(reps[name])
        total += timings[name]

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "bench_full.json"))
    summary = {
        "metric": "headline_queries_total_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "n_reps": REPS,
        "loadavg": {"start": load_start, "end": _loadavg()},
        "gate_forced": gate_forced,
        "sf": sf_val,
        "cpus": int(CPUS),
        "full_artifact": out_path,
    }
    full = dict(summary, reps=reps, rep_loadavg1=rep_load)
    try:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError as e:  # keep the stdout contract even if the FS refuses
        print(f"WARNING: could not write {out_path}: {e}", file=sys.stderr)
    # the compact line is the driver contract; print it LAST-line-is-JSON
    # safe AND short (a truncated capture of BENCH_r04.json cut a 7 KB line
    # mid-object — the per-rep bulk now lives only in full_artifact)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

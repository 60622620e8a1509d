"""End-to-end near-duplicate pipeline with checkpointed, resumable stages.

config -> read documents -> [signatures] -> [candidates] -> [verified]
       -> [clusters], each [stage] written as a table keyed by config hash
(SURVEY.md §3.4). Per-stage manifests record rows in/out + stage metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").
"""

from __future__ import annotations

import atexit
import hashlib
import json
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .operators.connected_components import connected_components
from .operators.lsh import bucket_stats, candidate_pairs, explode_bands
from .operators.signatures import compute_signatures
from .operators.verify import est_prefilter_gate, verified_pairs
from .sources.io import StageStore

# auto-created checkpoint roots (no caller-provided checkpoint_root): each
# call gets a FRESH root — reuse would let a later call resume from another
# run's stages — but every root is removed at interpreter exit instead of
# leaking a parquet copy of the corpus per invocation
_AUTO_ROOTS: list[str] = []


def _cleanup_auto_roots() -> None:
    for root in _AUTO_ROOTS:
        shutil.rmtree(root, ignore_errors=True)


def _track_auto_root(root: str) -> None:
    if not _AUTO_ROOTS:
        atexit.register(_cleanup_auto_roots)
    _AUTO_ROOTS.append(root)


def input_fingerprint(docs: DataFrame) -> str:
    """Short fingerprint of a DataFrame's INPUT identity, for folding into
    persistent checkpoint stage keys: same config + different corpus must
    not resume from the old corpus's stages. File-based sources fingerprint
    as the sorted (path, length, mtime) list — name-only fingerprints let
    an in-place rewrite (same file names, new bytes) silently resume stale
    stages. Stats come from the Hadoop FileSystem of each path (works for
    file:/hdfs:/s3a:; one driver metadata call per file); a path whose
    stats are unreadable contributes its name alone. In-memory/derived
    frames fall back to the analyzed plan's semantic hash."""
    try:
        files = sorted(docs.inputFiles())
    except Exception:
        files = []
    if files:
        sc = docs.sparkSession.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        jpath = sc._jvm.org.apache.hadoop.fs.Path
        entries = []
        for f in files:
            try:
                p = jpath(f)
                st = p.getFileSystem(hconf).getFileStatus(p)
                entries.append([f, st.getLen(), st.getModificationTime()])
            except Exception:
                entries.append([f, None, None])
        payload = json.dumps(entries)
    else:
        payload = f"plan:{docs._jdf.queryExecution().analyzed().semanticHash()}"
    return hashlib.sha256(payload.encode()).hexdigest()[:12]


def run_pipeline(spark: SparkSession, docs: DataFrame, cfg: PipelineConfig,
                 checkpoint_root: str | None = None,
                 url_col: str = "url", text_col: str = "text",
                 stage_key: str | None = None,
                 est_gate: float | None = None) -> dict[str, DataFrame]:
    """Returns {"signatures", "candidates", "verified", "clusters"} DataFrames.

    With ``checkpoint_root`` set, each stage is persisted and a re-run skips
    completed stages (kill/resume-safe: manifests are written atomically
    after the data). Without it, stages checkpoint into a session-scoped
    temp dir: downstream stages consume every UDF output from parquet, never
    from a Spark cache — large array columns in an InMemoryRelation
    measurably anti-scale under many-threaded readers, and the checkpoint
    also cuts the signature UDF out of the self-join lineage.

    ``stage_key`` keys the checkpoints; it defaults to the config hash, but
    a persistent ``checkpoint_root`` shared across inputs must fold an input
    fingerprint into it (see ``input_fingerprint``) or a re-run on a
    different corpus would silently resume from the old corpus's stages.

    ``est_gate``: optional est_sim pre-gate forwarded to ``verified_pairs``
    — the verified stage then contains only pairs at or above the gate.
    Default None (full verified table) because this function's verified
    output is a public surface (``entry()`` returns it verbatim); callers
    that only consume ``clusters`` / ``is_dup`` (curate) pass
    ``est_prefilter_gate(cfg)`` and skip exact-verifying the ~98% of LSH
    candidates that are random band collisions. The gate is folded into
    the VERIFIED stage's name only: signatures/candidates are
    gate-independent and stay shared across gated/ungated runs on the
    same checkpoint root, and clusters are bit-identical either way (the
    gate preserves every is_dup row), so a resume can never mix
    incompatible stage tables.
    """
    if checkpoint_root is None:
        import tempfile

        checkpoint_root = tempfile.mkdtemp(prefix="mhs_stages_")
        _track_auto_root(checkpoint_root)
    key = stage_key or cfg.config_hash()
    store = StageStore(spark, checkpoint_root, key) if checkpoint_root else None
    # the gate changes only the verified stage's contents: fold it into
    # THAT stage name, so the expensive gate-independent
    # signatures/candidates stages (and the bit-identical clusters) stay
    # shared between gated and ungated runs on the same checkpoint_root
    gate_sfx = (f"-g{est_gate:.6f}"
                if est_gate is not None and est_gate > 0.0 else "")
    timings: dict[str, float] = {}
    # Arrow batch sizing for the signature UDF — the analogue of the
    # reference's CHUNKS sizing (src/MinhashSketch.cu:304-330)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(cfg.arrow_batch_rows))

    def stage(name: str, build, metrics=None, extra_aggs=None) -> DataFrame:
        if store is not None and store.exists(name):
            return store.read(name)
        t0 = time.time()
        df = build()
        if store is not None:
            df = store.write(name, df,
                             metrics={} if metrics is None else metrics(),
                             extra_aggs=extra_aggs)
        timings[name] = time.time() - t0
        return df

    signatures = stage("signatures", lambda: compute_signatures(docs, cfg, url_col, text_col))

    def cand_metrics():
        stats = bucket_stats(explode_bands(signatures))
        row = stats.agg(
            F.count("*").alias("buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.sum((F.col("bucket_size") > cfg.bucket_cap).cast("long")).alias("buckets_over_cap"),
        ).collect()[0]
        return {"buckets": row["buckets"], "max_bucket": row["max_bucket"],
                "buckets_over_cap": row["buckets_over_cap"]}

    candidates = stage("candidates", lambda: candidate_pairs(signatures, cfg),
                       metrics=cand_metrics)
    verified = stage(f"verified{gate_sfx}",
                     # signatures + candidates are parquet stage tables here:
                     # re-planning them is ~free, so skip verified_pairs'
                     # executor-storage copies (localCheckpoint) of both
                     lambda: verified_pairs(candidates, signatures, docs, cfg,
                                            url_col, text_col,
                                            checkpoint_sigs=False,
                                            checkpoint_pairs=False,
                                            est_gate=est_gate),
                     # counted inside the lineage job — the clusters stage
                     # reads it from the manifest instead of re-counting
                     extra_aggs={"n_dup_pairs":
                                 F.sum(F.col("is_dup").cast("long"))})
    n_edges = None
    if store is not None and store.exists(f"verified{gate_sfx}"):
        m = store.manifest(f"verified{gate_sfx}").get("metrics", {})
        n_edges = m.get("n_dup_pairs")
    # clusters are gate-INDEPENDENT (the gate preserves every is_dup row
    # bit-identically), so the stage name stays unsuffixed and is shared
    # between gated and ungated runs
    clusters = stage("clusters",
                     lambda: connected_components(
                         verified.filter("is_dup").select("url_a", "url_b"),
                         cfg.max_cc_iterations, n_edges=n_edges))
    return {
        "signatures": signatures,
        "candidates": candidates,
        "verified": verified,
        "clusters": clusters,
        "timings": timings,
    }


def dup_pair_recall(found_pairs: DataFrame, truth_pairs: DataFrame) -> float:
    """Fraction of truth pairs present in found pairs (both url_a < url_b)."""
    total = truth_pairs.count()
    if total == 0:
        return 1.0
    hit = truth_pairs.join(found_pairs, ["url_a", "url_b"], "left_semi").count()
    return hit / total


def clusters_to_pairs(clusters: DataFrame) -> DataFrame:
    """clusters(url, cluster_id) -> all within-cluster pairs url_a < url_b."""
    a = clusters.select(F.col("cluster_id"), F.col("url").alias("url_a"))
    b = clusters.select(F.col("cluster_id"), F.col("url").alias("url_b"))
    return (a.join(b, "cluster_id")
            .filter(F.col("url_a") < F.col("url_b"))
            .select("url_a", "url_b"))

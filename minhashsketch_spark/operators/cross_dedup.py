"""Cross-corpus near-duplicate detection: dedupe an incoming crawl batch
against an existing index WITHOUT self-joining either side — the
incremental shape of a continuous crawl (a daily drop of new pages vs a
10^12-document index).

Scale design (the asymmetric sibling of operators/lsh.py):

* band keys exactly as in the self-join path; the join is new x index on
  ``band_key`` — pair volume is O(new-side band collisions), never
  O(index^2), and the new side is typically <<1% of the index.
* **index-side hot buckets are salted** into ceil(size/cap) sub-buckets;
  the NEW side is *replicated* across those salt values (the standard
  skew-join replication: n_salt copies of the small side, every pair
  preserved — this mitigates skew, it does not cap volume). Unlike the
  self-join case no chain links are needed: candidates never have to
  connect index documents to each other.
* verification reuses verified_pairs (reference estimator + exact
  Jaccard) over the union of both corpora's signatures/texts — it is
  symmetric in url_a/url_b.

Two entry points:

* ``cross_corpus_dup_pairs`` computes index signatures in-flight — the
  ad-hoc / driver-scale form (index signatures are localCheckpoint'ed,
  i.e. executor-memory-resident).
* ``build_band_index`` + ``cross_corpus_dup_pairs_indexed`` is the
  production shape: the index's salted band table, salt dimension, and
  signatures are persisted ONCE as catalog tables bucketed on their join
  keys (sources.io.write_bucketed), so each daily batch joins with ZERO
  Exchange on the index side — the shuffle of the 10^12-row index was
  paid once at build time, and a daily run shuffles only the small batch
  (plan-asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from .lsh import explode_bands
from .signatures import compute_signatures
from .verify import est_prefilter_gate, verified_pairs


def _salted_index_bands(index_bands: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(band_key, url_idx) -> + (salt, n_salt): hot buckets split into
    ceil(size/cap) sub-buckets by a stable url hash (resume-safe).

    Sizes via hash-agg + join, not count-over-window (same two-level shape
    as lsh.salt_hot_buckets): the window buffered a whole mega-band in one
    task; the hash-agg partially combines and the size join is AQE
    skew-splittable. Singleton buckets are KEPT here — unlike the
    self-join path, a single index doc can still match a new doc. A
    UDF-backed input is materialized once before the two-consumer sizing
    fan-out (parquet/table-backed index scans stay lazy)."""
    from ..partitioning import eager_if_python

    index_bands = eager_if_python(index_bands)
    sizes = index_bands.groupBy("band_key").agg(
        F.count("*").alias("bucket_size"))
    return (
        index_bands.join(sizes, "band_key")
        .withColumn("n_salt",
                    F.ceil(F.col("bucket_size") / F.lit(cfg.bucket_cap)).cast("int"))
        .withColumn("salt",
                    F.when(F.col("n_salt") <= 1, F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("url_idx"), F.col("n_salt")).cast("int")))
        .select("band_key", "salt", "n_salt", "url_idx")
    )


def cross_candidate_pairs(new_sigs: DataFrame, index_sigs: DataFrame,
                          cfg: PipelineConfig) -> DataFrame:
    """(url_new, url_idx) candidates: pairs sharing >= 1 LSH band key."""
    nb = explode_bands(new_sigs).select("band_key", F.col("url").alias("url_new"))
    ib = explode_bands(index_sigs).select("band_key", F.col("url").alias("url_idx"))

    # window + signature-UDF lineage runs exactly once. localCheckpoint is
    # the DRIVER-SCALE choice (executor storage holds index_docs x bands
    # rows); at real index scale use build_band_index + the _indexed
    # variant, which checkpoints this table to a bucketed parquet catalog
    # table instead
    ib = _salted_index_bands(ib, cfg).localCheckpoint()

    # replicate each new row across the index bucket's salt range (inner
    # join on the per-band n_salt dim also drops new-side bands with no
    # index occupancy — they can produce no candidates anyway)
    n_salt_dim = ib.select("band_key", "n_salt").distinct()
    nbr = (
        nb.join(n_salt_dim, "band_key")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.col("n_salt") - 1)))
        .select("band_key", "salt", "url_new")
    )
    return (
        nbr.join(ib.select("band_key", "salt", "url_idx"), ["band_key", "salt"])
        .select("url_new", "url_idx")
        .dropDuplicates(["url_new", "url_idx"])
    )


def cross_corpus_dup_pairs(new_docs: DataFrame, index_docs: DataFrame,
                           cfg: PipelineConfig, url_col: str = "url",
                           text_col: str = "text",
                           est_gate: float | None | str = "auto") -> DataFrame:
    """Verified near-dup pairs (url_new, url_idx, est_sim, jaccard, is_dup)
    between an incoming batch and an existing index.

    Both signature frames have two consumers (the candidate band join and
    the verification union), so both are EAGERLY materialized here — the
    signature UDF must not be re-planned per consumer. New side is always
    batch-sized; the index side is localCheckpoint'ed too because this
    entry point is the ad-hoc/driver-scale form — the production path for
    a large index is ``cross_corpus_dup_pairs_indexed`` over a persisted
    ``build_band_index`` table, which never recomputes index signatures.

    ``est_gate``: "auto" (default) applies ``est_prefilter_gate(cfg)`` —
    safe for jaccard>=threshold / is_dup consumers (every in-repo one);
    pass None to keep every sub-threshold candidate row (estimator
    calibration, precision measurement), or an explicit float."""
    if est_gate == "auto":
        est_gate = est_prefilter_gate(cfg)
    sig_n = compute_signatures(new_docs, cfg, url_col, text_col).localCheckpoint()
    sig_i = compute_signatures(index_docs, cfg, url_col, text_col).localCheckpoint()
    cand = cross_candidate_pairs(sig_n, sig_i, cfg).select(
        F.col("url_new").alias("url_a"), F.col("url_idx").alias("url_b"))
    sigs = sig_n.unionByName(sig_i)
    docs = (new_docs.select(F.col(url_col), F.col(text_col))
            .unionByName(index_docs.select(F.col(url_col), F.col(text_col))))
    ver = verified_pairs(cand, sigs, docs, cfg, url_col, text_col,
                         checkpoint_sigs=False,  # both inputs pre-materialized
                         est_gate=est_gate)
    return ver.select(F.col("url_a").alias("url_new"),
                      F.col("url_b").alias("url_idx"),
                      "est_sim", "jaccard", "is_dup")


def _jk(band_col, salt_col):
    """Single bucketable join key folding (band_key, salt) into one long.

    The candidate join runs on this ONE key: the join key must equal the
    bucket key exactly or Spark's planner disables the bucketed read and
    shuffles both sides (measured: a [jk, band_key, salt] join plans
    "Bucketed: false (disabled by query planner)"). xxhash64 is not
    injective, but a collision only MERGES two sub-buckets' join groups,
    which can only ADD candidate pairs — never lose one — and every
    candidate passes exact verification downstream, so pair semantics are
    unchanged. P(any collision) ~ (#distinct buckets)^2 / 2^64."""
    return F.xxhash64(band_col, salt_col)


def build_band_index(spark: SparkSession, index_docs: DataFrame,
                     cfg: PipelineConfig, table: str, n_buckets: int = 64,
                     path_root: str | None = None, url_col: str = "url",
                     text_col: str = "text") -> dict[str, str]:
    """One-time (or periodic-refresh) index build for incremental dedup.

    Persists three bucketed catalog tables (sources.io.write_bucketed —
    the write pays the shuffle once so every later daily join reads the
    index pre-partitioned, with no Exchange on the index side):

    * ``<table>_sigs``  (url, sig_key, sig, bands, text) bucketed by url —
      the verification side's signature + raw-text lookup, reused by every
      daily run instead of recomputing the signature UDF over the whole
      index. Text lives here because exact-Jaccard verification needs the
      candidate partners' bytes — and at 10^12 docs this table IS the
      corpus, stored bucketed by its join key.
    * ``<table>_bands`` (jk, band_key, salt, url_idx) bucketed+sorted by
      ``jk = xxhash64(band_key, salt)`` — the candidate join side. Folding
      salt into the bucket key keeps hot bands PHYSICALLY spread across
      sub-buckets in the stored layout (bucketing by band_key alone would
      put a mega-bucket back into one task and AQE cannot split a bucketed
      scan).
    * ``<table>_dim``   (band_key, n_salt) bucketed by band_key — the salt
      dimension the new side replicates against.

    Returns {"sigs": ..., "bands": ..., "dim": ...} table names.
    """
    def p(suffix: str) -> str | None:
        return f"{path_root}/{suffix}" if path_root else None

    from ..sources.io import write_bucketed

    # keep_text: the signature UDF passes the text bytes through its Arrow
    # batches, so the (signature, text) rows are born joined — the r5 shape
    # re-joined signatures against the corpus on url, a full SMJ shuffle of
    # the text for data the UDF already held (guide §2.4)
    sigs = compute_signatures(index_docs, cfg, url_col, text_col,
                              keep_text=True)
    write_bucketed(sigs.select("url", "sig_key", "sig", "bands", "text"),
                   f"{table}_sigs", "url", n_buckets, path=p("sigs"))
    # derive the band tables from the STORED signatures: one signature-UDF
    # execution total, and the band build reads columnar parquet
    stored = spark.table(f"{table}_sigs")
    ib = explode_bands(stored).select("band_key", F.col("url").alias("url_idx"))
    salted = _salted_index_bands(ib, cfg)
    write_bucketed(
        salted.select(_jk(F.col("band_key"), F.col("salt")).alias("jk"),
                      "band_key", "salt", "url_idx"),
        f"{table}_bands", "jk", n_buckets, path=p("bands"))
    # the dim rows are a pure function of the per-band sizes: deriving them
    # from the sizes agg directly (explode + hash-agg over the stored sigs)
    # skips re-planning the full salted join a second time for this write
    # (n_salt is constant per band, so this equals max(n_salt) over salted)
    sizes = ib.groupBy("band_key").agg(F.count("*").alias("bucket_size"))
    write_bucketed(
        sizes.select("band_key",
                     F.ceil(F.col("bucket_size") / F.lit(cfg.bucket_cap))
                     .cast("int").alias("n_salt")),
        f"{table}_dim", "band_key", n_buckets, path=p("dim"))
    if path_root:
        # self-describing layout: a fresh driver (restarted continuous-crawl
        # deployment) re-registers the catalog entries from this manifest
        # via register_band_index — the bucket spec MUST match the writer
        import json
        import os

        os.makedirs(path_root, exist_ok=True)
        tmp = f"{path_root}/index.manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump({"n_buckets": n_buckets,
                       "tables": {"sigs": "url", "bands": "jk",
                                  "dim": "band_key"},
                       "config": {"k": cfg.k, "m": cfg.m, "t": cfg.t,
                                  "bands": cfg.bands, "rows": cfg.rows,
                                  "seed": cfg.seed, "threshold": cfg.threshold,
                                  "bucket_cap": cfg.bucket_cap}}, f, indent=2)
        os.replace(tmp, f"{path_root}/index.manifest.json")
    return {"sigs": f"{table}_sigs", "bands": f"{table}_bands",
            "dim": f"{table}_dim"}


def register_band_index(spark: SparkSession, table: str, path_root: str,
                        n_buckets: int | None = None) -> PipelineConfig:
    """Re-attach a persisted ``build_band_index`` layout in a NEW session.

    The session catalog here is in-memory (no Hive metastore — CLAUDE.md):
    a driver restart keeps the bucketed parquet under ``path_root`` but
    loses the catalog entries, without which ``cross_candidate_pairs_indexed``
    cannot run at all. This reads ``index.manifest.json`` (written by
    ``build_band_index``), re-issues the three CREATE TABLE ... CLUSTERED BY
    DDLs with the ORIGINAL bucket spec, and returns the PipelineConfig the
    index was built with — the caller must sign daily batches with the same
    config or band keys won't align. Plan property preserved: index-side
    scans stay ``Bucketed: true`` with zero index Exchange
    (tests/test_cross_session.py runs this in a fresh subprocess driver)."""
    import json

    from ..sources.io import register_bucketed

    with open(f"{path_root}/index.manifest.json") as f:
        man = json.load(f)
    if n_buckets is None:
        n_buckets = man["n_buckets"]
    elif n_buckets != man["n_buckets"]:
        raise ValueError(
            f"n_buckets={n_buckets} != manifest {man['n_buckets']}: the "
            "registered spec must match the files' writer")
    for suffix, bcol in man["tables"].items():
        register_bucketed(spark, f"{table}_{suffix}", f"{path_root}/{suffix}",
                          bcol, n_buckets)
    return PipelineConfig(**man["config"])


def cross_candidate_pairs_indexed(spark: SparkSession, new_sigs: DataFrame,
                                  table: str) -> DataFrame:
    """(url_new, url_idx) candidates of a batch vs a persisted band index.

    Plan shape (asserted in tests/test_plans.py): the two index-side scans
    (``<table>_dim``, ``<table>_bands``) are bucketed on their join keys, so
    the only Exchanges in the plan shuffle the SMALL batch side — first by
    band_key (salt-dim join), then by jk (band join). The index is never
    shuffled at query time."""
    dim = spark.table(f"{table}_dim")
    ib = spark.table(f"{table}_bands")
    nb = explode_bands(new_sigs).select("band_key", F.col("url").alias("url_new"))
    nbr = (
        nb.join(dim, "band_key")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.col("n_salt") - 1)))
        .select("url_new", _jk(F.col("band_key"), F.col("salt")).alias("jk"))
    )
    # equi-join on the single bucketed key ONLY — adding band_key/salt
    # equality (as join keys or as a filter, which Catalyst re-extracts
    # into join keys) makes join keys != bucket keys and the planner
    # disables the bucketed read; jk collisions are add-only and
    # verification-filtered (see _jk)
    return (
        nbr.join(ib.select("jk", "url_idx"), "jk")
        .select("url_new", "url_idx")
        .dropDuplicates(["url_new", "url_idx"])
    )


def cross_corpus_dup_pairs_indexed(spark: SparkSession, new_docs: DataFrame,
                                   table: str, cfg: PipelineConfig,
                                   index_docs: DataFrame | None = None,
                                   url_col: str = "url",
                                   text_col: str = "text",
                                   est_gate: float | None | str = "auto") -> DataFrame:
    """Verified near-dup pairs of a daily batch vs a ``build_band_index``
    table. Index signatures AND raw texts come from the bucketed
    ``<table>_sigs`` catalog table (no signature recompute, no index-side
    Exchange in the candidate join); pass ``index_docs`` only to override
    the stored texts. ``est_gate`` as in ``cross_corpus_dup_pairs`` —
    both paths gate identically by default (the equality test compares
    their full outputs)."""
    if est_gate == "auto":
        est_gate = est_prefilter_gate(cfg)
    sig_n = compute_signatures(new_docs, cfg, url_col, text_col).localCheckpoint()
    cand = cross_candidate_pairs_indexed(spark, sig_n, table).select(
        F.col("url_new").alias("url_a"), F.col("url_idx").alias("url_b"))
    sig_i = spark.table(f"{table}_sigs")
    sigs = sig_n.select("url", "sig").unionByName(sig_i.select("url", "sig"))
    idx_texts = (sig_i.select("url", "text") if index_docs is None
                 else index_docs.select(F.col(url_col).alias("url"),
                                        F.col(text_col).alias("text")))
    docs = (new_docs.select(F.col(url_col).alias("url"),
                            F.col(text_col).alias("text"))
            .unionByName(idx_texts))
    ver = verified_pairs(cand, sigs, docs, cfg, "url", "text",
                         checkpoint_sigs=False,  # parquet-backed + batch ckpt
                         est_gate=est_gate)
    return ver.select(F.col("url_a").alias("url_new"),
                      F.col("url_b").alias("url_idx"),
                      "est_sim", "jaccard", "is_dup")

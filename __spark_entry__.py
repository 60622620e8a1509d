"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-duplicate pipeline on sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2 + the
                   training-data operators); each takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL where expressible; omitted for
                   sketch/CC/approx stages (driver records rows-only).
"""

from __future__ import annotations

import functools

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.operators import dedup as D
from minhashsketch_spark.operators import multimodal as MM
from minhashsketch_spark.operators import similarity as S
from minhashsketch_spark.operators import text as TX
from minhashsketch_spark.operators.lsh import candidate_pairs
from minhashsketch_spark.operators.signatures import compute_signatures
from minhashsketch_spark.operators.verify import est_prefilter_gate, verified_pairs
from minhashsketch_spark.pipeline import run_pipeline

# band layout PLANNED from the S-curve (config.plan_bands: largest rows/band
# with recall >= 0.99 at the threshold) — resolves to 32 bands x 4 rows
CFG = PipelineConfig.from_threshold(k=9, m=1, t=128, threshold=0.7, seed=42)
assert (CFG.bands, CFG.rows) == (32, 4)


_TMP_DIRS: list[str] = []
_BIDX_SF: list[str] = []  # sf_dir the current mhs_cci_* index tables hold


def _entry_track_tmp(path: str) -> None:
    """Register a query-created temp dir for removal at interpreter exit
    (driver queries may run several times per session — e.g. bench reps —
    and must not leak a parquet copy of the corpus per invocation)."""
    import atexit
    import shutil

    if not _TMP_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _TMP_DIRS])
    _TMP_DIRS.append(path)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_as_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the pipeline's (url, text) shape: doc_id -> url string."""
    return _docs(spark, sf_dir).select(
        F.format_string("doc-%08d", F.col("doc_id")).alias("url"), "text")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full MinHash+LSH near-dup pipeline on sf0.001 documents."""
    docs = _docs_as_urls(spark, "/root/testdata/sf0.001")
    result = run_pipeline(spark, docs, CFG)
    return result["verified"].orderBy("url_a", "url_b")


# ---------------------------------------------------------------- queries

def _q_doc_shingle_counts(spark, sf_dir):
    # counts only: Catalyst can't prune inside the UDF, so don't compute
    # the 128 unused minhash columns (the signature stage is exercised by
    # minhash_signatures / minhash_candidates / near_dup_*)
    from minhashsketch_spark.operators.signatures import shingle_counts

    counts = shingle_counts(_docs_as_urls(spark, sf_dir), CFG)
    return counts.select(
        F.substring("url", 5, 8).cast("bigint").alias("doc_id"),
        "n_shingles")


CFG16 = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=42, threshold=0.7)


def _q_minhash_signatures(spark, sf_dir):
    """The per-document MinHash signature stage itself, bit-exact vs SQL:
    (doc_id, hash_idx, value) for a t=16 family — the HUGEINT oracle
    recomputes every (a*x+b) mod 2^64 %p minimum per doc per function."""
    sigs = compute_signatures(_docs_as_urls(spark, sf_dir), CFG16)
    return sigs.select(
        F.substring("url", 5, 8).cast("bigint").alias("doc_id"),
        F.posexplode("sig").alias("hash_idx", "value"))


CFG32 = PipelineConfig(k=9, m=1, t=32, bands=8, rows=4, seed=42, threshold=0.7)


def _q_minhash_candidates(spark, sf_dir):
    """The LSH candidate stage, bit-exact vs SQL at a t=32 / 8x4 layout
    (the DuckDB oracle recomputes minhash + the splitmix64 band-key
    avalanche in HUGEINT; at the flagship t=128 the same oracle is correct
    but ~100 s — the t=128 path stays covered end-to-end by near_dup_*)."""
    # checkpoint the signature frame itself (not the exploded bands copy
    # eager_if_python would otherwise materialize) — one UDF pass, and the
    # salting fan-out re-plans a cheap explode instead of storing
    # n_docs x bands rows twice
    sigs = compute_signatures(_docs_as_urls(spark, sf_dir), CFG32).localCheckpoint()
    return candidate_pairs(sigs, CFG32)


def _near_dup_exact_pairs(spark, sf_dir):
    """LSH candidates -> exact-Jaccard verification (north_star: 'exact
    Jaccard verification filters pairs'). Oracle-equal to the all-pairs
    DuckDB scan because LSH recall is 1.0 at these params on this corpus
    (32 bands x 4 rows: a pair at jaccard 0.8 is missed w.p. (1-0.8^4)^32
    ~= 5e-8; the planted clusters sit at >= 0.8).

    The signature frame is checkpointed ONCE here and shared by candidate
    generation and verification (checkpoint_sigs=False): the r5 shape let
    each consumer materialize its own copy, running the t=128 signature
    UDF twice per query (guide §1.2 — don't compute things twice)."""
    docs = _docs_as_urls(spark, sf_dir)
    sigs = compute_signatures(docs, CFG).localCheckpoint()
    pairs = candidate_pairs(sigs, CFG)
    # est-gate: the final filter is jaccard >= threshold, so the 6-sigma
    # est pre-gate drops only pairs that cannot reach it (verify.py)
    ver = verified_pairs(pairs, sigs, docs, CFG, checkpoint_sigs=False,
                         est_gate=est_prefilter_gate(CFG))
    return ver.filter(F.col("jaccard") >= F.lit(CFG.threshold))


def _q_near_dup_pairs(spark, sf_dir):
    return _near_dup_exact_pairs(spark, sf_dir).select(
        "url_a", "url_b", F.round("jaccard", 6).alias("jaccard"))


def _q_near_dup_containment(spark, sf_dir):
    """Asymmetric overlap report on the verified near-dup pairs:
    containment_a = |A∩B|/|A| (and symmetrically _b) — distinguishes
    "mirror copies" (both ~1) from "one page embeds the other" (one side
    ~1, jaccard lower). Candidate generation is the resemblance LSH, so
    this reports containment OVER near-dup pairs; standalone low-jaccard
    containment is substring_dups' job."""
    docs = _docs_as_urls(spark, sf_dir)
    sigs = compute_signatures(docs, CFG).localCheckpoint()
    pairs = candidate_pairs(sigs, CFG)
    ver = verified_pairs(pairs, sigs, docs, CFG, with_containment=True,
                         checkpoint_sigs=False,
                         est_gate=est_prefilter_gate(CFG))
    return (ver.filter(F.col("jaccard") >= F.lit(CFG.threshold))
            .select("url_a", "url_b", F.round("jaccard", 6).alias("jaccard"),
                    F.round("containment_a", 6).alias("containment_a"),
                    F.round("containment_b", 6).alias("containment_b")))


def _q_near_dup_clusters(spark, sf_dir):
    from minhashsketch_spark.operators.connected_components import connected_components

    # CC consumes the edge list more than once (count + collect/joins):
    # materialize the tiny pair set so the signature/LSH/verify pipeline
    # upstream runs exactly once (run_pipeline gets this from StageStore
    # parquet checkpoints; this standalone composition checkpoints in-memory)
    pairs = _near_dup_exact_pairs(spark, sf_dir).select("url_a", "url_b").localCheckpoint()
    return connected_components(pairs, CFG.max_cc_iterations)


def _q_exact_dedup(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir)).orderBy("fingerprint")


def _q_token_stats(spark, sf_dir):
    return TX.token_stats(_docs(spark, sf_dir))


def _q_quality_score(spark, sf_dir):
    return TX.quality_score(_docs(spark, sf_dir))


def _q_language_id(spark, sf_dir):
    return TX.language_id(_docs(spark, sf_dir))


def _q_md5_fingerprint(spark, sf_dir):
    return TX.md5_fingerprint(_docs(spark, sf_dir))


def _q_winnow_fingerprint(spark, sf_dir):
    # exploded (doc_id, fp) rows: array columns break the driver's
    # canonicalizer, and the flat shape is DuckDB-oracle-expressible
    fp = TX.winnowing_fingerprint(_docs(spark, sf_dir))
    return fp.select("doc_id", F.explode("fingerprint").alias("fp"))


def _q_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), min_jaccard=0.02)


def _q_simhash_pairs(spark, sf_dir):
    # max_hamming=3: the 4x15-bit pigeonhole blocking is exact at radius 3,
    # so the result equals the oracle's brute-force hamming scan
    sim = D.simhash(_docs(spark, sf_dir))
    return D.simhash_near_pairs(sim, max_hamming=3)


CFG_M4 = PipelineConfig(k=9, m=4, t=32, bands=16, rows=2, seed=42, threshold=0.7)


def _q_near_dup_pairs_m4(spark, sf_dir):
    """General-m distributed pipeline at the reference's published shape
    class (m>1, git_picture/running_example1.png is m=9): bottom-4 sketches,
    bands over 2 functions x 4 values, two-pointer estimator verification."""
    from minhashsketch_spark.operators.signatures import compute_signatures_m
    from minhashsketch_spark.operators.verify import minhash_estimate_m

    docs = _docs_as_urls(spark, sf_dir)
    # one checkpointed signature pass shared by candidates + both estimator
    # join sides (the r5 shape re-planned the signature UDF up to 3x)
    sigs = compute_signatures_m(docs, CFG_M4).localCheckpoint()
    pairs = candidate_pairs(sigs, CFG_M4)
    est = minhash_estimate_m(pairs, sigs, CFG_M4)
    return (est.filter(F.col("est_sim") >= CFG_M4.threshold)
            .select("url_a", "url_b", F.round("est_sim", 6).alias("est_sim")))


def _q_embedding_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return S.cosine_topk(emb, queries, k=10)


def _q_embedding_topk_lsh(spark, sf_dir):
    # n_planes sizes buckets to the corpus (2^planes buckets; planes should
    # grow ~log2(n/target_bucket) at scale): 8 planes over the small-sf
    # corpora keeps ~n/256 vectors per bucket so each query's 9 probed
    # buckets return a meaningful candidate set (~40+ of the 50 exact rows)
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return S.lsh_cosine_topk(emb, queries, k=10, n_planes=8)


def _q_embedding_topk_ivf(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return S.ivf_cosine_topk(emb, queries, k=10, n_centroids=16, nprobe=6)


def _q_embedding_near_dup(spark, sf_dir):
    # testdata embeddings are unplanted random vectors (pairwise cosine max
    # ~0.51 at sf0.01) — threshold 0.4 keeps the check non-vacuous here;
    # recall vs brute force is pinned by pytest on a planted corpus
    return S.embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.4,
                                      n_tables=8, n_planes=5)


def _q_substring_dups(spark, sf_dir):
    """Pairs sharing an exact >=64-byte substring. The winnowing guarantee
    (a shared substring of length >= w+k-1 shares a fingerprint) plus the
    operator-default min_shared/max_df give candidate recall 1.0 here, so
    the rolling-hash-verified result equals the oracle's brute 64-byte-gram
    self-join; lcs_len itself stays pytest-verified (not SQL-expressible)."""
    from minhashsketch_spark.operators.substring import substring_dup_pairs

    pairs = substring_dup_pairs(_docs_as_urls(spark, sf_dir), k=8, w=16,
                                min_shared=2, min_lcs=64, max_df=24)
    return pairs.filter("is_substring_dup").select("url_a", "url_b")


def _q_corpus_sketch(spark, sf_dir):
    from minhashsketch_spark.operators.corpus_sketch import corpus_sketch_df
    from minhashsketch_spark.config import PipelineConfig

    cfg = PipelineConfig(k=9, m=4, t=16, bands=4, rows=4, seed=42, threshold=0.7)
    return corpus_sketch_df(_docs(spark, sf_dir), cfg)


def _q_multimodal_features(spark, sf_dir):
    # fake=False: payloads are real binary PPMs (built from text bytes) and
    # go through the actual container parse + decode; hist bins are exact
    # ints so the DuckDB oracle compares without float-rounding hazards
    media = MM.media_from_documents(_docs(spark, sf_dir))
    feats = MM.extract_features(media, fake=False)
    return feats.select("media_id", "kind", "n_bytes",
                        F.element_at("hist", 1).alias("h0"),
                        F.element_at("hist", 25).alias("h24"))


def _jpeg_payload_from_text(txt: str) -> bytes:
    """Deterministic 12x12 RGB image from a doc's first 432 utf-8 bytes
    (zero-padded), encoded as a REAL baseline JPEG — 4:2:0 with restart
    markers so the general decoder paths run, not just the 4:4:4 one."""
    import numpy as np

    from minhashsketch_spark.core.jpeg import encode_baseline_jpeg

    raw = np.frombuffer(txt.encode("utf-8")[:432], np.uint8)
    buf = np.zeros(432, np.uint8)
    buf[:raw.size] = raw
    return encode_baseline_jpeg(buf.reshape(12, 12, 3), subsampling="420",
                                restart_interval=2)


def _q_jpeg_features(spark, sf_dir):
    """Baseline-JPEG decode (core/jpeg.py, pure-NumPy T.81) through the
    distributed Arrow feature UDF: per-doc JPEG payloads are built in one
    mapInPandas pass and extract_features decodes the real bytes
    (fake=False). Semi-oracle: a VALUES table recomputed driver-side with
    the same public codec over pyarrow-read parquet (the driver runs
    oracles at sf0.01 only — documented coupling, IVF precedent); codec
    correctness itself is pinned by roundtrip pytests."""
    import pandas as pd

    from minhashsketch_spark.partitioning import ensure_parallelism

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].values,
                "kind": "image",
                "payload": [bytearray(_jpeg_payload_from_text(t))
                            for t in pdf["text"].values],
            })

    media = ensure_parallelism(
        _docs(spark, sf_dir).select("doc_id", "text")).mapInPandas(
        gen, schema="media_id bigint, kind string, payload binary")
    feats = MM.extract_features(media, fake=False)
    return feats.select("media_id", "n_bytes",
                        F.element_at("hist", 1).alias("h0"),
                        F.element_at("hist", 25).alias("h24"))


def _q_contamination(spark, sf_dir):
    """Benchmark decontamination stats (GPT-3-style 13-gram rule): the
    benchmark is the deterministic doc_id %% 97 == 0 slice of the corpus
    itself, so every benchmark doc self-contaminates and near-dup cluster
    members of benchmark docs show partial overlap — non-vacuous on the
    planted-cluster testdata. All-integer output; the 60-bit md5-prefix
    n-gram keys are cross-engine identical (sampling.hash60_expr
    construction), so the oracle is exact."""
    from minhashsketch_spark.operators.decontam import contamination_stats

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_stats(docs, bench, n=13)


def _q_exact_dedup_corpus(spark, sf_dir):
    from minhashsketch_spark.operators.dedup_corpus import exact_dedup_corpus

    return exact_dedup_corpus(_docs(spark, sf_dir)).select("doc_id", "n_chars")


def _q_near_dedup_corpus(spark, sf_dir):
    from minhashsketch_spark.operators.connected_components import connected_components
    from minhashsketch_spark.operators.dedup_corpus import near_dedup_corpus

    docs = _docs_as_urls(spark, sf_dir)
    pairs = _near_dup_exact_pairs(spark, sf_dir).select("url_a", "url_b").localCheckpoint()
    clusters = connected_components(pairs, CFG.max_cc_iterations)
    return near_dedup_corpus(docs, clusters).select("url")


def _q_domain_stats(spark, sf_dir):
    """Per-domain crawl stats over the url_dedup-style fabricated hosts;
    every fifth doc is replaced by shared boilerplate so n_dup_docs is
    non-vacuous (sf0.01 testdata has no exact dups naturally)."""
    from minhashsketch_spark.operators.urls import domain_stats

    docs = _docs(spark, sf_dir)
    url = F.format_string("https://host%d.example.com/p/%d",
                          F.col("doc_id") % 7, F.col("doc_id"))
    text = (F.when(F.col("doc_id") % 5 == 0, F.lit("shared boilerplate page"))
            .otherwise(F.col("text")))
    return domain_stats(docs.select(url.alias("url"), text.alias("text")))


def _q_corpus_splits(spark, sf_dir):
    """Deterministic hash splits (train/val/test) + a 10% sample — the
    reproducible-subset operator a training pipeline runs before anything
    else. Output: per-split doc counts + a value fingerprint (bit_xor of
    the split members' hashes) so the oracle checks MEMBERSHIP, not just
    sizes."""
    from minhashsketch_spark.operators.sampling import hash60_expr, hash_split

    docs = _docs(spark, sf_dir).withColumn(
        "url", F.format_string("doc-%08d", F.col("doc_id")))
    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    return (split.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.bit_xor(hash60_expr("url")).alias("member_xor"))
            .filter(F.col("split").isNotNull()))


def _q_near_dedup_best(spark, sf_dir):
    """Quality-aware keeper selection: the near-dup clusters keep their
    HIGHEST-quality member (ties by min url) instead of the lexicographic
    min — what a training pipeline actually wants. The ordering score is
    the UNROUNDED quality product: +,-,*,/ are IEEE-exact across engines,
    so the window order is bit-deterministic (a round() could tie-break
    differently per engine's rounding mode)."""
    from minhashsketch_spark.operators.connected_components import connected_components
    from minhashsketch_spark.operators.dedup_corpus import near_dedup_corpus_best

    docs = _docs_as_urls(spark, sf_dir)
    pairs = _near_dup_exact_pairs(spark, sf_dir).select("url_a", "url_b").localCheckpoint()
    clusters = connected_components(pairs, CFG.max_cc_iterations)
    text = F.col("text")
    n = F.length(text)
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[^!.,;:?]", ""))
    ntok = F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(F.trim(text), r"\s+")))
    score = F.when(n == 0, F.lit(0.0)).otherwise(
        100.0 * (1.0 - digits.cast("double") / n)
        * (1.0 - punct.cast("double") / n)
        * F.least(F.lit(1.0), ntok.cast("double") / 100.0))
    return near_dedup_corpus_best(docs, clusters, score).select("url")


_CLIPS = [f"/root/reference/testing_files/sequence_clip{i}.fasta" for i in (1, 2, 3)]


def _q_dna_similarity(spark, sf_dir):
    """Reference parity in the driver: clip FASTAs through the Spark DNA
    path (SpookyHash k-mer sketches + computeSim); the oracle is a literal
    VALUES table of goldens produced by the reference compiled from its own
    sources (tests/goldens_refcompiled.json, see tests/golden_gen/)."""
    from minhashsketch_spark.operators.dna import (
        dna_signatures, dna_similarity, fasta_documents)

    docs = fasta_documents(spark, _CLIPS)
    sig5 = dna_signatures(docs, k=5, m=10, t=10, seed=123)
    sim5 = (dna_similarity(sig5, t=10, m=10)
            .filter(F.col("doc_a") == "sequence_clip1")
            .withColumn("k", F.lit(5)))
    docs12 = docs.filter(F.col("doc_id") != "sequence_clip3")
    sig31 = dna_signatures(docs12, k=31, m=9, t=5, seed=540484695)
    sim31 = dna_similarity(sig31, t=5, m=9).withColumn("k", F.lit(31))
    return sim5.unionByName(sim31).select(
        "doc_a", "doc_b", "k", F.round("similarity", 8).alias("similarity"))


def _q_dna_sketches(spark, sf_dir):
    """Every sketch value of the clip FASTAs at both golden configs,
    exploded to (doc_id, k, hash_idx, rank, value) rows — the driver-level
    bit-for-bit parity check against the ref-compiled sketches."""
    from minhashsketch_spark.operators.dna import dna_signatures, fasta_documents

    docs = fasta_documents(spark, _CLIPS)

    def explode_sig(sig_df, k, m):
        return sig_df.select(
            "doc_id", F.lit(k).alias("k"),
            F.posexplode("sig").alias("pos", "value")
        ).select(
            "doc_id", "k",
            (F.col("pos") / m).cast("int").alias("hash_idx"),
            F.pmod("pos", F.lit(m)).cast("int").alias("rank"),
            "value")

    s5 = explode_sig(dna_signatures(docs, k=5, m=10, t=10, seed=123), 5, 10)
    s31 = explode_sig(
        dna_signatures(docs.filter(F.col("doc_id") != "sequence_clip3"),
                       k=31, m=9, t=5, seed=540484695), 31, 9)
    return s5.unionByName(s31)


def _corpus_sketch_oracle(k: int = 9, m: int = 4, t: int = 16, seed: int = 42) -> str:
    """DuckDB replica of operators/corpus_sketch.py at the driver config:
    rolling-poly shingle hashes (hex-pair byte access) -> distinct union set
    -> per-function (a*x+b) mod 2^64 then the conditional-subtract %p
    (2^64 < 2p) -> bottom-m distinct. a*x is split into 32-bit halves to
    stay inside INT128. The (a,b) family literals come from the same
    MT19937 generator the Spark side broadcasts."""
    from minhashsketch_spark.core.shingles import get_family

    p = 3 * 2**62 + 17
    a, b = get_family(t, seed)
    m_const = 0x9E3779B97F4A7C15
    pows = [pow(m_const, k - 1 - j, 2**64) for j in range(k)]
    terms = " + ".join(
        f"((('0x' || substr(h, 2*(i+{j})-1, 2))::BIGINT)::HUGEINT * {pows[j]}::HUGEINT)"
        for j in range(k))
    fam = ", ".join(f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
                    for j in range(t))
    w64 = "18446744073709551616::HUGEINT"
    return f"""
        WITH hx AS (
          SELECT hex(encode(text)) AS h, octet_length(encode(text)) AS n
          FROM documents WHERE octet_length(encode(text)) >= {k}
        ),
        sh AS (
          SELECT DISTINCT (({terms}) % {w64}) AS x
          FROM hx, unnest(range(1, n - {k} + 2)) AS t(i)
        ),
        fam(j, a, b) AS (VALUES {fam}),
        hv AS (
          SELECT DISTINCT j,
            CASE WHEN h1 >= {p}::HUGEINT THEN h1 - {p}::HUGEINT ELSE h1 END AS v
          FROM (
            SELECT j,
              ((a * (x % 4294967296::HUGEINT))
               + ((a * (x // 4294967296::HUGEINT)) % 4294967296::HUGEINT)
                 * 4294967296::HUGEINT
               + b) % {w64} AS h1
            FROM fam, sh)
        ),
        ranked AS (
          SELECT j, v, row_number() OVER (PARTITION BY j ORDER BY v) AS rk FROM hv
        )
        SELECT j AS hash_idx, (rk - 1)::INT AS rank,
               CASE WHEN v >= 9223372036854775808::HUGEINT
                    THEN (v - {w64})::BIGINT ELSE v::BIGINT END AS value
        FROM ranked WHERE rk <= {m}
    """


def _xor64(x: str, y: str) -> str:
    """xor of two mod-2^64 values held in HUGEINT, via 32-bit halves
    (DuckDB's xor() takes BIGINT)."""
    return (f"(xor(({x} // 4294967296::HUGEINT)::BIGINT, "
            f"({y} // 4294967296::HUGEINT)::BIGINT)::HUGEINT"
            f" * 4294967296::HUGEINT"
            f" + xor(({x} % 4294967296::HUGEINT), ({y} % 4294967296::HUGEINT))::HUGEINT)")


def _shr64(x: str, s: int) -> str:
    return f"({x} // {1 << s}::HUGEINT)"


def _mul64(x: str, c: int) -> str:
    """(c * x) mod 2^64 with x split into 32-bit halves (a full 64x64
    product overflows INT128)."""
    w64 = "18446744073709551616::HUGEINT"
    return (f"(({c}::HUGEINT * ({x} % 4294967296::HUGEINT)"
            f" + (({c}::HUGEINT * ({x} // 4294967296::HUGEINT)) % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT) % {w64})")


def _minhash_candidates_oracle(k: int = 9, t: int = 32, bands: int = 8,
                               rows: int = 4, seed: int = 42) -> str:
    """LSH candidate pairs in DuckDB: per-doc minhash (HUGEINT), reshape
    into bands x rows, then the band-key splitmix64 avalanche
    (core/shingles.py band_keys_batch) as a generated CTE chain — xor and
    mul are done in 32-bit halves, shifts are integer division. Pairs =
    docs sharing (band, key). Buckets here are far below bucket_cap, so
    the Spark side applies no salting/chains (salt=0 paths only)."""
    from minhashsketch_spark.core.shingles import get_family

    p = 3 * 2**62 + 17
    a, b = get_family(t, seed)
    m_const = 0x9E3779B97F4A7C15
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    pows = [pow(m_const, k - 1 - j, 2**64) for j in range(k)]
    terms = " + ".join(
        f"((('0x' || substr(h, 2*(i+{j})-1, 2))::BIGINT)::HUGEINT * {pows[j]}::HUGEINT)"
        for j in range(k))
    fam = ", ".join(f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
                    for j in range(t))
    w64 = "18446744073709551616::HUGEINT"

    ctes, prev, col, step, acc = [], "bandvals", None, 0, "acc0"
    for r in range(rows):
        step += 1
        keep = ", ".join(f"v{q}" for q in range(r + 1, rows))
        keep = (", " + keep) if keep else ""
        ctes.append(f"s{step} AS (SELECT doc_id, band{keep}, "
                    f"((v{r} + {acc}) % {w64}) AS x{step} FROM {prev})")
        prev, col = f"s{step}", f"x{step}"
        for op in (lambda e: _xor64(e, _shr64(e, 30)),
                   lambda e: _mul64(e, c1),
                   lambda e: _xor64(e, _shr64(e, 27)),
                   lambda e: _mul64(e, c2),
                   lambda e: _xor64(e, _shr64(e, 31))):
            step += 1
            ctes.append(f"s{step} AS (SELECT doc_id, band{keep}, "
                        f"{op(col)} AS x{step} FROM {prev})")
            prev, col = f"s{step}", f"x{step}"
        acc = col

    bandcols = ", ".join(
        f"max(CASE WHEN j % {rows} = {r} THEN v END) AS v{r}" for r in range(rows))
    return f"""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
          FROM documents WHERE octet_length(encode(text)) >= {k}
        ),
        sh AS (SELECT DISTINCT doc_id, (({terms}) % {w64}) AS x
               FROM hx, unnest(range(1, n - {k} + 2)) AS t(i)),
        fam(j, fa, fb) AS (VALUES {fam}),
        hv AS (
          SELECT doc_id, j,
            min(CASE WHEN h1 >= {p}::HUGEINT THEN h1 - {p}::HUGEINT ELSE h1 END) AS v
          FROM (SELECT doc_id, j,
                  ((fa * (x % 4294967296::HUGEINT))
                   + ((fa * (x // 4294967296::HUGEINT)) % 4294967296::HUGEINT)
                     * 4294967296::HUGEINT
                   + fb) % {w64} AS h1
                FROM fam, sh)
          GROUP BY doc_id, j
        ),
        bandvals AS (
          SELECT doc_id, (j // {rows}) AS band,
                 (({m_const}::HUGEINT + (j // {rows})::HUGEINT * {c1}::HUGEINT)
                  % {w64}) AS acc0,
                 {bandcols}
          FROM hv GROUP BY doc_id, j // {rows}
        ),
        {', '.join(ctes)},
        keys AS (SELECT doc_id, band, {col} AS key FROM {prev})
        SELECT DISTINCT printf('doc-%08d', a.doc_id) AS url_a,
                        printf('doc-%08d', b.doc_id) AS url_b
        FROM keys a
        JOIN keys b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """


def _near_dup_m4_oracle(k: int = 9, m: int = 4, t: int = 32, seed: int = 42,
                        threshold: float = 0.7) -> str:
    """General-m estimator in DuckDB: bottom-m distinct per (doc, function)
    via rank, then the per-function two-pointer match count == an
    inverted-index join on (function, value) because the m-lists are
    distinct sets (no UINT64_MAX padding on this corpus — every doc has
    >= m distinct hashes; with padding the reference counts min(#pads),
    which a distinct-value join would not — quirk Q2, pytest-covered)."""
    from minhashsketch_spark.core.shingles import get_family

    p = 3 * 2**62 + 17
    a, b = get_family(t, seed)
    m_const = 0x9E3779B97F4A7C15
    pows = [pow(m_const, k - 1 - j, 2**64) for j in range(k)]
    terms = " + ".join(
        f"((('0x' || substr(h, 2*(i+{j})-1, 2))::BIGINT)::HUGEINT * {pows[j]}::HUGEINT)"
        for j in range(k))
    fam = ", ".join(f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
                    for j in range(t))
    w64 = "18446744073709551616::HUGEINT"
    return f"""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
          FROM documents WHERE octet_length(encode(text)) >= {k}
        ),
        sh AS (SELECT DISTINCT doc_id, (({terms}) % {w64}) AS x
               FROM hx, unnest(range(1, n - {k} + 2)) AS t(i)),
        fam(j, a, b) AS (VALUES {fam}),
        hv AS (
          SELECT DISTINCT doc_id, j,
            CASE WHEN h1 >= {p}::HUGEINT THEN h1 - {p}::HUGEINT ELSE h1 END AS v
          FROM (SELECT doc_id, j,
                  ((a * (x % 4294967296::HUGEINT))
                   + ((a * (x // 4294967296::HUGEINT)) % 4294967296::HUGEINT)
                     * 4294967296::HUGEINT
                   + b) % {w64} AS h1
                FROM fam, sh)
        ),
        bot AS (
          SELECT doc_id, j, v FROM (
            SELECT doc_id, j, v,
                   row_number() OVER (PARTITION BY doc_id, j ORDER BY v) AS rk
            FROM hv) WHERE rk <= {m}
        ),
        matches AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS nm
          FROM bot a JOIN bot b ON a.j = b.j AND a.v = b.v AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT printf('doc-%08d', id_a) AS url_a,
               printf('doc-%08d', id_b) AS url_b,
               round(nm / {t * m}.0, 6) AS est_sim
        FROM matches WHERE nm / {t * m}.0 >= {threshold}
    """


def _minhash_signatures_oracle(k: int = 9, t: int = 16, seed: int = 42) -> str:
    """Per-document m=1 signatures in DuckDB: same HUGEINT machinery as the
    corpus-sketch oracle, min grouped by (doc, function)."""
    from minhashsketch_spark.core.shingles import get_family

    p = 3 * 2**62 + 17
    a, b = get_family(t, seed)
    m_const = 0x9E3779B97F4A7C15
    pows = [pow(m_const, k - 1 - j, 2**64) for j in range(k)]
    terms = " + ".join(
        f"((('0x' || substr(h, 2*(i+{j})-1, 2))::BIGINT)::HUGEINT * {pows[j]}::HUGEINT)"
        for j in range(k))
    fam = ", ".join(f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
                    for j in range(t))
    w64 = "18446744073709551616::HUGEINT"
    return f"""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
          FROM documents WHERE octet_length(encode(text)) >= {k}
        ),
        sh AS (
          SELECT DISTINCT doc_id, (({terms}) % {w64}) AS x
          FROM hx, unnest(range(1, n - {k} + 2)) AS t(i)
        ),
        fam(j, a, b) AS (VALUES {fam}),
        hv AS (
          SELECT doc_id, j,
            min(CASE WHEN h1 >= {p}::HUGEINT THEN h1 - {p}::HUGEINT ELSE h1 END) AS v
          FROM (
            SELECT doc_id, j,
              ((a * (x % 4294967296::HUGEINT))
               + ((a * (x // 4294967296::HUGEINT)) % 4294967296::HUGEINT)
                 * 4294967296::HUGEINT
               + b) % {w64} AS h1
            FROM fam, sh)
          GROUP BY doc_id, j
        )
        SELECT doc_id, j::INT AS hash_idx,
               CASE WHEN v >= 9223372036854775808::HUGEINT
                    THEN (v - {w64})::BIGINT ELSE v::BIGINT END AS value
        FROM hv
    """


def _dna_oracles() -> dict[str, str]:
    import json
    import os

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "goldens_refcompiled.json")) as f:
        g = json.load(f)

    def signed(v: int) -> int:
        return v - 2**64 if v >= 2**63 else v

    sim_rows = [
        ("sequence_clip1", "sequence_clip2", 5, g["sim_clip12_k5"]),
        ("sequence_clip1", "sequence_clip3", 5, g["sim_clip13_k5"]),
        ("sequence_clip1", "sequence_clip2", 31, g["sim_clip12_k31"]),
    ]
    sim_values = ", ".join(
        f"('{a}', '{b}', {k}, {float(s)}::DOUBLE)" for a, b, k, s in sim_rows)

    sk_rows = []
    for clip in (1, 2, 3):
        for j, lst in enumerate(g[f"sig_clip{clip}_k5"]):
            sk_rows += [(f"sequence_clip{clip}", 5, j, r, signed(v))
                        for r, v in enumerate(lst)]
    for clip in (1, 2):
        for j, lst in enumerate(g[f"sig_clip{clip}_k31"]):
            sk_rows += [(f"sequence_clip{clip}", 31, j, r, signed(v))
                        for r, v in enumerate(lst)]
    sk_values = ", ".join(
        f"('{d}', {k}, {h}, {r}, {v}::BIGINT)" for d, k, h, r, v in sk_rows)

    return {
        "dna_similarity": f"""
            SELECT * FROM (VALUES {sim_values})
            AS t(doc_a, doc_b, k, similarity)
        """,
        "dna_sketches": f"""
            SELECT * FROM (VALUES {sk_values})
            AS t(doc_id, k, hash_idx, rank, value)
        """,
    }


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") * 100).cast("bigint").alias("sum_qty_c"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("bigint").alias("revenue_c"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_revenue_by_nation(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("revenue_c"))
        .orderBy("n_name")
    )


def _q_top_events_per_user(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id", "event_type", "value")
    )


def _q_event_type_stats(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.round(F.sum("value") * 100).cast("bigint").alias("value_c"))
        .orderBy("event_type")
    )


def _q_tpch_q3_like(spark, sf_dir):
    """3-way join + filter + agg + top-k (scan->SMJ/broadcast->window)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
             .cast("bigint").alias("revenue_c"),
             F.count("*").alias("n_lines"))
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_audio_stats(spark, sf_dir):
    """Audio path of the multimodal family: doc bytes as raw PCM16 clips ->
    exact integer features (sample count, energy, zero crossings)."""
    media = MM.audio_from_documents(_docs(spark, sf_dir))
    return MM.audio_features(media)


def _q_html_extract(spark, sf_dir):
    """The crawl pipeline's first step (input_hint: html:binary -> text).
    Driver testdata carries no html column, so the query assembles the real
    binary html container JVM-side (encode + binary concat — the same
    pattern media_from_documents uses for PPM) and the oracle re-runs the
    identical wrap + extract in DuckDB; byte-identity of extraction against
    genuinely stored html is pinned by pytest on the in-repo corpus."""
    from minhashsketch_spark.operators.extract import extract_text

    docs = _docs(spark, sf_dir)
    # entity gauntlet appended inside the body: curly quote (dec), emoji
    # (hex, 4-byte), nbsp, capital-X hex, amp-guard (&amp;#65; must stay a
    # literal &#65;), the chained ref &#38;lt; (must stay a literal &lt; —
    # ADVICE r4 single-pass guard), an out-of-range ref (left literal), and
    # named entities — the oracle re-runs the identical wrap + extract
    html = F.concat(F.lit(b"<html><body>"), F.encode("text", "utf-8"),
                    F.lit(b"</body><p>&#8217;s &#x1F600; a&#xA0;b &#X41; "
                          b"&amp;#65; &#38;lt; &#1114112; &lt;x&gt;&quot;&#39;"
                          b"</p></html>"))
    wrapped = docs.select("doc_id", html.alias("html"))
    ext = extract_text(wrapped, html_col="html", out_col="extracted_text")
    return ext.select(
        "doc_id",
        F.md5("extracted_text").alias("extracted_md5"),
        F.length("extracted_text").alias("n_chars"))


def _q_warc_roundtrip(spark, sf_dir):
    """Crawl-native source format: documents -> deterministic WARC bytes
    (sources/warc.write_warc_bytes, one member-per-record .warc.gz per
    partition, written by the executors) -> the binaryFile-based
    warc_documents reader -> (url, html_md5, n_bytes). The round-trip must
    be the IDENTITY on the page bytes, so the oracle is plain SQL over the
    documents table — no WARC logic on the DuckDB side at all."""
    import os
    import tempfile
    import uuid

    import pandas as pd

    from minhashsketch_spark.partitioning import ensure_parallelism
    from minhashsketch_spark.sources.warc import warc_documents, write_warc_bytes

    tmp = tempfile.mkdtemp(prefix="mhs_warc_")
    _entry_track_tmp(tmp)
    docs = _docs_as_urls(spark, sf_dir).select("url", "text")

    def dump(batches):
        pages = []
        for pdf in batches:
            for u, t in zip(pdf["url"].values, pdf["text"].values):
                pages.append((u, "2020-01-01T00:00:00Z",
                              (t or "").encode("utf-8")))
        if pages:
            path = os.path.join(tmp, f"part-{uuid.uuid4().hex}.warc.gz")
            with open(path, "wb") as f:
                f.write(write_warc_bytes(sorted(pages)))
        yield pd.DataFrame({"n": [len(pages)]})

    ensure_parallelism(docs).mapInPandas(dump, schema="n bigint")         .write.format("noop").mode("overwrite").save()
    back = warc_documents(spark, os.path.join(tmp, "*.warc.gz"))
    return back.select(
        "url", F.md5("html").alias("html_md5"),
        F.octet_length("html").cast("bigint").alias("n_bytes"))


def _q_pii_scrub(spark, sf_dir):
    """PII detection + redaction (emails -> IPs -> phones, fixed order so
    the loosest pattern can't eat the structured ones). Testdata text has
    no natural PII, so a deterministic per-doc gauntlet is appended on
    BOTH engine sides (the html_extract wrap pattern): an email, an IPv4,
    and — on doc_id % 3 == 0 only — a phone number. Patterns restricted
    to the Java/RE2-identical regex subset; output is integer counts +
    md5/length of the scrubbed text."""
    from minhashsketch_spark.operators.pii import pii_report

    docs = _docs(spark, sf_dir)
    gauntlet = F.concat(
        F.col("text"),
        F.format_string(" contact u%d@ex%d.example.com from 10.%d.0.%d",
                        F.col("doc_id"), F.pmod(F.col("doc_id"), F.lit(7)),
                        F.pmod(F.col("doc_id"), F.lit(256)),
                        F.pmod(F.col("doc_id"), F.lit(250))),
        F.when(F.col("doc_id") % 3 == 0,
               F.format_string(" tel +1-555-%03d-0199",
                               F.pmod(F.col("doc_id"), F.lit(1000))))
        .otherwise(F.lit("")))
    # one narrow pass (pii_report): counts + scrubbed text share the same
    # progressive-redaction chain, so the r5 counts-join-scrub shape ran
    # the three regexes twice and shuffled the corpus for the join
    wrapped = docs.select("doc_id", gauntlet.alias("text"))
    rep = pii_report(wrapped)
    return rep.select("doc_id", "n_emails", "n_ips", "n_phones", "has_pii",
                      F.md5("scrubbed").alias("scrubbed_md5"),
                      F.length("scrubbed").alias("scrubbed_len"))


def _q_robots_filter(spark, sf_dir):
    """robots.txt compliance over fabricated per-host policies: each of 7
    hosts disallows two /p<digit> path buckets (one via a star group that
    also contains comments/empty-Disallow noise, one via a multi-header
    group), plus a googlebot-only rule that must NOT apply. The oracle is
    CLOSED-FORM (the modular rule the fixture encodes) — fully independent
    of the parser, so it validates parse+group+prefix-match end to end."""
    from minhashsketch_spark.operators.robots import robots_compliance

    docs = _docs(spark, sf_dir)
    host = F.concat(F.lit("host"), F.pmod("doc_id", F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/p"),
                   F.pmod("doc_id", F.lit(10)).cast("string"),
                   F.lit("/"), F.col("doc_id").cast("string"))
    d = docs.select("doc_id", url.alias("url"))
    robots = spark.createDataFrame(
        [(f"host{k}.example.com",
          "# crawl policy\nUser-agent: googlebot\nDisallow: /private\n\n"
          f"User-agent: *\nDisallow: /p{k}\nDisallow:\n\n"
          f"User-agent: otherbot\nUser-agent: *\nDisallow: /p{(k + 3) % 10}")
         for k in range(7)],
        "domain string, robots_txt string")
    return robots_compliance(d, robots).select("doc_id", "url",
                                               "robots_disallowed")


def _q_compression_ratio(spark, sf_dir):
    """DEFLATE compressibility quality signal (Gopher/Dolma-style): all
    integers; the oracle recomputes with the same stdlib zlib at the same
    level over pyarrow-read parquet (bit-deterministic), cached like the
    jpeg semi-oracle."""
    from minhashsketch_spark.operators.text import compression_ratio

    return compression_ratio(_docs(spark, sf_dir))


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style within-doc repetition quality signals — highly
    non-vacuous on the tiny-vocabulary testdata (every doc repeats
    tokens heavily)."""
    return TX.repetition_stats(_docs(spark, sf_dir))


def _q_tfidf_top_terms(spark, sf_dir):
    # the idf scalar N comes from the parquet footer (row-count metadata, no
    # data scan) — the "manifest, not a count() job" shape text.py asks for
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return TX.tfidf_top_terms(_docs(spark, sf_dir), k=3, n_docs=n)


def _q_cross_corpus_dups(spark, sf_dir):
    """Incremental-crawl shape: near-dups of an incoming batch (odd doc_ids)
    against an existing index (even doc_ids) — new x index band join, no
    self-join on either side. Oracle-equal to the all-pairs scan restricted
    to cross-parity pairs by the same recall-1.0 argument as
    near_dup_pairs (32x4 bands at this corpus's planted >= 0.8 clusters)."""
    from minhashsketch_spark.operators.cross_dedup import cross_corpus_dup_pairs

    docs = _docs_as_urls(spark, sf_dir)
    par = F.substring("url", 5, 8).cast("bigint") % 2
    ver = cross_corpus_dup_pairs(docs.filter(par == 1), docs.filter(par == 0), CFG)
    return (ver.filter(F.col("jaccard") >= F.lit(CFG.threshold))
            .select("url_new", "url_idx", F.round("jaccard", 6).alias("jaccard")))


def _q_line_dedup(spark, sf_dir):
    """CCNet/Gopher-style line-level boilerplate removal. Testdata docs are
    single-line, so the fixture assembles a crawl-shaped page per doc
    (shared header/footer -> df=all, dropped; CATEGORY doc_id%7 -> df~71,
    dropped at min_df=5; body + ID line -> df=1, kept in order) — the
    oracle builds the identical page in SQL."""
    from minhashsketch_spark.operators.dedup_corpus import line_dedup_stats

    docs = _docs(spark, sf_dir)
    page = F.concat_ws(
        "\n",
        F.lit("SHARED HEADER"),
        F.concat(F.lit("CATEGORY "), (F.col("doc_id") % 7).cast("string")),
        F.col("text"),
        F.concat(F.lit("ID "), F.col("doc_id").cast("string")),
        F.lit("SHARED FOOTER"))
    return line_dedup_stats(docs.select("doc_id", page.alias("text")), min_df=5)


def _q_url_dedup(spark, sf_dir):
    """URL canonicalization + URL-level dedup (the crawl pipeline's step
    zero). Testdata has no url column, so the fixture fabricates messy
    variants deterministically: docs 2k/2k+1 point at the same page
    through different spellings (case, default port, empty query,
    fragment), every tenth doc is an un-parseable string — the oracle
    fabricates and normalizes identically."""
    from minhashsketch_spark.operators.urls import url_dedup_stats

    docs = _docs(spark, sf_dir)
    base = (F.col("doc_id") / 2).cast("bigint")
    v = F.col("doc_id") % 4
    url = (
        F.when(F.col("doc_id") % 10 == 9,
               F.format_string("no-scheme-page-%d#frag", F.col("doc_id")))
        .when(v == 0, F.format_string("http://example.com/page/%d", base))
        .when(v == 1, F.format_string("HTTP://Example.COM:80/page/%d", base))
        .when(v == 2, F.format_string("https://Example.com:443/page/%d?", base))
        .otherwise(F.format_string("https://example.com/page/%d#frag", base)))
    return url_dedup_stats(docs.select(url.alias("url")))


def _q_cross_corpus_dups_indexed(spark, sf_dir):
    """The PRODUCTION incremental shape: the index side persisted once as
    bucketed catalog tables (build_band_index — signatures, salted bands on
    jk, salt dim), then the daily batch joined against it with zero
    index-side Exchange (plan-asserted in tests/test_plans.py). Timing here
    includes the one-time index build; the daily-run cost alone is the join.
    Must equal cross_corpus_dups (same oracle SQL) — the bucketed layout is
    a physical choice, never a semantic one.

    The index is built ONCE per (session, sf_dir) and memoized — that is
    the production contract (a periodic build amortized over daily runs),
    so under bench's best-of-N the reported min is the daily incremental
    cost while rep 1 visibly carries the build."""
    import tempfile

    from minhashsketch_spark.operators.cross_dedup import (
        build_band_index, cross_corpus_dup_pairs_indexed)

    docs = _docs_as_urls(spark, sf_dir)
    par = F.substring("url", 5, 8).cast("bigint") % 2
    new, idx = docs.filter(par == 1), docs.filter(par == 0)
    if _BIDX_SF[-1:] != [sf_dir] or not spark.catalog.tableExists("mhs_cci_bands"):
        tmp = tempfile.mkdtemp(prefix="mhs_bidx_")
        _entry_track_tmp(tmp)
        build_band_index(spark, idx, CFG, "mhs_cci", n_buckets=32, path_root=tmp)
        _BIDX_SF.append(sf_dir)
    ver = cross_corpus_dup_pairs_indexed(spark, new, "mhs_cci", CFG)
    return (ver.filter(F.col("jaccard") >= F.lit(CFG.threshold))
            .select("url_new", "url_idx", F.round("jaccard", 6).alias("jaccard")))


def _q_streaming_dedup(spark, sf_dir):
    """applyInPandasWithState on the oracle surface: drain the stateful
    first-seen dedup stream synchronously (availableNow) over one parquet
    drop and return the emitted (fingerprint, keeper, n_chars) table. One
    micro-batch covers the whole drop (2 files < maxFilesPerTrigger=4), so
    the keeper is the deterministic global min url and equals the oracle's
    md5-group min; cross-batch state retention is pinned by pytest."""
    import tempfile

    from minhashsketch_spark.streaming.stateful_dedup import streaming_exact_dedup

    tmp = tempfile.mkdtemp(prefix="mhs_stream_dedup_")
    _entry_track_tmp(tmp)
    (_docs_as_urls(spark, sf_dir)
     .select("url", F.lit(None).cast("timestamp").alias("warc_ts"),
             F.lit(None).cast("binary").alias("html"), "text",
             F.lit("en").alias("lang"))
     .coalesce(2).write.parquet(f"{tmp}/in"))
    q = streaming_exact_dedup(spark, f"{tmp}/in", f"{tmp}/ckpt", f"{tmp}/out")
    if not q.awaitTermination(300):  # ADVICE r4: a timed-out drain must fail
        q.stop()                     # loudly, not read a partial output dir
        raise TimeoutError("streaming_dedup did not drain in 300s")
    return spark.read.parquet(f"{tmp}/out")


def _q_windowed_event_counts(spark, sf_dir):
    """Batch path of the streaming tumbling-window agg — identical agg
    expressions to streaming/windows.py::windowed_event_counts (the
    streaming == batch equality is pinned by test_streaming.py; this entry
    puts the §2.2 streaming category on the oracle surface)."""
    from minhashsketch_spark.streaming.windows import batch_windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return batch_windowed_event_counts(ev, window="10 minutes")


def _q_streaming_incremental_dedup(spark, sf_dir):
    """Continuous-crawl near-dup: seed corpus (doc_id%3==0) becomes a
    bucketed band index; two WARC drops (%3==1, %3==2) arrive as ordered
    files and drain through foreachBatch with maxFilesPerTrigger=1, each
    batch verified against seed + earlier deltas. Emitted pairs are
    exactly the cross-GROUP dup pairs with the newer doc as url_new —
    within-drop pairs are by design the compaction's job — so the oracle
    is the all-pairs Jaccard CTE restricted to differing doc_id%3, the
    same recall-1.0 argument as cross_corpus_dups."""
    import glob
    import os
    import shutil
    import tempfile

    from minhashsketch_spark.operators.cross_dedup import build_band_index
    from minhashsketch_spark.streaming.incremental_dedup import (
        streaming_incremental_dedup)

    docs = _docs_as_urls(spark, sf_dir)
    grp = F.substring("url", 5, 8).cast("bigint") % 3
    seed = docs.filter(grp == 0).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="mhs_incr_")
    _entry_track_tmp(tmp)
    build_band_index(spark, seed, CFG, "mhs_incr", n_buckets=32,
                     path_root=f"{tmp}/idx")
    # two drops as single ordered files with forced increasing mtimes
    os.makedirs(f"{tmp}/in")
    for i, g in enumerate((1, 2)):
        (docs.filter(grp == g)
         .select("url", F.lit(None).cast("timestamp").alias("warc_ts"),
                 F.lit(None).cast("binary").alias("html"), "text",
                 F.lit("en").alias("lang"))
         .coalesce(1).write.mode("overwrite").parquet(f"{tmp}/drop{i}"))
        part = glob.glob(f"{tmp}/drop{i}/part-*.parquet")[0]
        dst = f"{tmp}/in/drop{i}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1700000000 + 100 * i, 1700000000 + 100 * i))
    q = streaming_incremental_dedup(
        spark, f"{tmp}/in", "mhs_incr", f"{tmp}/delta",
        f"{tmp}/pairs", f"{tmp}/ckpt", CFG)
    if not q.awaitTermination(600):  # ADVICE r4: fail loudly on slow drain
        q.stop()
        raise TimeoutError("streaming_incremental_dedup did not drain in 600s")
    pairs = spark.read.parquet(f"{tmp}/pairs")
    return (pairs.filter(F.col("jaccard") >= F.lit(CFG.threshold))
            .select("url_new", "url_idx", F.round("jaccard", 6).alias("jaccard")))


def _q_curated_corpus(spark, sf_dir):
    """The composed end product (curate.py): exact dedup -> MinHash+LSH+CC
    near-dedup at the flagship config -> quality/language filters; returns
    the curated corpus urls. Certifies the end-to-end semantics the
    north_rule describes, not just each stage in isolation."""
    from minhashsketch_spark.curate import curate

    res = curate(spark, _docs_as_urls(spark, sf_dir), CFG,
                 min_quality=20.0, langs=("en",), with_accounting=False)
    return res["curated"].select("url")


def _q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min gaps) — lag + running-sum windows
    then per-session aggregation, the canonical event-stream shape."""
    from minhashsketch_spark.operators.sessions import user_sessions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return user_sessions(ev, gap_s=1800)


def _q_orders_rollup(spark, sf_dir):
    """Grouping-sets coverage (SURVEY §2.2): ROLLUP over priority x year
    with subtotal + grand-total rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.withColumn("o_year", F.year("o_orderdate"))
        .rollup("o_orderpriority", "o_year")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("revenue_c"))
        .select("o_orderpriority", "o_year", "n_orders", "revenue_c")
    )


def _q_parts_by_brand(spark, sf_dir):
    """agg + HAVING + avg over a dimension scan."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        p.groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
             F.max("p_size").alias("max_size"))
        .filter(F.col("n_parts") >= 5)
        .orderBy("p_brand")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # MinHash near-dup pipeline (SURVEY.md §2.1 O1-O17 re-expressed)
        "doc_shingle_counts": _q_doc_shingle_counts,
        "minhash_signatures": _q_minhash_signatures,
        "minhash_candidates": _q_minhash_candidates,
        "near_dup_pairs": _q_near_dup_pairs,
        "near_dup_containment": _q_near_dup_containment,
        "near_dup_pairs_m4": _q_near_dup_pairs_m4,
        "near_dup_clusters": _q_near_dup_clusters,
        # training-data dedup family
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash_pairs": _q_simhash_pairs,
        # text analysis
        "token_stats": _q_token_stats,
        "quality_score": _q_quality_score,
        "language_id": _q_language_id,
        "md5_fingerprint": _q_md5_fingerprint,
        "winnow_fingerprint": _q_winnow_fingerprint,
        # similarity search
        "embedding_topk": _q_embedding_topk,
        "embedding_topk_lsh": _q_embedding_topk_lsh,
        "embedding_topk_ivf": _q_embedding_topk_ivf,
        "embedding_near_dup": _q_embedding_near_dup,
        # multimodal plumbing
        "multimodal_features": _q_multimodal_features,
        "jpeg_features": _q_jpeg_features,
        "contamination": _q_contamination,
        "audio_stats": _q_audio_stats,
        "corpus_sketch": _q_corpus_sketch,
        "substring_dups": _q_substring_dups,
        "exact_dedup_corpus": _q_exact_dedup_corpus,
        "near_dedup_corpus": _q_near_dedup_corpus,
        "near_dedup_best": _q_near_dedup_best,
        "corpus_splits": _q_corpus_splits,
        "domain_stats": _q_domain_stats,
        # reference DNA parity (goldens from the ref-compiled binary)
        "dna_similarity": _q_dna_similarity,
        "dna_sketches": _q_dna_sketches,
        # relational coverage (scan/filter/agg/join/window — §2.2)
        "tpch_q1": _q_tpch_q1,
        "revenue_by_nation": _q_revenue_by_nation,
        "top_events_per_user": _q_top_events_per_user,
        "event_type_stats": _q_event_type_stats,
        "tpch_q3_like": _q_tpch_q3_like,
        "parts_by_brand": _q_parts_by_brand,
        "orders_rollup": _q_orders_rollup,
        "user_sessions": _q_user_sessions,
        "html_extract": _q_html_extract,
        "warc_roundtrip": _q_warc_roundtrip,
        "pii_scrub": _q_pii_scrub,
        "robots_filter": _q_robots_filter,
        "compression_ratio": _q_compression_ratio,
        "repetition_stats": _q_repetition_stats,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "windowed_event_counts": _q_windowed_event_counts,
        "streaming_dedup": _q_streaming_dedup,
        "cross_corpus_dups": _q_cross_corpus_dups,
        "cross_corpus_dups_indexed": _q_cross_corpus_dups_indexed,
        "line_dedup": _q_line_dedup,
        "url_dedup": _q_url_dedup,
        "streaming_incremental_dedup": _q_streaming_incremental_dedup,
        "curated_corpus": _q_curated_corpus,
    }


def _winnow_oracle(k: int = 8, w: int = 16) -> str:
    """DuckDB replica of operators/text.py::winnowing_fingerprint.

    Byte-level access via hex(encode(text)) (2 hex chars per byte); the
    polynomial rolling hash (mod 2**64, splitmix64 multiplier) is done in
    HUGEINT with an explicit mod; signed two's-complement view at the end
    matches Spark's bigint storage.
    """
    m_const = 0x9E3779B97F4A7C15
    pows = [pow(m_const, k - 1 - j, 2**64) for j in range(k)]
    terms = " + ".join(
        f"((('0x' || substr(h, 2*(i+{j})-1, 2))::BIGINT)::HUGEINT * {pows[j]}::HUGEINT)"
        for j in range(k))
    return f"""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
          FROM documents
        ),
        hashes AS (
          SELECT doc_id, i, (({terms}) % 18446744073709551616::HUGEINT) AS hv,
                 n - {k} + 1 AS n_h
          FROM hx, unnest(range(1, n - {k} + 2)) AS t(i)
          WHERE n >= {k}
        ),
        wmin AS (
          SELECT doc_id, n_h, i,
                 min(hv) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wm
          FROM hashes
        )
        SELECT DISTINCT doc_id,
               CASE WHEN wm >= 9223372036854775808::HUGEINT
                    THEN (wm - 18446744073709551616::HUGEINT)::BIGINT
                    ELSE wm::BIGINT END AS fp
        FROM wmin
        WHERE i <= greatest(n_h - {w} + 1, 1)
    """


def _near_dup_cte(src: str = "documents") -> str:
    """Exact-Jaccard dup-pair CTE chain over ``src(doc_id, text)`` —
    parametrized so the curated-corpus oracle can run it over the
    exact-dedup keepers instead of the raw table."""
    return f"""
        sh AS (
          -- byte-level 9-gram shingles via hex pairs (2 hex chars per byte):
          -- exactly the byte windows core/shingles.py hashes
          SELECT doc_id, unnest(list_distinct(
                   [substr(hex(encode(text)), 2*i-1, 18)
                    FOR i IN range(1, octet_length(encode(text)) - 7)])) AS g
          FROM {src} WHERE octet_length(encode(text)) >= 9
        ),
        gids AS (SELECT g, row_number() OVER (ORDER BY g) AS gid
                 FROM (SELECT DISTINCT g FROM sh)),
        shi AS (SELECT doc_id, gid FROM sh JOIN gids USING (g)),
        sizes AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM shi a JOIN shi b ON a.gid = b.gid AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        dup_pairs AS (
          SELECT id_a, id_b,
                 n_inter::double / (sa.n + sb.n - n_inter) AS jacc
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE n_inter::double / (sa.n + sb.n - n_inter) >= 0.7
        )
"""


_NEAR_DUP_CTE = _near_dup_cte()

_NEAR_DUP_PAIRS_ORACLE = f"""
        WITH {_NEAR_DUP_CTE}
        SELECT printf('doc-%08d', id_a) AS url_a,
               printf('doc-%08d', id_b) AS url_b,
               round(jacc, 6) AS jaccard
        FROM dup_pairs
"""

_NEAR_DUP_CONTAINMENT_ORACLE = f"""
        WITH {_NEAR_DUP_CTE}
        SELECT printf('doc-%08d', i.id_a) AS url_a,
               printf('doc-%08d', i.id_b) AS url_b,
               round(i.n_inter::double / (sa.n + sb.n - i.n_inter), 6) AS jaccard,
               round(i.n_inter::double / sa.n, 6) AS containment_a,
               round(i.n_inter::double / sb.n, 6) AS containment_b
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE i.n_inter::double / (sa.n + sb.n - i.n_inter) >= 0.7
"""

_NEAR_DUP_CLUSTERS_ORACLE = f"""
        WITH RECURSIVE {_NEAR_DUP_CTE},
        edges AS (
          SELECT id_a AS u, id_b AS v FROM dup_pairs
          UNION SELECT id_b, id_a FROM dup_pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT printf('doc-%08d', u) AS url,
               printf('doc-%08d', least(u, min(v))) AS cluster_id
        FROM reach GROUP BY u
"""

_NEAR_DEDUP_CORPUS_ORACLE = f"""
        WITH RECURSIVE {_NEAR_DUP_CTE},
        edges AS (
          SELECT id_a AS u, id_b AS v FROM dup_pairs
          UNION SELECT id_b, id_a FROM dup_pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        losers AS (
          SELECT u FROM reach GROUP BY u HAVING least(u, min(v)) <> u
        )
        SELECT printf('doc-%08d', doc_id) AS url
        FROM documents WHERE doc_id NOT IN (SELECT u FROM losers)
"""

# quality-aware keeper: same closure as _NEAR_DEDUP_CORPUS_ORACLE but the
# kept member is the argmax of the UNROUNDED quality product (IEEE-exact
# ops only — +,-,*,/ — so the window order is bit-identical cross-engine),
# ties by min doc_id
_NEAR_DEDUP_BEST_ORACLE = rf"""
        WITH RECURSIVE {_near_dup_cte()},
        edges AS (
          SELECT id_a AS u, id_b AS v FROM dup_pairs
          UNION SELECT id_b, id_a FROM dup_pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        comp AS (
          SELECT u AS doc_id, least(u, min(v)) AS cluster_id
          FROM reach GROUP BY u
        ),
        member_scores AS (
          SELECT c.doc_id, c.cluster_id,
                 CASE WHEN length(d.text) = 0 THEN 0.0
                      ELSE 100.0
                        * (1.0 - length(regexp_replace(d.text, '[^0-9]', '', 'g'))::DOUBLE / length(d.text))
                        * (1.0 - length(regexp_replace(d.text, '[^!.,;:?]', '', 'g'))::DOUBLE / length(d.text))
                        * least(1.0, (CASE WHEN length(trim(d.text)) = 0 THEN 0
                                           ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END)::DOUBLE / 100.0)
                 END AS s
          FROM comp c JOIN documents d USING (doc_id)
        ),
        losers AS (
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (
                     PARTITION BY cluster_id ORDER BY s DESC, doc_id ASC) AS rn
            FROM member_scores) WHERE rn > 1
        )
        SELECT printf('doc-%08d', doc_id) AS url
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM losers)
"""

# the composed curation pipeline (curate.py): exact dedup -> near-dup dedup
# over the exact keepers -> quality >= 20 and detected_lang = 'en'. Each
# piece reuses the oracle logic already proven green on its own query; the
# near-dup CTE runs over the keepers because curate() near-dedups the
# exact-deduped survivors (pairwise Jaccard is independent of other rows,
# so restriction == recomputation).
_CURATED_CORPUS_ORACLE = rf"""
        WITH RECURSIVE keep0 AS (
          SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        kdocs AS (
          SELECT d.doc_id, d.text FROM documents d JOIN keep0 USING (doc_id)
        ),
        {_near_dup_cte('kdocs')},
        edges AS (
          SELECT id_a AS u, id_b AS v FROM dup_pairs
          UNION SELECT id_b, id_a FROM dup_pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        losers AS (
          SELECT u FROM reach GROUP BY u HAVING least(u, min(v)) <> u
        ),
        survivors AS (
          SELECT doc_id, text FROM kdocs
          WHERE doc_id NOT IN (SELECT u FROM losers)
        ),
        scored AS (
          SELECT doc_id,
                 length(text) AS n,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                 length(regexp_replace(text, '[^!.,;:?]', '', 'g')) AS n_punct,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
                 len(regexp_split_to_array(' ' || lower(text) || ' ', ' the ')) - 1
                 + len(regexp_split_to_array(' ' || lower(text) || ' ', ' and ')) - 1
                 + len(regexp_split_to_array(' ' || lower(text) || ' ', ' of ')) - 1 AS en_hits,
                 len(regexp_split_to_array(' ' || lower(text) || ' ', ' der ')) - 1
                 + len(regexp_split_to_array(' ' || lower(text) || ' ', ' und ')) - 1
                 + len(regexp_split_to_array(' ' || lower(text) || ' ', ' die ')) - 1 AS de_hits,
                 length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS zh_hits
          FROM survivors
        )
        SELECT printf('doc-%08d', doc_id) AS url
        FROM scored
        WHERE (CASE WHEN n = 0 THEN 0.0
                    ELSE round(100.0 * (1.0 - n_digits::double / n)
                               * (1.0 - n_punct::double / n)
                               * least(1.0, n_tokens::double / 100.0), 4) END) >= 20.0
          AND en_hits >= de_hits AND en_hits >= zh_hits AND en_hits > 0
"""


def _simhash_oracle(max_hamming: int = 3, bits: int = 60) -> str:
    """DuckDB replica of operators/dedup.py::simhash + brute-force Hamming
    pairs (the Spark side blocks with a 4x15-bit pigeonhole — exact at
    radius 3 — so brute force over all pairs is the equivalent oracle)."""
    votes = ",\n                 ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(bits))
    assemble = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 ('0x' || substr(md5(unnest(regexp_split_to_array(trim(text), '\\s+'))), 1, 15))::BIGINT AS h
          FROM documents WHERE length(trim(text)) > 0
        ),
        votes AS (
          SELECT doc_id,
                 {votes}
          FROM toks GROUP BY doc_id
        ),
        sh AS (SELECT doc_id, ({assemble})::BIGINT AS simhash FROM votes)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _plane_values(n_rows: int, dim: int = 64, seed: int = 7) -> str:
    """The seeded hyperplane matrix (similarity.py uses
    np.random.RandomState(seed).standard_normal) as a DuckDB VALUES table
    ``(pi, pl DOUBLE[])`` — repr() round-trips each double exactly, so the
    oracle works with bit-identical plane coefficients."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((n_rows, dim))
    return ",\n              ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in planes[i]))
        for i in range(n_rows))


def _embedding_lsh_topk_oracle(n_planes: int = 12, seed: int = 7,
                               k: int = 10) -> str:
    """DuckDB replica of similarity.py::lsh_cosine_topk: sign-bucket under
    the literal seeded planes, multi-probe (bucket + all Hamming-1
    neighbors), score candidates with exact cosine, per-query top-k.
    Sign agreement with the NumPy matmul holds unless a projection lands
    within float ulps of 0 (probability ~1e-13 per (vec, plane))."""
    return f"""
        WITH planes(pi, pl) AS (
          VALUES {_plane_values(n_planes, seed=seed)}
        ),
        b AS (
          SELECT e.vec_id,
                 sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pl) > 0
                          THEN (1::BIGINT << p.pi) ELSE 0 END)::BIGINT AS bucket
          FROM embeddings e, planes p GROUP BY e.vec_id
        ),
        qb AS (SELECT vec_id AS query_id, bucket FROM b WHERE vec_id < 5),
        probes AS (
          SELECT query_id, bucket FROM qb
          UNION
          SELECT query_id, xor(bucket, (1::BIGINT << i)) FROM qb, range(0, {n_planes}) t(i)
        ),
        cand AS (
          SELECT DISTINCT p.query_id, cb.vec_id AS neighbor_id
          FROM probes p JOIN b cb ON cb.bucket = p.bucket
          WHERE cb.vec_id <> p.query_id
        ),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]), 6) AS cosine
          FROM cand c
          JOIN embeddings q ON q.vec_id = c.query_id
          JOIN embeddings e ON e.vec_id = c.neighbor_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= {k}
    """


def _embedding_near_dup_oracle(n_tables: int = 8, n_planes: int = 5,
                               seed: int = 7, threshold: float = 0.4) -> str:
    """DuckDB replica of similarity.py::embedding_near_dup_pairs at the
    driver params. Valid while every (table, bucket) stays under
    bucket_cap=512 (true on testdata: ~2k vectors over 8x32 buckets, max
    ~a few hundred), so salt=0 on both sides and no chain links exist —
    the same salt=0 argument minhash_candidates' oracle makes. The salted
    path itself is pinned by the forced-hot-bucket pytest."""
    return f"""
        WITH planes(pi, pl) AS (
          VALUES {_plane_values(n_tables * n_planes, seed=seed)}
        ),
        b AS (
          SELECT e.vec_id, p.pi // {n_planes} AS tbl,
                 sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pl) > 0
                          THEN (1::BIGINT << (p.pi % {n_planes})) ELSE 0 END)::BIGINT AS bucket
          FROM embeddings e, planes p GROUP BY e.vec_id, p.pi // {n_planes}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
          FROM b a JOIN b bb
            ON a.tbl = bb.tbl AND a.bucket = bb.bucket AND a.vec_id < bb.vec_id
        )
        SELECT id_a, id_b,
               round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                            eb.embedding::DOUBLE[]), 6) AS cosine
        FROM cand
        JOIN embeddings ea ON ea.vec_id = id_a
        JOIN embeddings eb ON eb.vec_id = id_b
        WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[]) >= {threshold}
    """


_M64 = (1 << 64) - 1


def _spark_xxhash64_long(value: int, seed: int = 42) -> int:
    """Spark's xxhash64 over a single BIGINT column (XXH64 hashLong with the
    expression's default seed 42 — the standard public XXH64 8-byte-input
    path). Returned as a SIGNED 64-bit int, matching Spark's bigint result.
    Used to replicate the IVF codebook's deterministic hash-filter sample
    (similarity.py::fit_ivf_centroids) at oracle-build time."""
    p1, p2, p3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    p4, p5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    h = (seed + p5 + 8) & _M64
    h ^= (rotl((value & _M64) * p2 & _M64, 31) * p1) & _M64
    h = (rotl(h, 27) * p1 + p4) & _M64
    h ^= h >> 33
    h = (h * p2) & _M64
    h ^= h >> 29
    h = (h * p3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _ivf_centroid_replica(sf_dir: str, n_centroids: int = 16, seed: int = 7,
                          sample_mod: int = 8, sample_n: int = 4096):
    """Reproduce fit_ivf_centroids' codebook WITHOUT Spark: same
    deterministic hash-filter sample (xxhash64(vec_id) pmod sample_mod == 0,
    ordered by vec_id, first sample_n) read via pyarrow, then the SAME
    NumPy k-means (similarity.kmeans_fit — literally the shared function).
    float32 -> float64 widening is exact on both sides, so the centroids
    are bit-identical to what the Spark query fits."""
    import numpy as np
    import pyarrow.parquet as pq

    from minhashsketch_spark.operators.similarity import kmeans_fit

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    picked = sorted(
        (i, e) for i, e in zip(ids, embs)
        if _spark_xxhash64_long(int(i)) % sample_mod == 0)[:sample_n]
    if len(picked) < n_centroids:  # tiny-corpus fallback, as in the operator
        picked = sorted(zip(ids, embs))[:sample_n]
    x = np.stack([np.asarray(e, dtype=np.float64) for _, e in picked])
    return kmeans_fit(x, n_centroids, seed=seed)


def _embedding_ivf_topk_oracle(n_centroids: int = 16, nprobe: int = 6,
                               k: int = 10, seed: int = 7,
                               sf_dir: str = "/root/testdata/sf0.01") -> str:
    """DuckDB replica of similarity.py::ivf_cosine_topk — the data-fitted
    codebook is reproduced deterministically at oracle-build time
    (_ivf_centroid_replica) and embedded as literal DOUBLE[] VALUES, the
    _plane_values pattern. Cell assignment is argmax of dot(embedding,
    centroid) — the operator normalizes the vector first, but positive
    scaling never changes the argmax, so the division (whose libm rounding
    could differ between engines) stays OUT of the oracle boundary; an
    argmax flip needs two centroid dots within float-ulp of each other
    (same accepted ~1e-13 risk class as the hyperplane sign threshold).
    NOTE: the replica reads the sf0.01 table — the scale the driver runs
    oracles at; at another sf the codebooks (and so the results) differ."""
    cents = _ivf_centroid_replica(sf_dir, n_centroids, seed=seed)
    values = ",\n              ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in cents[i]))
        for i in range(len(cents)))
    return f"""
        WITH cents(ci, c) AS (
          VALUES {values}
        ),
        cell_scores AS (
          SELECT e.vec_id, ct.ci,
                 list_dot_product(e.embedding::DOUBLE[], ct.c) AS dot
          FROM embeddings e, cents ct
        ),
        corpus_cells AS (
          SELECT vec_id AS neighbor_id, ci AS cell FROM (
            SELECT vec_id, ci, row_number() OVER (
                     PARTITION BY vec_id ORDER BY dot DESC, ci ASC) AS rn
            FROM cell_scores) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, ci AS cell FROM (
            SELECT vec_id, ci, row_number() OVER (
                     PARTITION BY vec_id ORDER BY dot DESC, ci ASC) AS rn
            FROM cell_scores WHERE vec_id < 5) WHERE rn <= {nprobe}
        ),
        cand AS (
          SELECT DISTINCT p.query_id, cc.neighbor_id
          FROM probes p JOIN corpus_cells cc USING (cell)
          WHERE cc.neighbor_id <> p.query_id
        ),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]), 6) AS cosine
          FROM cand c
          JOIN embeddings q ON q.vec_id = c.query_id
          JOIN embeddings e ON e.vec_id = c.neighbor_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= {k}
    """


def _html_extract_oracle() -> str:
    """DuckDB replica of operators/extract.py::extract_text over the same
    wrapped fixture: tag strip, then NUMERIC character references (marker
    chr(1)/chr(2) bracketing -> split -> per-element decode; DuckDB's
    chr() is code-point-correct so no byte building needed), then the five
    named entities with &amp; last — the exact single-pass order the
    operator uses."""
    suffix = ("</body><p>&#8217;s &#x1F600; a&#xA0;b &#X41; "
              "&amp;#65; &#38;lt; &#1114112; &lt;x&gt;&quot;&#39;</p></html>")
    ent = "split_part(x, chr(2), 1)"
    rest = f"substr(x, length({ent}) + 2)"
    body = f"substr({ent}, 3, length({ent}) - 3)"
    is_hex = f"substr({body}, 1, 1) IN ('x', 'X')"
    cp = (f"(CASE WHEN {is_hex} THEN ('0x' || substr({body}, 2))::BIGINT "
          f"ELSE ({body})::BIGINT END)")
    valid = f"({cp} >= 1 AND {cp} <= 1114111 AND NOT ({cp} >= 55296 AND {cp} <= 57343))"
    decode_elem = (f"CASE WHEN strpos(x, chr(2)) = 0 THEN x "
                   f"ELSE (CASE WHEN {valid} THEN (CASE WHEN {cp} = 38 "
                   f"THEN chr(3) ELSE chr({cp}::INT) END) "
                   f"ELSE {ent} END) || {rest} END")
    return f"""
        WITH h AS (
          SELECT doc_id,
                 decode(encode('<html><body>') || encode(text)
                        || encode('{suffix}')) AS html
          FROM documents
        ),
        stripped AS (
          SELECT doc_id, regexp_replace(html, '<[^>]*>', '', 'g') AS s
          FROM h
        ),
        numdec AS (
          SELECT doc_id,
                 array_to_string(list_transform(
                   str_split(regexp_replace(s,
                     '(&#([0-9]{{1,7}}|[xX][0-9a-fA-F]{{1,6}});)',
                     chr(1) || '\\1' || chr(2), 'g'), chr(1)),
                   x -> {decode_elem}), '') AS s
          FROM stripped
        ),
        e AS (
          SELECT doc_id,
                 replace(replace(replace(replace(replace(s,
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', chr(39)), '&amp;', '&') AS extracted_text0
          FROM numdec
        ),
        r AS (
          SELECT doc_id, replace(extracted_text0, chr(3), '&') AS extracted_text
          FROM e
        )
        SELECT doc_id, md5(extracted_text) AS extracted_md5,
               length(extracted_text) AS n_chars
        FROM r
    """


# DuckDB replica of operators/urls.py::normalize_url_expr over the same
# fabricated messy-variant fixture (see _q_url_dedup). Only string ops with
# identical Spark/DuckDB semantics: split_part==substring_index, lower,
# regexp_extract with an RE2-safe pattern, anchored regexp_replace.
_URL_PAT_SQL = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^#]*)$"
_URL_DEDUP_ORACLE = f"""
    WITH raw AS (
      SELECT CASE
        WHEN doc_id % 10 = 9 THEN printf('no-scheme-page-%d#frag', doc_id)
        WHEN doc_id % 4 = 0 THEN printf('http://example.com/page/%d', doc_id // 2)
        WHEN doc_id % 4 = 1 THEN printf('HTTP://Example.COM:80/page/%d', doc_id // 2)
        WHEN doc_id % 4 = 2 THEN printf('https://Example.com:443/page/%d?', doc_id // 2)
        ELSE printf('https://example.com/page/%d#frag', doc_id // 2)
      END AS url
      FROM documents
    ),
    parts AS (
      SELECT url, split_part(url, '#', 1) AS u FROM raw
    ),
    norm AS (
      SELECT url,
        CASE WHEN lower(regexp_extract(u, '{_URL_PAT_SQL}', 1)) = '' THEN u
        ELSE
          lower(regexp_extract(u, '{_URL_PAT_SQL}', 1)) || '://' ||
          (CASE WHEN lower(regexp_extract(u, '{_URL_PAT_SQL}', 1)) = 'http'
                THEN regexp_replace(lower(regexp_extract(u, '{_URL_PAT_SQL}', 2)), ':80$', '')
                WHEN lower(regexp_extract(u, '{_URL_PAT_SQL}', 1)) = 'https'
                THEN regexp_replace(lower(regexp_extract(u, '{_URL_PAT_SQL}', 2)), ':443$', '')
                ELSE lower(regexp_extract(u, '{_URL_PAT_SQL}', 2)) END) ||
          (CASE WHEN regexp_replace(regexp_extract(u, '{_URL_PAT_SQL}', 3), '\\?$', '') = ''
                THEN '/'
                ELSE regexp_replace(regexp_extract(u, '{_URL_PAT_SQL}', 3), '\\?$', '') END)
        END AS norm_url
      FROM parts
    )
    SELECT norm_url, count(*) AS n_variants, min(url) AS keeper_url
    FROM norm GROUP BY norm_url
"""


_CROSS_CORPUS_ORACLE = f"""
    WITH {_near_dup_cte()}
    SELECT printf('doc-%08d', CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END) AS url_new,
           printf('doc-%08d', CASE WHEN id_a % 2 = 1 THEN id_b ELSE id_a END) AS url_idx,
           round(jacc, 6) AS jaccard
    FROM dup_pairs
    WHERE (id_a % 2) <> (id_b % 2)
"""


@functools.lru_cache(maxsize=2)
def _jpeg_features_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Semi-oracle for jpeg_features: recompute payload -> decode -> hist
    driver-side with the same public T.81 codec over pyarrow-read parquet
    and pin the result as a literal VALUES table. Cached — the codec
    roundtrip over 500 docs costs ~1 s and oracle_sql() is re-called per
    driver-compare."""
    import numpy as np
    import pyarrow.parquet as pq

    from minhashsketch_spark.core.jpeg import decode_baseline_jpeg

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, txt in zip(t.column("doc_id").to_pylist(),
                           t.column("text").to_pylist()):
        buf = _jpeg_payload_from_text(txt)
        h = np.bincount(decode_baseline_jpeg(buf).reshape(-1) >> 2,
                        minlength=64)
        rows.append(f"({doc_id}, {len(buf)}, {int(h[0])}, {int(h[24])})")
    return ("SELECT media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes, "
            "h0::INT AS h0, h24::INT AS h24 FROM (VALUES "
            + ", ".join(rows) + ") AS t(media_id, n_bytes, h0, h24)")


@functools.lru_cache(maxsize=2)
def _compression_ratio_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Recomputed-VALUES oracle: stdlib zlib at level 6 is deterministic,
    so both engines see identical integers."""
    import zlib as _z

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, txt in zip(t.column("doc_id").to_pylist(),
                           t.column("text").to_pylist()):
        b = (txt or "").encode("utf-8")
        c = len(_z.compress(b, 6))
        ratio = (c * 1000) // len(b) if b else 1000
        rows.append(f"({doc_id}, {len(b)}, {c}, {ratio})")
    return ("SELECT doc_id::BIGINT AS doc_id, n_raw::BIGINT AS n_raw, "
            "n_compressed::BIGINT AS n_compressed, "
            "ratio_x1000::BIGINT AS ratio_x1000 FROM (VALUES "
            + ", ".join(rows) + ") AS t(doc_id, n_raw, n_compressed, ratio_x1000)")


def oracle_sql() -> dict[str, str]:
    return {
        "curated_corpus": _CURATED_CORPUS_ORACLE,
        "repetition_stats": r"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
              FROM documents WHERE length(trim(text)) > 0
            ),
            b AS (
              SELECT doc_id, a,
                     [a[i] || ' ' || a[i+1] FOR i IN range(1, len(a))] AS bg
              FROM t
            )
            SELECT doc_id,
                   len(a) AS n_tokens,
                   len(list_distinct(a)) AS n_distinct_tokens,
                   round(1.0 - len(list_distinct(a))::DOUBLE / len(a), 6) AS dup_token_frac,
                   CASE WHEN len(bg) > 0
                        THEN round(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 6)
                        ELSE 0.0 END AS dup_bigram_frac
            FROM b
        """,
        # score = (tf * N) / df: integer-exact multiply + one IEEE division,
        # bit-identical across engines (a libm ln() would not be) — the
        # score orders the window but only integers cross the boundary
        "tfidf_top_terms": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
              FROM documents WHERE length(trim(text)) > 0
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            ranked AS (
              SELECT tf.doc_id, tf.term, tf.tf, dft.df,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (tf.tf::DOUBLE * n.n) / dft.df DESC, tf.term ASC
                     ) AS rank
              FROM tf JOIN dft USING (term), n
            )
            SELECT doc_id, rank, term, tf, df FROM ranked WHERE rank <= 3
        """,
        "cross_corpus_dups": _CROSS_CORPUS_ORACLE,
        # cross-GROUP dup pairs (groups = doc_id%3: seed 0, drops 1 and 2),
        # newer group = url_new; within-group pairs excluded by design
        "streaming_incremental_dedup": f"""
            WITH {_near_dup_cte()}
            SELECT printf('doc-%08d', CASE WHEN (id_a % 3) > (id_b % 3)
                                           THEN id_a ELSE id_b END) AS url_new,
                   printf('doc-%08d', CASE WHEN (id_a % 3) > (id_b % 3)
                                           THEN id_b ELSE id_a END) AS url_idx,
                   round(jacc, 6) AS jaccard
            FROM dup_pairs
            WHERE (id_a % 3) <> (id_b % 3)
        """,
        # identical semantics: the bucketed index layout is physical only
        "cross_corpus_dups_indexed": _CROSS_CORPUS_ORACLE,
        "html_extract": _html_extract_oracle(),
        "pii_scrub": """
            WITH w AS (
              SELECT doc_id,
                     text || printf(' contact u%d@ex%d.example.com from 10.%d.0.%d',
                                    doc_id, doc_id % 7, doc_id % 256, doc_id % 250)
                          || CASE WHEN doc_id % 3 = 0
                                  THEN printf(' tel +1-555-%03d-0199', doc_id % 1000)
                                  ELSE '' END AS t
              FROM documents
            ),
            e AS (
              SELECT doc_id,
                     len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+')) AS n_emails,
                     regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g') AS t
              FROM w
            ),
            i AS (
              SELECT doc_id, n_emails,
                     len(regexp_extract_all(t, '(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}')) AS n_ips,
                     regexp_replace(t, '(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}', '<IP>', 'g') AS t
              FROM e
            ),
            p AS (
              SELECT doc_id, n_emails, n_ips,
                     len(regexp_extract_all(t, '\\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,6}')) AS n_phones,
                     regexp_replace(t, '\\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,6}', '<PHONE>', 'g') AS t
              FROM i
            )
            SELECT doc_id, n_emails::BIGINT AS n_emails, n_ips::BIGINT AS n_ips,
                   n_phones::BIGINT AS n_phones,
                   (n_emails + n_ips + n_phones) > 0 AS has_pii,
                   md5(t) AS scrubbed_md5, length(t) AS scrubbed_len
            FROM p
        """,
        "compression_ratio": _compression_ratio_oracle(),
        "robots_filter": """
            SELECT doc_id,
                   'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p'
                     || (doc_id % 10)::VARCHAR || '/' || doc_id::VARCHAR AS url,
                   ((doc_id % 10) = (doc_id % 7))
                     OR ((doc_id % 10) = ((doc_id % 7) + 3) % 10) AS robots_disallowed
            FROM documents
        """,
        "warc_roundtrip": """
            SELECT printf('doc-%08d', doc_id) AS url,
                   md5(text) AS html_md5,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents
        """,
        "url_dedup": _URL_DEDUP_ORACLE,
        # line-level dedup over the crawl-shaped fixture page; the oracle
        # counts df by raw line string where Spark uses xxhash64 keys —
        # identical absent a 64-bit collision (documented add-only risk)
        "line_dedup": """
            WITH d2 AS (
              SELECT doc_id,
                     'SHARED HEADER' || chr(10)
                     || 'CATEGORY ' || (doc_id % 7)::VARCHAR || chr(10)
                     || text || chr(10)
                     || 'ID ' || doc_id::VARCHAR || chr(10)
                     || 'SHARED FOOTER' AS text
              FROM documents
            ),
            l AS (
              SELECT doc_id, i, string_split(text, chr(10))[i] AS line
              FROM d2,
                   unnest(range(1, len(string_split(text, chr(10))) + 1)) AS t(i)
            ),
            dfq AS (SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line),
            kept AS (SELECT l.doc_id, l.i, l.line
                     FROM l JOIN dfq USING (line) WHERE dfq.df < 5),
            agg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(line, chr(10) ORDER BY i) AS cleaned
              FROM kept GROUP BY doc_id
            )
            SELECT d2.doc_id,
                   len(string_split(d2.text, chr(10))) AS n_lines,
                   coalesce(agg.n_kept, 0) AS n_kept,
                   md5(coalesce(agg.cleaned, '')) AS cleaned_md5,
                   length(coalesce(agg.cleaned, '')) AS cleaned_len
            FROM d2 LEFT JOIN agg USING (doc_id)
        """,
        # md5 groups carry identical text, so length is constant per group
        "streaming_dedup": """
            WITH d AS (
              SELECT printf('doc-%08d', doc_id) AS url, text FROM documents
            )
            SELECT md5(text) AS fingerprint, min(url) AS url,
                   min(length(text))::INT AS n_chars
            FROM d GROUP BY md5(text)
        """,
        "windowed_event_counts": """
            SELECT (floor(epoch(ts))::BIGINT // 600) * 600 AS window_start_s,
                   event_type, count(*) AS n_events,
                   CAST(round(sum(value) * 100) AS BIGINT) AS value_c
            FROM events GROUP BY 1, 2
        """,
        "embedding_topk_lsh": _embedding_lsh_topk_oracle(n_planes=8, seed=7, k=10),
        "embedding_topk_ivf": _embedding_ivf_topk_oracle(n_centroids=16,
                                                         nprobe=6, k=10, seed=7),
        "embedding_near_dup": _embedding_near_dup_oracle(n_tables=8, n_planes=5,
                                                         seed=7, threshold=0.4),
        "winnow_fingerprint": _winnow_oracle(k=8, w=16),
        "simhash_pairs": _simhash_oracle(max_hamming=3),
        "near_dup_pairs": _NEAR_DUP_PAIRS_ORACLE,
        "near_dup_containment": _NEAR_DUP_CONTAINMENT_ORACLE,
        "near_dup_clusters": _NEAR_DUP_CLUSTERS_ORACLE,
        "near_dedup_corpus": _NEAR_DEDUP_CORPUS_ORACLE,
        "near_dedup_best": _NEAR_DEDUP_BEST_ORACLE,
        "domain_stats": """
            WITH d AS (
              SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
                     md5(CASE WHEN doc_id % 5 = 0 THEN 'shared boilerplate page'
                              ELSE text END) AS fp,
                     length(CASE WHEN doc_id % 5 = 0 THEN 'shared boilerplate page'
                                 ELSE text END) AS len
              FROM documents
            ),
            fpn AS (SELECT fp, count(*) AS fp_count FROM d GROUP BY fp)
            SELECT host, count(*) AS n_docs,
                   sum(CASE WHEN fp_count >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
                   sum(len)::BIGINT AS n_chars
            FROM d JOIN fpn USING (fp) GROUP BY host
        """,
        # same integer band bounds computed the same way (int(frac * 2^60))
        # so no float-rounding hazard crosses the engine boundary
        "corpus_splits": f"""
            WITH h AS (
              SELECT ('0x' || substr(md5(printf('doc-%08d', doc_id)), 1, 15))::BIGINT AS hv
              FROM documents
            ),
            s AS (
              SELECT hv, CASE WHEN hv < {int(0.8 * (1 << 60))} THEN 'train'
                              WHEN hv < {int(0.8 * (1 << 60)) + int(0.1 * (1 << 60))} THEN 'val'
                              WHEN hv < {int(0.8 * (1 << 60)) + 2 * int(0.1 * (1 << 60))} THEN 'test'
                         END AS split
              FROM h
            )
            SELECT split, count(*) AS n_docs, bit_xor(hv) AS member_xor
            FROM s WHERE split IS NOT NULL GROUP BY split
        """,
        # PPM payload = 11-byte header + first 192 utf-8 text bytes,
        # zero-padded by the decoder; hist bins are byte-value // 4.
        # LEFT JOIN from the per-doc spine so npix=0 docs survive with the
        # all-padding histogram (h0=192) instead of vanishing from the unnest
        "contamination": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     ('0x' || substr(md5(array_to_string(a[i:i+12], ' ')), 1, 15))::BIGINT AS gk
              FROM toks, unnest(range(1, len(a) - 13 + 2)) AS t(i)
            ),
            bset AS (SELECT DISTINCT gk FROM g WHERE doc_id % 97 = 0),
            m AS (
              SELECT g.doc_id, count(*) AS nm, count(DISTINCT g.gk) AS nmd
              FROM g JOIN bset USING (gk) GROUP BY g.doc_id
            ),
            spine AS (SELECT doc_id, greatest(len(a) - 12, 0)::BIGINT AS n_ngrams
                      FROM toks)
            SELECT spine.doc_id, n_ngrams,
                   coalesce(m.nm, 0)::BIGINT AS n_matched,
                   coalesce(m.nmd, 0)::BIGINT AS n_matched_distinct,
                   coalesce(m.nmd, 0) >= 1 AS contaminated
            FROM spine LEFT JOIN m USING (doc_id)
        """,
        "jpeg_features": _jpeg_features_oracle(),
        "multimodal_features": """
            WITH px AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     least(octet_length(encode(text)), 192) AS npix
              FROM documents
            ),
            b AS (
              SELECT doc_id, ('0x' || substr(hx, 2*i-1, 2))::INT // 4 AS bin
              FROM px, unnest(range(1, npix + 1)) AS t(i)
            ),
            agg AS (
              SELECT doc_id,
                     sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS c0,
                     sum(CASE WHEN bin = 24 THEN 1 ELSE 0 END) AS c24
              FROM b GROUP BY doc_id
            )
            SELECT px.doc_id AS media_id, 'image' AS kind,
                   (11 + px.npix)::BIGINT AS n_bytes,
                   (coalesce(agg.c0, 0) + (192 - px.npix))::INT AS h0,
                   coalesce(agg.c24, 0)::INT AS h24
            FROM px LEFT JOIN agg USING (doc_id)
        """,
        # PCM16 samples via hex pairs: sample i = byte(2i-1) + 256*byte(2i),
        # two's-complement signed; features are exact integers
        "audio_stats": """
            WITH px AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     octet_length(encode(text)) // 2 AS n
              FROM documents
            ),
            sm AS (
              SELECT doc_id, i,
                     CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
              FROM (
                SELECT doc_id, i,
                       ('0x' || substr(hx, 4*i-3, 2))::INT
                       + 256 * ('0x' || substr(hx, 4*i-1, 2))::INT AS raw
                FROM px, unnest(range(1, n + 1)) AS t(i))
            ),
            lagged AS (
              SELECT doc_id, v,
                     lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
              FROM sm
            ),
            agg AS (
              SELECT doc_id,
                     count(*)::BIGINT AS n_samples,
                     sum(v * v)::BIGINT AS energy,
                     sum(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (v < 0)
                              THEN 1 ELSE 0 END)::BIGINT AS n_zero_crossings
              FROM lagged GROUP BY doc_id
            )
            -- LEFT JOIN the doc spine: n=0 docs keep a (0, 0, 0) row, like
            -- the Spark decoder, instead of vanishing from the unnest
            SELECT px.doc_id AS media_id, 'audio' AS kind,
                   coalesce(agg.n_samples, 0)::BIGINT AS n_samples,
                   coalesce(agg.energy, 0)::BIGINT AS energy,
                   coalesce(agg.n_zero_crossings, 0)::BIGINT AS n_zero_crossings
            FROM px LEFT JOIN agg USING (doc_id)
        """,
        # "docs share an exact 64-byte substring" == "docs share a 64-byte
        # gram": brute self-join on hex-pair byte grams
        "substring_dups": """
            WITH g AS (
              SELECT doc_id, unnest(list_distinct(
                       [substr(hex(encode(text)), 2*i-1, 128)
                        FOR i IN range(1, octet_length(encode(text)) - 62)])) AS gram
              FROM documents WHERE octet_length(encode(text)) >= 64
            )
            SELECT DISTINCT printf('doc-%08d', a.doc_id) AS url_a,
                            printf('doc-%08d', b.doc_id) AS url_b
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        """,
        "corpus_sketch": _corpus_sketch_oracle(k=9, m=4, t=16, seed=42),
        "minhash_signatures": _minhash_signatures_oracle(k=9, t=16, seed=42),
        "near_dup_pairs_m4": _near_dup_m4_oracle(k=9, m=4, t=32, seed=42,
                                                 threshold=0.7),
        "minhash_candidates": _minhash_candidates_oracle(k=9, t=32, bands=8,
                                                         rows=4, seed=42),
        **_dna_oracles(),
        "doc_shingle_counts": """
            SELECT doc_id,
                   len(list_distinct([substring(text, i, 9)
                                      FOR i IN range(1, greatest(length(text)-7, 1))])) AS n_shingles
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(text) AS fingerprint, count(*) AS n_docs, min(doc_id) AS keeper_id
            FROM documents GROUP BY md5(text)
        """,
        "token_stats": r"""
            WITH t AS (
              SELECT doc_id, length(text) AS n_chars, trim(text) AS tt FROM documents
            )
            SELECT doc_id, n_chars,
                   CASE WHEN length(tt)=0 THEN 0
                        ELSE len(regexp_split_to_array(tt, '\s+')) END AS n_tokens,
                   len(regexp_extract_all(tt, '''[A-Za-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s'))::BIGINT AS n_bpe_tokens,
                   CASE WHEN length(tt)=0 OR len(regexp_split_to_array(tt, '\s+'))=0 THEN 0.0
                        ELSE round(length(regexp_replace(tt, '\s+', '', 'g'))::double
                                   / len(regexp_split_to_array(tt, '\s+')), 4) END AS avg_token_len
            FROM t
        """,
        "quality_score": r"""
            WITH t AS (
              SELECT doc_id, text, length(text) AS n,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                     length(regexp_replace(text, '[^!.,;:?]', '', 'g')) AS n_punct,
                     len(regexp_split_to_array(' ' || text || ' ', '\sthe\s')) - 1 AS stopword_hits,
                     CASE WHEN length(trim(text))=0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
              FROM documents
            )
            SELECT doc_id, n AS n_chars, n_digits, n_punct, stopword_hits,
                   CASE WHEN n=0 THEN 0.0
                        ELSE round(100.0 * (1.0 - n_digits::double/n)
                                   * (1.0 - n_punct::double/n)
                                   * least(1.0, n_tokens::double/100.0), 4) END AS quality_score
            FROM t
        """,
        "language_id": r"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_split_to_array(' ' || lower(text) || ' ', ' the ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' and ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' of ')) - 1 AS en_hits,
                     len(regexp_split_to_array(' ' || lower(text) || ' ', ' der ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' und ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' die ')) - 1 AS de_hits,
                     length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS zh_hits
              FROM documents
            )
            SELECT doc_id, en_hits, de_hits, zh_hits,
                   CASE WHEN en_hits >= de_hits AND en_hits >= zh_hits AND en_hits > 0 THEN 'en'
                        WHEN de_hits >= zh_hits AND de_hits > 0 THEN 'de'
                        WHEN zh_hits > 0 THEN 'zh'
                        ELSE 'unknown' END AS detected_lang
            FROM t
        """,
        "md5_fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "exact_dedup_corpus": """
            WITH ranked AS (
              SELECT doc_id, n_chars,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents
            )
            SELECT doc_id, n_chars FROM ranked WHERE rn = 1
        """,
        "ngram_jaccard": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0
            ),
            tg AS (
              SELECT doc_id, unnest(list_distinct(
                       [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]
                     )) AS trigram
              FROM toks WHERE len(t) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_tg FROM tg GROUP BY doc_id),
            rare AS (
              SELECT tg.doc_id, tg.trigram FROM tg
              JOIN (SELECT trigram FROM tg GROUP BY trigram HAVING count(*) <= 50) r
                ON tg.trigram = r.trigram
            ),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM rare a JOIN rare b ON a.trigram = b.trigram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, n_common,
                   round(n_common::double / (sa.n_tg + sb.n_tg - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common::double / (sa.n_tg + sb.n_tg - n_common) >= 0.02
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::double[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.qv, e.embedding::double[]), 6) AS cosine
              FROM q, embeddings e WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_c,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_c,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, count(*) AS n_orders,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_c
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "top_events_per_user": """
            WITH ranked AS (
              SELECT user_id, event_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC) AS rank
              FROM events WHERE user_id < 20
            )
            SELECT user_id, rank, event_id, event_type, value FROM ranked WHERE rank <= 3
        """,
        "event_type_stats": """
            SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   CAST(round(sum(value) * 100) AS BIGINT) AS value_c
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "tpch_q3_like": """
            SELECT l_orderkey,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_c,
                   count(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue_c DESC, l_orderkey ASC
            LIMIT 10
        """,
        "parts_by_brand": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_brand HAVING count(*) >= 5 ORDER BY p_brand
        """,
        "orders_rollup": """
            SELECT o_orderpriority, year(o_orderdate) AS o_year,
                   count(*) AS n_orders,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_c
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, year(o_orderdate))
        """,
        "user_sessions": """
            WITH o AS (
              SELECT user_id, ts, event_id, value,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            ),
            b AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN prev IS NULL
                               OR floor(epoch(ts))::BIGINT - floor(epoch(prev))::BIGINT > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM o
            ),
            s AS (
              SELECT user_id, ts, value,
                     (sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_seq
              FROM b
            )
            SELECT user_id, session_seq,
                   floor(epoch(min(ts)))::BIGINT AS start_s,
                   floor(epoch(max(ts)))::BIGINT AS end_s,
                   count(*) AS n_events,
                   floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT AS duration_s,
                   CAST(round(sum(value) * 100) AS BIGINT) AS value_c
            FROM s GROUP BY user_id, session_seq
        """,
    }

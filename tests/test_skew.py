"""Forced-hot-bucket skew path at volume: salting must bound the candidate
expansion at O(s * cap) while chain links keep mega-duplicate groups
connected across sub-buckets (testdata buckets sit under bucket_cap, so the
oracle surface only ever exercises the salt=0 path — this pins the salted
path itself)."""

from pyspark.sql import functions as F

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.operators.connected_components import connected_components
from minhashsketch_spark.operators.lsh import (
    candidate_pairs,
    explode_bands,
    salt_hot_buckets,
)
from minhashsketch_spark.operators.signatures import compute_signatures

N_DOCS = 5000
CAP = 64
CFG = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=11, threshold=0.7,
                     bucket_cap=CAP)


def _mega_bucket_docs(spark, n=N_DOCS):
    # identical text -> identical signatures -> every band is ONE bucket of
    # n docs (the boilerplate-page skew shape that motivates salting)
    return spark.range(n).select(
        F.format_string("doc-%08d", F.col("id")).alias("url"),
        F.lit("the same boilerplate page body across the whole crawl").alias("text"),
    )


def test_salting_bounds_candidates_and_chains_keep_connectivity(spark):
    docs = _mega_bucket_docs(spark)
    sigs = compute_signatures(docs, CFG)

    salted = salt_hot_buckets(explode_bands(sigs), CFG.bucket_cap)
    n_salt = salted.agg(F.max("n_salt")).collect()[0][0]
    assert n_salt > 1, "the hot path must actually engage"

    cand = candidate_pairs(sigs, CFG).localCheckpoint()
    n_cand = cand.count()
    # (b) bounded expansion: within-pairs per band are
    # n_salt * C(~s/n_salt, 2) <= s*cap/2, plus <= s chain links; bands
    # collapse under dropDuplicates (identical docs -> identical salts)
    assert n_cand <= N_DOCS * CAP // 2 + N_DOCS
    assert n_cand < N_DOCS * (N_DOCS - 1) // 4, "must stay far from O(s^2)"

    # (a) no pair loss through chains: identical docs verify at sim 1.0, so
    # every candidate is a true edge — the chain links must keep the whole
    # mega-group one connected component across all sub-buckets
    clusters = connected_components(cand, max_iterations=CFG.max_cc_iterations)
    assert clusters.count() == N_DOCS
    assert clusters.select("cluster_id").distinct().count() == 1


def test_two_level_salting_10x_no_whole_band_task(spark):
    """VERDICT r4 #5 at 10x the planted bucket (50k identical docs): the
    sizing must come from a hash-agg (no count-over-window buffering the
    whole band in one task), sub-buckets must stay ~cap-sized, the only
    Window in the candidate plan is the rep chain whose partitions hold
    <= n_salt rows, and the candidate volume stays O(s*cap)."""
    import re

    n = 10 * N_DOCS
    docs = _mega_bucket_docs(spark, n)
    sigs = compute_signatures(docs, CFG).localCheckpoint()

    salted = salt_hot_buckets(explode_bands(sigs), CFG.bucket_cap)
    plan = salted._sc._jvm.PythonSQLUtils.explainString(
        salted._jdf.queryExecution(), "formatted")
    assert "Window" not in plan, plan  # sizing is hash-agg + join
    salted = salted.localCheckpoint()
    # no task ever holds a whole band: the pair join partitions by
    # (band_key, salt), and every sub-bucket is ~cap (hash-split margin 2x)
    mx = (salted.groupBy("band_key", "salt").count()
          .agg(F.max("count")).collect()[0][0])
    assert mx <= 2 * CAP, mx
    n_salt = salted.agg(F.max("n_salt")).collect()[0][0]
    assert n_salt >= n // CAP  # the hot path engaged at 10x

    cand = candidate_pairs(sigs, CFG)
    cplan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted")
    # exactly one Window pass (the rep chain) and it sits above the rep
    # hash-aggregate, i.e. over (band_key, sig_key)-partitioned reps
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", cplan)
    assert win_specs, cplan
    for spec in win_specs:
        assert "sig_key" in spec, cplan  # never the raw whole-band chain
    n_cand = cand.count()
    assert n_cand <= n * CAP // 2 + n
    assert n_cand < n * (n - 1) // 4, "must stay far from O(s^2)"


def test_embedding_hot_bucket_chains_connect_identical_vectors(spark):
    """ADVICE r2: chain pairs in embedding_near_dup_pairs are
    threshold-filtered individually, so cross-sub-bucket recall relies on
    the chain *intermediates* passing the cosine filter. For the case that
    matters (a hot bucket of identical/near-identical embeddings) every
    chain hop passes, so the planted group must come out fully connected."""
    import numpy as np

    from minhashsketch_spark.operators.similarity import embedding_near_dup_pairs

    rng = np.random.RandomState(3)
    base = rng.standard_normal(64)
    n_dup, n_noise = 40, 200
    rows = [(int(i), (base + rng.standard_normal(64) * 1e-4).tolist())
            for i in range(n_dup)]
    rows += [(int(n_dup + i), rng.standard_normal(64).tolist())
             for i in range(n_noise)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    pairs = embedding_near_dup_pairs(emb, threshold=0.9, n_tables=4,
                                     n_planes=3, bucket_cap=8).collect()
    # near-identical vectors share every table's bucket -> a bucket of 40
    # over cap 8 -> n_salt = 5 sub-buckets; chains must bridge them
    edges = [(r["id_a"], r["id_b"]) for r in pairs
             if r["id_a"] < n_dup and r["id_b"] < n_dup]
    parent = list(range(n_dup))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots = {find(i) for i in range(n_dup)}
    assert roots == {find(0)}, f"planted group split into {len(roots)} components"
    # and no false positives against the noise vectors
    assert all(r["cosine"] >= 0.9 for r in pairs)


def test_cross_corpus_replication_keeps_all_pairs_through_hot_bucket(spark):
    """Index-side mega-bucket (identical docs over cap): the new side is
    replicated across the salt range, so EVERY (new, index) dup pair must
    survive — replication redistributes skew, it never drops pairs."""
    from pyspark.sql import functions as F

    from minhashsketch_spark.operators.cross_dedup import cross_corpus_dup_pairs

    n_idx, n_new = 600, 5
    text = "the same boilerplate page body across the whole crawl"
    idx = spark.range(n_idx).select(
        F.format_string("idx-%06d", F.col("id")).alias("url"), F.lit(text).alias("text"))
    new = spark.range(n_new).select(
        F.format_string("new-%06d", F.col("id")).alias("url"), F.lit(text).alias("text"))
    cfg = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=11, threshold=0.7,
                         bucket_cap=64)  # 600 docs / cap 64 -> n_salt = 10
    ver = cross_corpus_dup_pairs(new, idx, cfg)
    dups = ver.filter("is_dup").select("url_new", "url_idx").distinct()
    assert dups.count() == n_new * n_idx  # nothing lost to salting


def test_indexed_cross_corpus_equals_adhoc_through_hot_bucket(spark, tmp_path):
    """The persisted-bucketed-index path (build_band_index +
    cross_corpus_dup_pairs_indexed) must produce exactly the ad-hoc path's
    verified pairs, including through an index-side mega-bucket (salts are
    stored in the index table and folded into the bucketed join key)."""
    from minhashsketch_spark.operators.cross_dedup import (
        build_band_index,
        cross_corpus_dup_pairs,
        cross_corpus_dup_pairs_indexed,
    )

    n_idx, n_new = 600, 5
    text = "the same boilerplate page body across the whole crawl"
    idx = spark.range(n_idx).select(
        F.format_string("idx-%06d", F.col("id")).alias("url"),
        (F.lit(text)).alias("text"))
    # a few unique new docs too, so the candidate set isn't all-dups
    new = spark.range(n_new).select(
        F.format_string("new-%06d", F.col("id")).alias("url"),
        F.when(F.col("id") < 3, F.lit(text))
        .otherwise(F.concat(F.lit("unique page body number "),
                            F.col("id").cast("string"),
                            F.lit(" with its own distinct words"))).alias("text"))
    cfg = PipelineConfig(k=9, m=1, t=16, bands=4, rows=4, seed=11, threshold=0.7,
                         bucket_cap=64)  # 600 docs / cap 64 -> n_salt = 10
    key = lambda r: (r["url_new"], r["url_idx"], round(r["est_sim"], 9),
                     round(r["jaccard"], 9), r["is_dup"])
    adhoc = sorted(key(r) for r in cross_corpus_dup_pairs(new, idx, cfg).collect())
    try:
        build_band_index(spark, idx, cfg, "t_xidx", n_buckets=8,
                         path_root=str(tmp_path / "xidx"))
        indexed = sorted(key(r) for r in cross_corpus_dup_pairs_indexed(
            spark, new, "t_xidx", cfg).collect())
    finally:
        for s in ("sigs", "bands", "dim"):
            spark.sql(f"DROP TABLE IF EXISTS t_xidx_{s}")
    assert len(adhoc) == len(indexed) > 0
    assert adhoc == indexed

"""Cross-session band-index persistence (VERDICT r4 ask #4): a continuous
crawl deployment restarts its driver; the bucketed index parquet survives on
disk but the in-memory session catalog does not. register_band_index must
re-attach the layout in a FRESH driver with the zero-index-Exchange plan
property intact — pinned here by actually starting a second driver process."""

import json
import os
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from minhashsketch_spark.config import PipelineConfig

CFG = dict(k=9, m=1, t=16, bands=4, rows=4, seed=1, threshold=0.7,
           bucket_cap=16)


def _corpus_and_split(spark):
    from minhashsketch_spark.sources.corpus import corpus_dataframe

    docs, _ = corpus_dataframe(spark, n_docs=80, seed=3)
    par = F.pmod(F.xxhash64("url"), F.lit(2))
    return docs.filter(par == 0), docs.filter(par == 1)


def test_register_band_index_in_fresh_driver(spark, tmp_path):
    from minhashsketch_spark.operators.cross_dedup import (
        build_band_index, cross_candidate_pairs_indexed)
    from minhashsketch_spark.operators.signatures import compute_signatures

    cfg = PipelineConfig(**CFG)
    idx_docs, batch = _corpus_and_split(spark)
    root = str(tmp_path / "bidx")
    try:
        build_band_index(spark, idx_docs, cfg, "t_xs_idx", n_buckets=8,
                         path_root=root)
        assert os.path.exists(f"{root}/index.manifest.json")
        # session-1 ground truth for the batch's candidates
        sig_n = compute_signatures(batch, cfg).localCheckpoint()
        expect = sorted((r["url_new"], r["url_idx"]) for r in
                        cross_candidate_pairs_indexed(spark, sig_n,
                                                      "t_xs_idx").collect())
    finally:
        for s in ("sigs", "bands", "dim"):
            spark.sql(f"DROP TABLE IF EXISTS t_xs_idx_{s}")
    assert expect, "fixture must produce candidates"

    # fresh driver: new JVM, empty catalog — register from the manifest and
    # require the same candidates AND the same bucketed zero-index-Exchange
    # plan the in-session test pins
    script = textwrap.dedent(f"""
        import json, re, sys
        from pyspark.sql import SparkSession, functions as F
        from minhashsketch_spark.operators.cross_dedup import (
            register_band_index, cross_candidate_pairs_indexed)
        from minhashsketch_spark.operators.signatures import compute_signatures
        from minhashsketch_spark.sources.corpus import corpus_dataframe

        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.sql.autoBroadcastJoinThreshold", "-1")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.warehouse.dir", {str(tmp_path / "wh2")!r})
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        cfg = register_band_index(spark, "t_xs_idx", {root!r})
        assert (cfg.k, cfg.t, cfg.bands, cfg.seed) == (9, 16, 4, 1), cfg
        docs, _ = corpus_dataframe(spark, n_docs=80, seed=3)
        batch = docs.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
        sig_n = compute_signatures(batch, cfg).localCheckpoint()
        cand = cross_candidate_pairs_indexed(spark, sig_n, "t_xs_idx")
        plan = cand._sc._jvm.PythonSQLUtils.explainString(
            cand._jdf.queryExecution(), "formatted")
        assert plan.count("Bucketed: true") == 2, plan
        assert "disabled by query planner" not in plan, plan
        n_ex = len(re.findall(r"^\\(\\d+\\) Exchange", plan, re.M))
        assert n_ex <= 3, plan
        pairs = sorted((r["url_new"], r["url_idx"]) for r in cand.collect())
        print("PAIRS_JSON:" + json.dumps(pairs))
        spark.stop()
    """)
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          cwd="/root/repo", capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("PAIRS_JSON:")]
    assert line, proc.stdout[-2000:]
    got = sorted(tuple(p) for p in json.loads(line[0][len("PAIRS_JSON:"):]))
    assert got == expect


def test_register_band_index_rejects_wrong_bucket_spec(spark, tmp_path):
    from minhashsketch_spark.operators.cross_dedup import (
        build_band_index, register_band_index)

    cfg = PipelineConfig(**CFG)
    idx_docs, _ = _corpus_and_split(spark)
    root = str(tmp_path / "bidx2")
    try:
        build_band_index(spark, idx_docs, cfg, "t_xs2_idx", n_buckets=8,
                         path_root=root)
        import pytest

        with pytest.raises(ValueError, match="must match the files' writer"):
            register_band_index(spark, "t_xs2_idx", root, n_buckets=16)
    finally:
        for s in ("sigs", "bands", "dim"):
            spark.sql(f"DROP TABLE IF EXISTS t_xs2_idx_{s}")

"""LSH candidate generation: band keys -> candidate url pairs.

New operator required by BASELINE.json north_star ("LSH band hashing groups
candidates") — the reference compares exactly two documents (O16) and has no
join; at 10^12 docs the all-pairs comparison becomes this band-bucket
self-join.

Scale design (the shuffle hotspot of the whole pipeline — north_rule:
"partitioning / shuffle / skew handled explicitly"):

* one shuffle groups by ``band_key``; AQE skew-join enabled as backstop.
* **hot-bucket salting**: boilerplate/empty pages collapse into mega-buckets
  whose pair expansion is O(n^2). A bucket of size s > cap is split into
  ``n_salt = ceil(s/cap)`` sub-buckets by ``pmod(xxhash64(url), n_salt)``
  (seeded, stable — resume stays byte-identical); pairs are generated
  within sub-buckets only, bounding the expansion at O(s * cap) instead of
  O(s^2) while *keeping every document* (nothing is dropped).
* **chain links**: salting alone would disconnect exact-duplicate groups
  that straddle sub-buckets, so each hot bucket also emits a linear chain
  of candidate pairs ordered by (sig_key, url) — identical signatures sort
  adjacent, so exact-dup groups stay connected through verification (their
  est_sim is 1.0) at O(s) extra candidates. False chain candidates are
  pruned by verification, never reaching the cluster stage.
* pair emission via self-equi-join on (band_key, salt) with
  ``url_a < url_b``; dedup across bands with ``dropDuplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import PipelineConfig


def explode_bands(signatures: DataFrame) -> DataFrame:
    """(url, sig_key, bands[b]) -> (url, sig_key, band_key)."""
    cols = ["url"] + (["sig_key"] if "sig_key" in signatures.columns else [])
    return signatures.select(*cols, F.explode("bands").alias("band_key"))


def bucket_stats(bands: DataFrame) -> DataFrame:
    """Per-bucket sizes — drives skew metrics."""
    return bands.groupBy("band_key").agg(F.count("*").alias("bucket_size"))


def salt_hot_buckets(bands: DataFrame, cap: int) -> DataFrame:
    """Attach (bucket_size, n_salt, salt); drop singleton buckets early
    (they generate no pairs — the common case by far)."""
    w = Window.partitionBy("band_key")
    sized = bands.withColumn("bucket_size", F.count("*").over(w))
    multi = sized.filter(F.col("bucket_size") >= 2)
    return (
        multi.withColumn("n_salt",
                         F.ceil(F.col("bucket_size") / F.lit(cap)).cast("int"))
        .withColumn("salt",
                    F.when(F.col("n_salt") <= 1, F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("url"), F.col("n_salt")).cast("int")))
    )


def candidate_pairs(signatures: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """signatures -> distinct (url_a, url_b) candidate pairs, url_a < url_b."""
    bands = explode_bands(signatures)
    salted = salt_hot_buckets(bands, cfg.bucket_cap)
    # materialize before the self-join: otherwise Catalyst plans the
    # signature UDF + band windows TWICE (once per join side) — at scale the
    # signature stage is the most expensive narrow stage in the pipeline.
    # EAGER localCheckpoint, not lazy persist: the join sides + chain window
    # would otherwise race to compute the same partitions (in run_pipeline
    # the signatures additionally arrive from a parquet checkpoint)
    salted = salted.localCheckpoint()

    left = salted.select("band_key", "salt", F.col("url").alias("url_a"))
    right = salted.select("band_key", "salt", F.col("url").alias("url_b"))
    within = (
        left.join(right, on=["band_key", "salt"])
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
    )

    wchain = Window.partitionBy("band_key").orderBy("sig_key", "url")
    chains = (
        salted.filter(F.col("n_salt") > 1)
        .withColumn("prev", F.lag("url").over(wchain))
        .filter(F.col("prev").isNotNull())
        .select(F.least("prev", "url").alias("url_a"),
                F.greatest("prev", "url").alias("url_b"))
    )
    return within.union(chains).dropDuplicates(["url_a", "url_b"])

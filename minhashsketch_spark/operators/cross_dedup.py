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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import PipelineConfig
from .lsh import explode_bands
from .signatures import compute_signatures
from .verify import verified_pairs


def cross_candidate_pairs(new_sigs: DataFrame, index_sigs: DataFrame,
                          cfg: PipelineConfig) -> DataFrame:
    """(url_new, url_idx) candidates: pairs sharing >= 1 LSH band key."""
    nb = explode_bands(new_sigs).select("band_key", F.col("url").alias("url_new"))
    ib = explode_bands(index_sigs).select("band_key", F.col("url").alias("url_idx"))

    w = Window.partitionBy("band_key")
    ib = (
        ib.withColumn("bucket_size", F.count("*").over(w))
        .withColumn("n_salt",
                    F.ceil(F.col("bucket_size") / F.lit(cfg.bucket_cap)).cast("int"))
        .withColumn("salt",
                    F.when(F.col("n_salt") <= 1, F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("url_idx"), F.col("n_salt")).cast("int")))
        .select("band_key", "salt", "n_salt", "url_idx")
    ).localCheckpoint()  # window + signature-UDF lineage runs exactly once

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
                           text_col: str = "text") -> DataFrame:
    """Verified near-dup pairs (url_new, url_idx, est_sim, jaccard, is_dup)
    between an incoming batch and an existing index."""
    sig_n = compute_signatures(new_docs, cfg, url_col, text_col)
    sig_i = compute_signatures(index_docs, cfg, url_col, text_col)
    cand = cross_candidate_pairs(sig_n, sig_i, cfg).select(
        F.col("url_new").alias("url_a"), F.col("url_idx").alias("url_b"))
    sigs = sig_n.unionByName(sig_i)
    docs = (new_docs.select(F.col(url_col), F.col(text_col))
            .unionByName(index_docs.select(F.col(url_col), F.col(text_col))))
    ver = verified_pairs(cand, sigs, docs, cfg, url_col, text_col)
    return ver.select(F.col("url_a").alias("url_new"),
                      F.col("url_b").alias("url_idx"),
                      "est_sim", "jaccard", "is_dup")

"""Deduplication family for training-data pipelines:

* exact dedup        — md5 hash-groupBy (one shuffle on a 128-bit key)
* n-gram Jaccard     — token-trigram explode + self-equi-join (SQL-expressible)
* SimHash            — 64-bit sign-aggregated token hashes, Hamming buckets
* embedding near-dup — cosine >= threshold via the similarity operator

MinHash+LSH lives in signatures.py/lsh.py (the flagship path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: (fingerprint, n_docs, keeper_id).

    keeper = min id; scale: single hash-agg shuffle, map-side partial agg.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def trigrams(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, trigram) — distinct whitespace-token trigrams per doc."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tg = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                              F.element_at(toks, i + 2), F.element_at(toks, i + 3)),
    )
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .filter(F.size(toks) >= 3)
        .select(F.col(id_col), F.explode(F.array_distinct(tg)).alias("trigram"))
    )


def ngram_jaccard_pairs(docs: DataFrame, min_jaccard: float = 0.5,
                        max_df: int = 50,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Trigram-set Jaccard for all doc pairs sharing >= 1 *rare* trigram.

    Pure relational plan (explode -> self-join -> agg), fully
    SQL-expressible for the DuckDB oracle. At scale the equi-join on
    ``trigram`` replaces the quadratic all-pairs scan; trigrams appearing in
    more than ``max_df`` docs are excluded from the *join* (boilerplate
    carries no signal and its pair expansion is O(df^2) — same skew story
    as LSH hot buckets) while still counting toward each doc's set size, so
    the Jaccard denominator is exact and only pairs sharing nothing but
    ultra-common trigrams are missed.
    """
    tg = trigrams(docs, id_col, text_col).persist()  # consumed 4x below
    sizes = tg.groupBy(id_col).agg(F.count("*").alias("n_tg"))
    doc_freq = tg.groupBy("trigram").agg(F.count("*").alias("df"))
    rare = tg.join(doc_freq.filter(F.col("df") <= max_df).select("trigram"), "trigram")
    a = rare.select(F.col(id_col).alias("id_a"), "trigram")
    b = rare.select(F.col(id_col).alias("id_b"), "trigram")
    inter = (
        a.join(b, "trigram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tg").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tg").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard",
                    F.round(F.col("n_common").cast("double")
                            / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


SIMHASH_SCHEMA = "doc_id bigint, simhash bigint"


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sum token-hash
    sign vectors, take the sign per bit. Vectorized NumPy per Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col].values):
                toks = (text or "").split()
                if not toks:
                    continue
                # FNV-1a per token, vectorized over unique tokens
                uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
                hs = np.empty(len(uniq), dtype=np.uint64)
                for j, tok in enumerate(uniq):
                    h = np.uint64(0xCBF29CE484222325)
                    for ch in tok.encode():
                        h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                    hs[j] = h
                bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
                weights = (2 * bitmat - 1) * counts[:, None]
                sh = (weights.sum(axis=0) > 0).astype(np.uint64)
                out[i] = (sh << bits).sum().astype(np.uint64).view(np.int64)
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "simhash": out})

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(gen, schema=SIMHASH_SCHEMA)


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on 4 x 16-bit sub-keys (pigeonhole: any pair within
    Hamming 3 shares at least one exact 16-bit block) -> equi-join per
    block, then exact popcount filter. No quadratic scan.
    """
    sim = sim.persist()  # scanned once per 16-bit block
    blocks = []
    for blk in range(4):
        shift = blk * 16
        blocks.append(
            sim.select(
                "doc_id", "simhash",
                F.lit(blk).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), shift).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
        )
    keyed = blocks[0]
    for b in blocks[1:]:
        keyed = keyed.union(b)
    a = keyed.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "key")
    b = keyed.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "key")
    pairs = (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs

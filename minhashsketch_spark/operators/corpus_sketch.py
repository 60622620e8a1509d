"""Corpus-level MinHash sketch — O12/O13 as a *distributed* aggregation.

The reference merges per-block/per-chunk bottom-m lists with rank-merge and
``rMerge`` (``/root/reference/src/MinhashSketch.cu:186-300``). The same
algebra — bottom-m(union) = merge of per-part bottom-m's — is exactly what
makes Spark's partial+final aggregation correct, so the corpus sketch is:

  per Arrow batch: bottom-m distinct of all shingle hashes   (partial, map-side)
  intermediate:    partials -> pmod(partition_id, 64) groups -> vectorized
                   rMerge per group (a distributed reduction stage)
  final: rMerge-fold of <= 64 group sketches                  (driver)

Result: the t x m sketch of the ENTIRE corpus's shingle set — usable for
corpus-level Jaccard between two crawls (e.g. dataset-overlap estimation)
at one pass over the data plus one tiny shuffle of t*m*8-byte rows. The
two-level tree keeps the driver collect at O(reduce_groups), not
O(num_scan_tasks) — at ~10^6 tasks a flat collect would fold ~10^6 x t x m
values in a Python loop on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..core.shingles import bottom_m_matrix, get_family, shingle_hashes
from ..core.sketch import UINT64_MAX


def merge_sketches(mats: list[np.ndarray], m: int) -> np.ndarray:
    """Vectorized rMerge-fold of many (t, m') sketch matrices: per row,
    bottom-m distinct of the union (== folding core.sketch.r_merge row by
    row — associative/commutative, so any grouping gives the same bits).

    One sort over (t, sum(m')) instead of t Python-level np.unique calls:
    sort each row, blank row-local duplicates to the UINT64_MAX pad (a
    surviving genuine MAX equals the pad by definition), re-sort, keep m.
    """
    c = np.sort(np.concatenate(mats, axis=1), axis=1)
    dup = np.zeros(c.shape, dtype=bool)
    dup[:, 1:] = c[:, 1:] == c[:, :-1]
    c[dup] = UINT64_MAX
    c = np.sort(c, axis=1)
    return np.ascontiguousarray(c[:, :m])


def corpus_sketch(docs: DataFrame, cfg: PipelineConfig,
                  text_col: str = "text",
                  reduce_groups: int = 64) -> np.ndarray:
    """(t, m) uint64 bottom-m sketch of the union of all docs' shingles."""
    k, t, m = cfg.k, cfg.t, cfg.m
    a_par, b_par = get_family(t, cfg.seed)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bottom-m(union of sets) == fold of per-doc bottom-m's (merge
        # associativity, O12/O13) — so hash the whole batch's shingles into
        # one union set and sketch it once: no per-doc t-loop in Python
        acc = np.full((t, m), UINT64_MAX, dtype=np.uint64)
        saw = False
        for pdf in batches:
            hs = [shingle_hashes((text or "").encode("utf-8", "surrogatepass"), k)
                  for text in pdf[text_col].values]
            hs = [h for h in hs if h.shape[0]]
            if not hs:
                continue
            saw = True
            xs = np.unique(np.concatenate(hs))
            sk = bottom_m_matrix(xs, a_par, b_par, m)
            acc = merge_sketches([acc, sk], m)
        if saw:
            yield pd.DataFrame({"partial": [acc.reshape(-1).view(np.int64)]})

    def reduce_group(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mats = [np.asarray(arr, dtype=np.int64).view(np.uint64).reshape(t, m)
                for pdf in batches for arr in pdf["partial"].values]
        if mats:
            yield pd.DataFrame(
                {"partial": [merge_sketches(mats, m).reshape(-1).view(np.int64)]})

    from ..partitioning import ensure_parallelism

    partials = ensure_parallelism(docs.select(F.col(text_col))).mapInPandas(
        partial, schema="partial array<bigint>")
    # distributed intermediate reduction: one row per scan task -> one row
    # per group; the shuffle moves t*m*8 bytes per task, nothing more
    reduced = (partials
               .withColumn("grp", F.pmod(F.spark_partition_id(),
                                         F.lit(reduce_groups)))
               .repartition(reduce_groups, "grp")
               .drop("grp")
               .mapInPandas(reduce_group, schema="partial array<bigint>")
               .collect())
    mats = [np.asarray(row["partial"], dtype=np.int64).view(np.uint64).reshape(t, m)
            for row in reduced]
    if not mats:
        return np.full((t, m), UINT64_MAX, dtype=np.uint64)
    return merge_sketches(mats, m)


def corpus_sketch_df(docs: DataFrame, cfg: PipelineConfig,
                     text_col: str = "text") -> DataFrame:
    """DataFrame view: (hash_idx, rank, value) of the corpus sketch."""
    sk = corpus_sketch(docs, cfg, text_col)

    def as_i64(v: int) -> int:  # uint64 -> two's-complement bigint
        return v - 2**64 if v >= 2**63 else v

    rows = [(j, r, as_i64(int(sk[j, r])))
            for j in range(sk.shape[0]) for r in range(sk.shape[1])]
    return docs.sparkSession.createDataFrame(
        rows, schema="hash_idx int, rank int, value bigint")

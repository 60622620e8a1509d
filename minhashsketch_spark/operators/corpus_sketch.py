"""Corpus-level MinHash sketch — O12/O13 as a *distributed* aggregation.

The reference merges per-block/per-chunk bottom-m lists with rank-merge and
``rMerge`` (``/root/reference/src/MinhashSketch.cu:186-300``). The same
algebra — bottom-m(union) = merge of per-part bottom-m's — is exactly what
makes Spark's partial+final aggregation correct, so the corpus sketch is:

  per Arrow batch: bottom-m distinct of all shingle hashes   (partial, map-side)
  final: rMerge-fold of the tiny per-batch sketches           (driver)

Result: the t x m sketch of the ENTIRE corpus's shingle set — usable for
corpus-level Jaccard between two crawls (e.g. dataset-overlap estimation)
at one pass over the data, no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..core.shingles import bottom_m_matrix, get_family, shingle_hashes
from ..core.sketch import UINT64_MAX, r_merge


def corpus_sketch(docs: DataFrame, cfg: PipelineConfig,
                  text_col: str = "text") -> np.ndarray:
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
            for j in range(t):
                acc[j] = r_merge(m, sk[j], acc[j])
        if saw:
            yield pd.DataFrame({"partial": [acc.reshape(-1).view(np.int64)]})

    from ..partitioning import ensure_parallelism

    partials = ensure_parallelism(docs.select(F.col(text_col))).mapInPandas(
        partial, schema="partial array<bigint>").collect()
    final = np.full((t, m), UINT64_MAX, dtype=np.uint64)
    for row in partials:
        sk = np.asarray(row["partial"], dtype=np.int64).view(np.uint64).reshape(t, m)
        for j in range(t):
            final[j] = r_merge(m, sk[j], final[j])
    return final


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

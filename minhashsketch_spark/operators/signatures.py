"""Signature stage: documents -> MinHash signatures + LSH band keys.

The Spark re-expression of the reference's ``genSig`` driver (O15,
``/root/reference/src/MinhashSketch.cu:302-379``): one ``mapInPandas`` pass
computes, per Arrow batch, every document's distinct shingle set, its t
MinHash values (k-independent a*x+b mod p family) and its LSH band keys in
vectorized NumPy. Spark partitions play the role of the reference's CUDA
chunks; the (a, b) parameter table is tiny and shipped in the closure
(equivalent of the broadcast of ``hashes_b``).

Scale notes (100 TB / 10^12 docs):
* no shuffle here — narrow map over the scan; Catalyst prunes the scan to
  (url, text) only;
* signatures are emitted as ``array<bigint>`` (uint64 stored as
  two's-complement — SURVEY.md H1: only *equality* is ever evaluated
  JVM-side, so signedness is safe);
* shingle sets are transient (never a Spark column) except for candidate
  verification, which recomputes them for the <<1% of docs in pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..core.shingles import (
    band_keys_batch,
    distinct_shingles,
    get_family,
    minhash_matrix,
)

SIG_SCHEMA = ("url string, n_shingles bigint, sig array<bigint>, "
              "bands array<bigint>, sig_key bigint")


def compute_signatures(docs: DataFrame, cfg: PipelineConfig,
                       url_col: str = "url", text_col: str = "text") -> DataFrame:
    """documents(url, text, ...) -> (url, n_shingles, sig[t], bands[b])."""
    k, t, bands, rows = cfg.k, cfg.t, cfg.bands, cfg.rows
    a_par, b_par = get_family(t, cfg.seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = pdf[url_col].values
            texts = pdf[text_col].values
            n = len(urls)
            sigs = np.empty((n, t), dtype=np.uint64)
            counts = np.empty(n, dtype=np.int64)
            for i in range(n):
                text = texts[i] or ""
                xs = distinct_shingles(text.encode("utf-8", "surrogatepass"), k)
                counts[i] = xs.shape[0]
                sigs[i] = minhash_matrix(xs, a_par, b_par)
            bk = band_keys_batch(sigs, bands, rows) if n else np.empty((0, bands), np.int64)
            # sig_key: one 64-bit fingerprint of the whole signature (a
            # 1-band x t-row "band") — exact-signature groups share it
            sk = (band_keys_batch(sigs, 1, t)[:, 0] if n else np.empty(0, np.int64))
            yield pd.DataFrame({
                "url": urls,
                "n_shingles": counts,
                "sig": list(sigs.view(np.int64)),
                "bands": list(bk),
                "sig_key": sk,
            })

    return (
        docs.select(F.col(url_col).alias(url_col), F.col(text_col).alias(text_col))
        .mapInPandas(gen, schema=SIG_SCHEMA)
    )

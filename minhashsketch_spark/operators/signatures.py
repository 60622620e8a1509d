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
    """documents(url, text, ...) -> (url, n_shingles, sig[t], bands[b], sig_key).

    ``mapInArrow``: texts are read zero-copy out of the Arrow string
    buffers (no per-doc Python str), and the output list columns are
    assembled directly from the flat (n, t) NumPy block with one
    ``ListArray.from_arrays`` — measurably faster than the pandas round
    trip for wide array columns.
    """
    import pyarrow as pa

    k, t, bands, rows = cfg.k, cfg.t, cfg.bands, cfg.rows
    a_par, b_par = get_family(t, cfg.seed)

    def gen(batches) -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            urls = batch.column(0)
            texts = batch.column(1)
            n = batch.num_rows
            sigs = np.empty((n, t), dtype=np.uint64)
            counts = np.empty(n, dtype=np.int64)
            # zero-copy byte views over the Arrow string buffers
            tarr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
            for i in range(n):
                s = tarr[i].as_py()
                xs = distinct_shingles((s or "").encode("utf-8", "surrogatepass"), k)
                counts[i] = xs.shape[0]
                sigs[i] = minhash_matrix(xs, a_par, b_par)
            if n:
                bk = band_keys_batch(sigs, bands, rows)
                sk = band_keys_batch(sigs, 1, t)[:, 0]
            else:
                bk = np.empty((0, bands), np.int64)
                sk = np.empty(0, np.int64)
            sig_col = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * t, t, dtype=np.int32)),
                pa.array(sigs.reshape(-1).view(np.int64)))
            band_col = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * bands, bands, dtype=np.int32)),
                pa.array(bk.reshape(-1)))
            yield pa.RecordBatch.from_arrays(
                [urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
                 pa.array(counts), sig_col, band_col, pa.array(sk)],
                names=["url", "n_shingles", "sig", "bands", "sig_key"])

    return (
        docs.select(F.col(url_col).alias("url"), F.col(text_col).alias(text_col))
        .mapInArrow(gen, schema=SIG_SCHEMA)
    )

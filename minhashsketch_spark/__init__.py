"""minhashsketch_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine with the query/data-processing capabilities of
daren996/MinhashSketch (reference, read-only, at /root/reference).

Layout:
  core/       pure-NumPy parity kernels (RNG, SpookyHash, k-mer packing,
              sketches, similarity) — no Spark imports
  operators/  DataFrame-level stages (signatures, LSH, verification,
              connected components, dedup, text analysis, similarity search)
  sources/    IO (iceberg-with-parquet-fallback), synthetic corpus generator
  pipeline.py end-to-end near-dup pipeline with checkpoint/resume + metrics
"""

__version__ = "0.1.0"

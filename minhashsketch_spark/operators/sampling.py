"""Deterministic hash-based sampling and splits — how a training pipeline
takes reproducible subsets of a 10^12-doc corpus: membership is a pure
function of the row's key, so the same doc lands in the same split on every
run, on every cluster, regardless of partitioning (none of which holds for
``DataFrame.sample``'s per-partition RNG).

The hash is the first 15 hex chars of md5(key) read as a 60-bit integer —
identical in Spark (conv/substring/md5) and DuckDB ('0x' || substr(md5..)),
so every operator here is oracle-checkable. A fraction ``p`` keeps rows
with h < p * 2^60: subset property holds (p1 < p2 => sample(p1) is a subset
of sample(p2)), and disjoint [lo, hi) bands give exact splits.

All pure Column expressions: narrow maps, zero shuffle, filter runs
pre-shuffle at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 60


def hash60_expr(key_col: str = "url"):
    """60-bit md5-prefix hash of the key as a bigint Column (cross-engine
    identical; the same construction simhash_jvm uses per token)."""
    return F.conv(F.substring(F.md5(F.col(key_col)), 1, 15), 16, 10).cast("bigint")


def hash_sample(docs: DataFrame, fraction: float,
                key_col: str = "url") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Same key ->
    same decision, forever; sample(p1) is a subset of sample(p2) for
    p1 <= p2 (threshold sampling on one hash)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return docs.filter(hash60_expr(key_col) < int(fraction * _HASH_SPACE))


def hash_split(docs: DataFrame, fractions: dict[str, float],
               key_col: str = "url") -> DataFrame:
    """docs + a ``split`` column assigning each row to exactly one named
    band of the hash space (e.g. {"train": 0.98, "val": 0.01, "test":
    0.01}); fractions must sum to <= 1, remainder -> NULL (excluded).
    Disjoint by construction — no doc is ever in two splits, and
    re-running with the same fractions reproduces the assignment."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-12:
        raise ValueError(f"fractions sum to {total} > 1")
    h = hash60_expr(key_col)
    expr = F.lit(None).cast("string")
    hi = 0
    bounds = []
    for name, frac in fractions.items():
        lo, hi = hi, hi + int(frac * _HASH_SPACE)
        bounds.append((name, lo, hi))
    for name, lo, hi in reversed(bounds):
        expr = F.when((h >= lo) & (h < hi), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)

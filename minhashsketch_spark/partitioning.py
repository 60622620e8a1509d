"""Input-parallelism guard for per-document compute stages.

A parquet file with one row group yields ONE scan partition no matter how
many cores the cluster has (file sources split by byte range, but a split
is non-empty only if a row-group midpoint falls inside it) — so a narrow
mapInArrow/mapInPandas stage over a small table silently runs single-core.
At 100 TB the scan arrives as ~10^5-10^6 partitions and this guard is a
no-op; on small/test inputs it buys full parallelism for the price of
shuffling a few hundred KB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism iff the plan's
    current partitioning is below it; identity otherwise (never shrinks —
    coalescing is AQE's job).

    Apply to SCAN-LEVEL projections only: probing ``.rdd`` is free on a
    shuffle-free plan, but on an AQE plan with joins it can execute the
    upstream query stages eagerly. Post-shuffle stages already carry >=
    ``spark.sql.shuffle.partitions`` partitions and never need this."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

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


# logical-plan nodes that imply the input already made an explicit
# partitioning/shuffle decision — the guard must not second-guess those,
# and probing .rdd through them under AQE EXECUTES the shuffle stages
# eagerly (measured: a 9 s shuffle for one getNumPartitions call)
_HAS_OWN_PARTITIONING = ("Repartition", "Join", "Aggregate", "Window",
                         "Sort", "InMemoryRelation", "Exchange")


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism iff the plan is
    a plain scan/projection whose partitioning is below it; identity
    otherwise (never shrinks — coalescing is AQE's job; never probes
    through shuffles — that executes them)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if any(k in plan for k in _HAS_OWN_PARTITIONING):
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

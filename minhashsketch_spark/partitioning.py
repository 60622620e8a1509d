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


# logical-plan node-name prefixes that imply the input already made an
# explicit partitioning/shuffle decision — the guard must not second-guess
# those, and probing .rdd through them under AQE EXECUTES the shuffle
# stages eagerly (measured: a 9 s shuffle for one getNumPartitions call).
# "Repartition" also covers RepartitionByExpression/RepartitionByNum.
_HAS_OWN_PARTITIONING = ("Repartition", "Join", "Aggregate", "Window",
                         "Sort", "InMemoryRelation", "Exchange")


def _plan_node_names(jplan) -> list[str]:
    """Node class names of a (logical) plan tree via py4j — matching on
    these instead of the rendered plan string, which false-positives on
    column aliases or string literals that happen to contain 'Sort' etc."""
    names: list[str] = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        names.append(node.nodeName())
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return names


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism iff the plan is
    a plain scan/projection whose partitioning is below it; identity
    otherwise (never shrinks — coalescing is AQE's job; never probes
    through shuffles — that executes them)."""
    names = _plan_node_names(df._jdf.queryExecution().optimizedPlan())
    if any(n.startswith(k) for n in names for k in _HAS_OWN_PARTITIONING):
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

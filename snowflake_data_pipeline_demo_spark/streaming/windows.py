"""Event-time windowed aggregation (tumbling + session windows).

The reference has no event-time logic — its tasks are processing-time
scheduled (SURVEY §2.9 T12) — but a pipeline ingesting events
continuously needs late-data-safe rollups, so the engine exposes
Structured Streaming's windowing as first-class operators.

Both functions work on streaming AND batch DataFrames: ``window``/
``session_window`` are ordinary grouping expressions, and
``withWatermark`` is a no-op in batch — so the same rollup definition
serves the live stream and its backfill (the batch gaps-and-islands
equivalent lives in operators/sessions.py).

Scale notes: a watermarked streaming session/tumbling agg keeps state
only for open windows newer than the watermark — state size is bounded
by (keys x open windows), not history. The groupBy shuffles on
(key, window), map-side partial-aggregated like any hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    window: str = "1 hour", watermark: str = "2 hours",
                    keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Tumbling event-time window counts, late data dropped beyond
    ``watermark``. Output: (window_start, window_end, *keys, n_events)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_counts(events: DataFrame, ts_col: str = "ts",
                   gap: str = "30 minutes", watermark: str = "2 hours",
                   user_col: str = "user_id") -> DataFrame:
    """Per-user session windows (a session closes ``gap`` after its
    last event). Output: (user_id, session_start, session_end,
    n_events)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join_stream(left: DataFrame, right: DataFrame,
                         keys: tuple[str, ...] = ("user_id",),
                         left_ts: str = "ts", right_ts: str = "r_ts",
                         window_seconds: int = 300,
                         watermark: str = "10 minutes") -> DataFrame:
    """Watermarked STREAM-STREAM interval join: each left event joins
    right events of the same keys within ``[left_ts, left_ts +
    window_seconds]``. Works on batch frames too (withWatermark is a
    batch no-op) — the batch twin is operators/joins.range_interval_join.

    Scale/state: Spark keeps both sides' state only within the
    watermark horizon — the time-bound condition lets the state store
    evict rows older than (watermark + window), so state is bounded by
    arrival rate x horizon, not history. The join itself shuffles both
    streams on the equi-keys.

    Output columns: all left columns as-is, ``right_ts``, and every
    other right column prefixed ``r_`` — so a self-join of the same
    event stream (shared event_id/value names) cannot silently produce
    duplicate column names. ``right_ts`` must differ from ``left_ts``
    (rename before calling), matching range_interval_join's contract.
    """
    from pyspark.sql import functions as F

    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must have distinct names — rename one "
            "side's timestamp before joining"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    conds = [F.col(k) == F.col(f"_r_{k}") for k in keys] + [
        F.col(right_ts) >= F.col(left_ts),
        F.col(right_ts)
        <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS"),
    ]
    r_renamed = rw.select(
        *[F.col(k).alias(f"_r_{k}") for k in keys],
        F.col(right_ts),
        *[F.col(c).alias(f"r_{c}")
          for c in rw.columns if c not in keys and c != right_ts],
    )
    out = lw.join(r_renamed, conds, "inner")
    return out.drop(*[f"_r_{k}" for k in keys])

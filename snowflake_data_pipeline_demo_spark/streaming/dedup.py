"""Streaming deduplication — the continuous-ingest twin of
operators/dedup.py's batch exact dedup.

``dropDuplicates`` on a stream keeps every key seen forever (state
grows with history — unusable for continuous 100 TB ingest);
``dropDuplicatesWithinWatermark`` bounds state to keys newer than the
watermark horizon, which is the right contract for ingest dedup: a
duplicate document lands within minutes/hours of its first copy
(retries, at-least-once upstreams), not months later. Full-history
dedup stays a batch job (the incremental anti-join in
operators/dedup.py / x_dedup_incremental).

State is hash-partitioned by key across the state store instances, so
it scales horizontally with the cluster like any keyed state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(events: DataFrame, key_cols: Sequence[str],
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Drop rows whose ``key_cols`` already appeared within the
    watermark horizon. First occurrence wins; exactly-once per key per
    horizon under crash-replay (state is checkpointed with the query)."""
    return events.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(list(key_cols))

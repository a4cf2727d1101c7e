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

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def dedup_stream(events: DataFrame, key_cols: Sequence[str],
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Drop rows whose ``key_cols`` already appeared within the
    watermark horizon. First occurrence wins; exactly-once per key per
    horizon under crash-replay (state is checkpointed with the query)."""
    return events.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(list(key_cols))


def semantic_dedup_batch_fn(
    clean_table, centroids: DataFrame, threshold: float = 0.85,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assignment_impl: str = "pandas",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` factory: continuous SEMANTIC ingest dedup —
    the streaming composition of operators/dedup.
    incremental_embedding_neardup. Each micro-batch probes the
    persisted clean-vector table (which doubles as the history index:
    assignment is recomputed per ingest but only over O(batch)+read —
    at scale persist the assigned table instead and skip re-assigning
    history, exactly as the MinHash incremental path persists its band
    index) and writes only non-duplicate vectors.

    Exactly-once under crash-replay by the same contract as the pipe's
    DML (streaming/pipeline.py): the write is batch-keyed
    (``overwrite_subdir(batch=<id>)``) and a replayed batch whose
    subdir already committed is skipped whole, so the table converges
    to the same bytes no matter where the previous run died.
    """
    from ..operators.dedup import incremental_embedding_neardup

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sub = f"batch={batch_id}"
        if clean_table.subdir_committed(sub):
            return
        history = clean_table.read()
        flagged = incremental_embedding_neardup(
            batch_df, history, centroids, threshold,
            id_col, vec_col, assignment_impl,
        )
        clean = batch_df.join(
            flagged.select(id_col), id_col, "left_anti"
        )
        clean_table.overwrite_subdir(clean, sub)

    return fn

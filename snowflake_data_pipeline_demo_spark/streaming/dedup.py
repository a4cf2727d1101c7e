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
    assignment_impl: str = "pandas", assigned_table=None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` factory: continuous SEMANTIC ingest dedup —
    the streaming composition of operators/dedup.
    incremental_embedding_neardup. Each micro-batch probes the
    persisted history and writes only non-duplicate vectors.

    With ``assigned_table=None`` the clean-vector table doubles as the
    history index and its assignment is recomputed per ingest — an
    O(history) projection per batch. Passing an ``assigned_table``
    ((id, vec, centroid_id) schema) switches to the persisted
    ASSIGNED index: the fn appends each batch's novel assignments and
    probes against the index directly, so a batch pays O(batch)
    assignment plus cluster-key equi-joins — the same cost-shape fix
    as the MinHash path's band index (``bands_table``).

    Exactly-once under crash-replay by the same contract as the pipe's
    DML (streaming/pipeline.py): writes are batch-keyed
    (``overwrite_subdir(batch=<id>)``), the gate checks the table
    written LAST (clean_table), and the flag decision is checkpointed
    before ANY overwrite — in both modes the decision plan scans the
    very table being written (the index, or clean_table itself as the
    history), so without the checkpoint a replay would delete its own
    scan inputs mid-plan. The replay also excludes the batch's own ids
    from history (anti-join) so a half-persisted subdir cannot flag
    the batch against itself.

    Enabling ``assigned_table`` over an ALREADY-POPULATED clean_table
    requires a one-time :func:`backfill_assigned_index`; the fn raises
    if the index is empty while history is not (an empty index would
    silently admit every duplicate of pre-index history).

    Sizing contract for flat per-day cost (measured, SCALE.md
    round-8): the probe's candidate set is batch-rows x per-cluster
    index occupancy, so with a FIXED centroid set the per-batch cost
    drifts up linearly as history grows (+27% over 2.8x history at
    nlist=64 in the day-N run — still 6.6x cheaper than same-day
    from-scratch). Size nlist with the corpus (k ~ n / target cluster
    size, the SemDeDup paper's own rule) and re-train +
    :func:`backfill_assigned_index` when history grows an order of
    magnitude: at constant cluster occupancy the probe term is
    O(batch) and the day-N curve is flat like the MinHash band
    index's.
    """
    from ..operators.dedup import incremental_embedding_neardup
    from ..operators.similarity import ivf_assign, ivf_assign_pandas

    assign_fn = (ivf_assign_pandas if assignment_impl == "pandas"
                 else ivf_assign)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sub = f"batch={batch_id}"
        if clean_table.subdir_committed(sub):
            return
        new_ids = batch_df.select(id_col)
        if assigned_table is not None:
            # guard is unambiguous because the index is written BEFORE
            # clean_table below (same ordering argument as the minhash
            # fn's band index): every crash point leaves index coverage
            # >= clean coverage, so clean-populated + index-empty can
            # only mean indexed mode was enabled over plain-mode
            # history.
            if clean_table._has_data() and not assigned_table._has_data():
                raise ValueError(
                    "assigned_table is empty but clean_table has history: "
                    "the index would miss every pre-index duplicate. Run "
                    "backfill_assigned_index(clean_table, assigned_table, "
                    "centroids) once before enabling indexed mode."
                )
            hist_assigned = assigned_table.read().join(
                new_ids, id_col, "left_anti"
            )
            # assign the batch ONCE; checkpoint so the probe, the dup
            # decision, and the novel-index write all reuse it
            probe = assign_fn(
                batch_df, centroids, id_col, vec_col, with_score=False
            ).localCheckpoint()
            flagged = incremental_embedding_neardup(
                batch_df, None, centroids, threshold,
                id_col, vec_col, assignment_impl,
                history_assigned=hist_assigned, new_assigned=probe,
            )
            dup_ids = flagged.select(id_col).localCheckpoint()
            clean = batch_df.join(dup_ids, id_col, "left_anti")
            novel_assigned = probe.join(dup_ids, id_col, "left_anti")
            assigned_table.overwrite_subdir(novel_assigned, sub)
            clean_table.overwrite_subdir(clean, sub)
            return
        history = clean_table.read().join(new_ids, id_col, "left_anti")
        flagged = incremental_embedding_neardup(
            batch_df, history, centroids, threshold,
            id_col, vec_col, assignment_impl,
        )
        # the decision plan scans clean_table (it IS the history), and
        # the write below overwrites a subdir that scan lists on replay
        # — checkpoint the id list before writing, like the minhash fn
        dup_ids = flagged.select(id_col).localCheckpoint()
        clean = batch_df.join(dup_ids, id_col, "left_anti")
        clean_table.overwrite_subdir(clean, sub)

    return fn


def backfill_assigned_index(clean_table, assigned_table, centroids: DataFrame,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            assignment_impl: str = "pandas") -> None:
    """One-time migration: populate an empty ``assigned_table`` from an
    existing clean-vector history so :func:`semantic_dedup_batch_fn`
    can switch to indexed mode without losing dup detection against
    pre-index content. ``centroids`` MUST be the same frame the batch
    fn is built with — different centroids assign history to different
    clusters than the probes expect, silently missing candidates (the
    fn's guard only checks the index is non-empty). Idempotent
    (batch-keyed overwrite) — rerun until it completes if it
    crashes."""
    from ..operators.similarity import ivf_assign, ivf_assign_pandas

    assign_fn = (ivf_assign_pandas if assignment_impl == "pandas"
                 else ivf_assign)
    assigned_table.overwrite_subdir(
        assign_fn(clean_table.read(), centroids, id_col, vec_col),
        "batch=backfill",
    )


def minhash_dedup_batch_fn(
    clean_table, sigs_table, bands_table=None,
    text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.5,
    hash_family: str = "xxhash64",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` factory: continuous NEAR-dup ingest dedup over
    a PERSISTED MinHash signature index — the streaming composition of
    operators/dedup.incremental_neardup. Each micro-batch signs its
    documents (O(batch) shingling — history text is never re-read),
    probes the persisted signature table for banded-key collisions,
    drops docs whose estimated Jaccard vs any prior doc reaches
    ``threshold``, and appends the NOVEL docs' signatures back to the
    index — so the index grows only with unique content.

    Scale notes: with ``bands_table=None`` the probe re-bands the
    history signature table per batch (a narrow projection over
    (id, 16 longs) rows — cheap but O(history) per batch). Passing a
    ``bands_table`` switches to the persisted LSH INDEX: the fn
    appends each batch's novel banded keys to it and probes via
    ``incremental_neardup_indexed`` — O(batch) banding plus one
    equi-join against the index, the shape a minutes-cadence 100 TB
    ingest needs. At that scale, persist the index BUCKETED on
    (band, key): the probe join then leaves the index side
    exchange-free and shuffles only the O(batch) probe side —
    demonstrated and plan-pinned by tests/test_plan_shapes.py::
    test_bucketed_band_index_probe_shuffles_batch_side_only.

    Exactly-once under crash-replay: both writes are batch-keyed
    subdir overwrites; the GATE checks the table written LAST
    (clean_table), so a crash between the index write and the data
    write replays into identical bytes — the replay excludes the
    batch's own ids from history (anti-join) so a half-persisted index
    subdir cannot flag the batch against itself.
    """
    from ..operators.dedup import (
        banded_keys,
        incremental_neardup,
        incremental_neardup_indexed,
        minhash_signatures,
    )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sub = f"batch={batch_id}"
        if clean_table.subdir_committed(sub):
            return
        if (bands_table is not None and sigs_table._has_data()
                and not bands_table._has_data()):
            # distinguishable from a crash-replay state ONLY because
            # the band index is written BEFORE the signature table
            # below: any crash point leaves bands >= sigs coverage, so
            # sigs-populated + bands-empty can only mean the index was
            # enabled over pre-existing plain-mode history.
            raise ValueError(
                "bands_table is empty but sigs_table has history: the "
                "index would miss every pre-index duplicate. Run "
                f"backfill_band_index(sigs_table, bands_table, "
                f"bands={bands}) once before enabling indexed mode "
                "(the bands value MUST match this fn's)."
            )
        # sign ONCE: without the checkpoint the signature plan (explode
        # shingles x num_hashes min-agg) re-executes for every consumer
        # (probe, novel-sig write, dup decision) — measured 3x signing
        # per batch. localCheckpoint is batch-scale (id + 16 longs).
        new_sigs = minhash_signatures(
            batch_df, text_col, id_col,
            num_hashes=num_hashes, hash_family=hash_family,
        ).localCheckpoint()
        # exclude the batch's own ids from history straight off the
        # batch frame (a superset of the signed ids — docs too short to
        # shingle never reach the index), so the guard doesn't depend
        # on the signature plan. Applied to BOTH persisted artifacts so
        # a crash-replay cannot flag the batch against its own
        # half-persisted writes.
        new_ids = batch_df.select(id_col)
        history = sigs_table.read().join(new_ids, id_col, "left_anti")
        if bands_table is not None:
            hist_bands = bands_table.read().join(
                new_ids, id_col, "left_anti"
            )
            flagged = incremental_neardup_indexed(
                new_sigs, history, hist_bands, bands=bands,
                id_col=id_col, threshold=threshold,
            )
        else:
            flagged = incremental_neardup(
                new_sigs, history, bands=bands, id_col=id_col,
                threshold=threshold,
            )
        # materialize the DECISION before the index overwrites: dup_ids'
        # plan scans sigs_table (and the band index), and a crash-replay
        # overwrites the very subdirs those scans list — without the
        # checkpoint the write would delete its own input files mid-plan
        # (FAILED_READ_FILE). The checkpoint is an id list (8 bytes per
        # dup); the clean and novel-sig outputs then derive from
        # checkpointed frames only and write directly — no batch-text
        # materialization at all.
        dup_ids = flagged.select(id_col).localCheckpoint()
        clean = batch_df.join(dup_ids, id_col, "left_anti")
        novel_sigs = new_sigs.join(dup_ids, id_col, "left_anti")
        # write ORDER matters twice over: the gate checks the table
        # written LAST (clean), and the migration guard above relies on
        # bands being written FIRST — a crash at any point then leaves
        # band coverage >= sig coverage, so a replayed first indexed
        # batch can never be mistaken for an unbackfilled migration
        # (sigs-before-bands order would wedge that replay on the
        # guard forever).
        if bands_table is not None:
            bands_table.overwrite_subdir(
                banded_keys(novel_sigs, bands, id_col), sub
            )
        sigs_table.overwrite_subdir(novel_sigs, sub)
        clean_table.overwrite_subdir(clean, sub)

    return fn


def backfill_band_index(sigs_table, bands_table, bands: int = 4,
                        id_col: str = "doc_id") -> None:
    """One-time migration: populate an empty ``bands_table`` from an
    existing signature history so :func:`minhash_dedup_batch_fn` can
    switch to indexed mode without losing dup detection against
    pre-index content. ``bands`` MUST equal the value the batch fn is
    built with — a mismatch produces band keys that never collide with
    the probes' keys, silently zeroing detection against backfilled
    history (the guard in the fn cannot see this; it only checks the
    index is non-empty). Idempotent (batch-keyed overwrite) — rerun
    until it completes if it crashes."""
    from ..operators.dedup import banded_keys

    bands_table.overwrite_subdir(
        banded_keys(sigs_table.read(), bands, id_col), "batch=backfill"
    )

"""SemanticIndexAutoscaler: the nlist-sizing contract as code.

The r08 day-N run measured the fixed-nlist drift (+27% per-batch cost
over 2.8x history growth — SCALE.md round-8) and recorded the remedy as
prose; these tests pin the remedy's implementation: nlist sizes with
the corpus (k ~ n / target occupancy), retrains fire on the geometric
schedule, duplicates of pre-retrain history are still dropped after the
epoch flips, orphan (uncommitted) epochs are invisible to readers, and
the plain-mode migration backfills before the first indexed batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from snowflake_data_pipeline_demo_spark.sources.catalog import Table
from snowflake_data_pipeline_demo_spark.streaming.dedup import (
    SemanticIndexAutoscaler, backfill_assigned_index,
    semantic_dedup_batch_fn, sized_nlist,
)

DIM = 8
VEC_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])


def axis_vec(axis: int) -> list[float]:
    return [1.0 if j == axis else 0.0 for j in range(DIM)]


def frame(spark, rows):
    """rows: (vec_id, axis) — an exact one-hot vector per row, so a
    duplicate (same axis, new id) scores cosine exactly 1.0 and always
    lands in its original's IVF cluster regardless of centroid
    quality (identical vectors assign identically)."""
    return spark.createDataFrame(
        [(i, axis_vec(a)) for i, a in rows], VEC_SCHEMA
    )


def test_sized_nlist_contract():
    assert sized_nlist(0) == 8                      # empty -> floor
    assert sized_nlist(1, target_occupancy=256) == 8
    assert sized_nlist(2560, target_occupancy=256) == 10
    assert sized_nlist(2561, target_occupancy=256) == 11   # ceil rule
    assert sized_nlist(10**12, target_occupancy=256,
                       max_nlist=1 << 16) == 1 << 16       # ceiling
    assert sized_nlist(100, target_occupancy=256,
                       min_nlist=4) == 4                   # floor


def test_autoscaler_bootstrap_retrain_and_cross_epoch_dedup(spark, tmp_path):
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    sc = SemanticIndexAutoscaler(
        clean, str(tmp_path / "idx"), threshold=0.95,
        target_occupancy=2, retrain_factor=1.5, min_nlist=2,
    )
    fn = sc.batch_fn()

    # batch 0 bootstraps: n=4 -> nlist = ceil(4/2) = 2
    fn(frame(spark, [(0, 0), (1, 1), (2, 2), (3, 3)]), 0)
    assert sc.last_action["action"] == "bootstrap"
    assert sc.last_action["nlist"] == 2
    assert sc.latest_epoch() == 0
    assert clean.count() == 4

    # batch 1: two exact dups of batch 0 (axes 0, 1) dropped, two new
    # axes kept; sizing check ran against n=4 -> desired 2 < 1.5*2
    fn(frame(spark, [(10, 0), (11, 1), (12, 4), (13, 5)]), 1)
    assert sc.last_action["action"] == "none"
    kept = {r["vec_id"] for r in clean.read().collect()}
    assert kept == {0, 1, 2, 3, 12, 13}

    # batch 2: n=6 -> desired 3 >= 1.5*2 fires the retrain BEFORE the
    # batch; the epoch flips and dups of EPOCH-0 content (axes 2, 3)
    # must still drop against the re-backfilled index
    fn(frame(spark, [(20, 2), (21, 3), (22, 6), (23, 7)]), 2)
    assert sc.last_action["action"] == "retrain"
    assert sc.last_action["epoch"] == 1
    assert sc.last_action["nlist"] == 3
    kept = {r["vec_id"] for r in clean.read().collect()}
    assert kept == {0, 1, 2, 3, 12, 13, 22, 23}
    # the new epoch's index covers exactly the clean history
    assert sc.assigned_table(1).count() == len(kept)

    # crash-replay of a committed batch: converged, no change, no
    # spurious epoch (n=8 -> desired 4 < 1.5*3)
    fn(frame(spark, [(20, 2), (21, 3), (22, 6), (23, 7)]), 2)
    assert sc.last_action["action"] == "none"
    assert clean.count() == 8
    assert sc.latest_epoch() == 1


def test_autoscaler_orphan_epoch_is_invisible_until_commit(spark, tmp_path):
    """A crash between the new epoch's index backfill and its centroid
    commit leaves an orphan assigned dir; readers stay on the previous
    epoch, and the replayed retrain overwrites the orphan."""
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    sc = SemanticIndexAutoscaler(
        clean, str(tmp_path / "idx"), threshold=0.95,
        target_occupancy=2, retrain_factor=1.5, min_nlist=2,
    )
    fn = sc.batch_fn()
    fn(frame(spark, [(0, 0), (1, 1), (2, 2), (3, 3)]), 0)

    # simulate the crash: epoch 1's backfill ran, centroids never
    # committed (exactly the mid-retrain crash point)
    backfill_assigned_index(clean, sc.assigned_table(1), sc.centroids(0))
    assert sc.latest_epoch() == 0  # orphan invisible

    # next batch: sizing can't fire yet (n=4 -> desired 2 < 3), so the
    # batch runs against epoch 0 untouched by the orphan
    fn(frame(spark, [(10, 0), (11, 4), (12, 5)]), 1)
    assert sc.last_action == {"action": "none", "epoch": 0,
                              "nlist": 2, "n": 4}
    assert {r["vec_id"] for r in clean.read().collect()} == {
        0, 1, 2, 3, 11, 12}

    # now the retrain fires (n=6 -> desired 3 >= 3) and must converge
    # over the orphan: epoch 1 commits with a complete index
    fn(frame(spark, [(20, 2), (21, 6)]), 2)
    assert sc.last_action["action"] == "retrain"
    assert sc.latest_epoch() == 1
    assert sc.assigned_table(1).count() == clean.count()
    assert {r["vec_id"] for r in clean.read().collect()} == {
        0, 1, 2, 3, 11, 12, 21}


def test_autoscaler_migrates_plain_mode_history(spark, tmp_path):
    """Bootstrapping over a clean table populated by PLAIN (non-indexed)
    mode trains on that history and backfills its assignment, so
    pre-index duplicates stay detectable from the first indexed batch."""
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    cent = spark.createDataFrame(
        [(0, axis_vec(0)), (1, axis_vec(4))],
        "centroid_id long, embedding array<double>",
    )
    plain = semantic_dedup_batch_fn(clean, cent, threshold=0.95)
    plain(frame(spark, [(0, 0), (1, 1), (2, 2)]), 0)
    assert clean.count() == 3

    sc = SemanticIndexAutoscaler(
        clean, str(tmp_path / "idx"), threshold=0.95,
        target_occupancy=2, retrain_factor=1.5, min_nlist=2,
    )
    fn = sc.batch_fn()
    # first indexed batch: bootstrap trains on the 3-row history PLUS
    # the triggering batch (n=5 — the union keeps a geometry-free
    # history from wedging the stream, r09 review pass 2), backfills
    # the history, THEN probes the batch — the dup of plain-mode
    # vec 0 drops, the new axis keeps
    fn(frame(spark, [(10, 0), (11, 5)]), 1)
    assert sc.last_action["action"] == "bootstrap"
    assert sc.last_action["n"] == 5
    assert sc.assigned_table(0).count() >= 3
    assert {r["vec_id"] for r in clean.read().collect()} == {0, 1, 2, 11}


def test_autoscaler_desired_trigger_terminates_on_degenerate_corpus(
        spark, tmp_path):
    """r09 review: kmeans can ship far fewer centroids than the sized
    nlist when most history vectors are unusable (NULL/empty/ragged —
    here 6 of 8 rows are empty). A trigger comparing against the
    SHIPPED count would then see desired >= factor x shipped forever
    and re-fire a full O(history) retrain on EVERY batch; the trigger
    must baseline on the nlist the epoch was SIZED for instead."""
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    rows = [(0, axis_vec(0)), (1, axis_vec(1))] + [
        (i, []) for i in range(2, 8)
    ]
    clean.overwrite_subdir(
        spark.createDataFrame(rows, VEC_SCHEMA), "batch=0"
    )
    sc = SemanticIndexAutoscaler(
        clean, str(tmp_path / "idx"), threshold=0.95,
        target_occupancy=1, retrain_factor=1.5, min_nlist=2,
    )
    a = sc.maybe_retrain()
    assert a["action"] == "bootstrap"
    assert a["desired"] == 8 and a["nlist"] == 2  # shipped << desired
    # desired (8) >= 1.5 x shipped (2) already — the old trigger would
    # retrain here and on every call after; the desired baseline holds
    a = sc.maybe_retrain()
    assert a["action"] == "none" and sc.latest_epoch() == 0
    # 1.5x history growth fires exactly one retrain, then quiesces
    clean.overwrite_subdir(
        frame(spark, [(10, 2), (11, 3), (12, 4), (13, 5)]), "batch=1"
    )
    a = sc.maybe_retrain()
    assert a["action"] == "retrain" and a["epoch"] == 1
    assert a["desired"] == 12
    a = sc.maybe_retrain()
    assert a["action"] == "none" and sc.latest_epoch() == 1


def test_autoscaler_refuses_geometry_free_corpus(spark, tmp_path):
    """r09 review: a corpus whose every vector is empty trains zero
    centroids; committing that epoch would make the index assign
    nothing and silently admit every duplicate. The training must fail
    loudly instead (and commit nothing — no orphan epoch)."""
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    clean.overwrite_subdir(
        spark.createDataFrame([(i, []) for i in range(4)], VEC_SCHEMA),
        "batch=0",
    )
    sc = SemanticIndexAutoscaler(clean, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="0 centroids"):
        sc.maybe_retrain()
    assert sc.latest_epoch() is None  # nothing committed


def test_autoscaler_batch_vectors_rescue_geometry_free_history(
        spark, tmp_path):
    """r09 review pass 2: if the refusal above were the whole story, a
    plain-mode history of all-empty vectors would wedge ingest FOREVER
    (every replay of the first indexed batch re-trains on the same
    geometry-free history and re-raises). The bootstrap trains on
    history UNION the triggering batch, so the batch's usable vectors
    rescue it — and the empty-history rows still backfill (assigned to
    the lowest centroid, per the ivf degenerate-input contract)."""
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    clean.overwrite_subdir(
        spark.createDataFrame([(i, []) for i in range(3)], VEC_SCHEMA),
        "batch=0",
    )
    sc = SemanticIndexAutoscaler(
        clean, str(tmp_path / "idx"), threshold=0.95,
        target_occupancy=2, min_nlist=2,
    )
    fn = sc.batch_fn()
    fn(frame(spark, [(10, 0), (11, 1)]), 1)
    a = sc.last_action
    assert a["action"] == "bootstrap" and a["n"] == 5 and a["nlist"] >= 1
    assert sc.latest_epoch() == 0
    assert sc.assigned_table(0).count() >= 3  # history backfilled
    kept = {r["vec_id"] for r in clean.read().collect()}
    assert kept == {0, 1, 2, 10, 11}
    # and the indexed batch actually dedups against itself next round
    fn(frame(spark, [(20, 0), (21, 2)]), 2)
    kept = {r["vec_id"] for r in clean.read().collect()}
    assert kept == {0, 1, 2, 10, 11, 21}


def test_autoscaler_defers_bootstrap_on_geometry_free_first_batch(
        spark, tmp_path):
    """r09 review pass 3: raising on a geometry-free FIRST batch would
    wedge the stream (restart replays the same batch by offset
    forever). The bootstrap DEFERS instead: the batch passes through
    the exactly-once gate (nothing to dedup against), no epoch
    commits, and the next batch with usable vectors bootstraps over
    the deferred rows via the history-union rescue."""
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    sc = SemanticIndexAutoscaler(
        clean, str(tmp_path / "idx"), threshold=0.95,
        target_occupancy=2, min_nlist=2,
    )
    fn = sc.batch_fn()
    empty_batch = spark.createDataFrame(
        [(i, []) for i in range(3)], VEC_SCHEMA
    )
    fn(empty_batch, 0)
    assert sc.last_action == {"action": "deferred", "epoch": None,
                              "nlist": 0, "n": 3}
    assert sc.latest_epoch() is None
    assert clean.count() == 3  # passed through, exactly once
    fn(empty_batch, 0)  # crash-replay of the deferred batch
    assert clean.count() == 3
    # usable vectors arrive: bootstrap fires over history+batch
    fn(frame(spark, [(10, 0), (11, 1)]), 1)
    assert sc.last_action["action"] == "bootstrap"
    assert sc.latest_epoch() == 0
    kept = {r["vec_id"] for r in clean.read().collect()}
    assert kept == {0, 1, 2, 10, 11}
    # and dedup now works, including across the deferred rows' ids
    fn(frame(spark, [(20, 0), (21, 2)]), 2)
    kept = {r["vec_id"] for r in clean.read().collect()}
    assert kept == {0, 1, 2, 10, 11, 21}


def test_null_vector_history_zero_row_backfill_not_wedged(spark, tmp_path):
    """r09 ADVICE: a backfill over all-NULL-vector history (NULL, not
    empty-array — ivf_assign DROPS NULLs, while empty arrays assign to
    the lowest centroid) commits a ZERO-row assigned subdir. The inner
    fn's coverage guard used to pass only because the pinned Spark
    writes empty part files that _has_data() counts; a committer that
    skips empty files would raise 'assigned_table is empty' on every
    replay and wedge the stream. The guard now accepts the backfill's
    _SUCCESS marker as coverage — pinned here by stripping the data
    files and leaving only the marker."""
    import glob
    import os

    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    clean.overwrite_subdir(
        spark.createDataFrame([(i, None) for i in range(3)], VEC_SCHEMA),
        "batch=0",
    )
    cent = spark.createDataFrame(
        [(0, axis_vec(0)), (1, axis_vec(1))],
        "centroid_id long, embedding array<double>",
    )
    assigned_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("centroid_id", T.LongType()),
    ])
    assigned = Table(spark, str(tmp_path / "assigned"), assigned_schema)
    backfill_assigned_index(clean, assigned, cent)
    assert assigned.subdir_committed("batch=backfill")
    assert assigned.count() == 0  # NULL vectors dropped: zero rows
    # simulate the empty-file-skipping committer: data files gone,
    # _SUCCESS marker stays
    for f in glob.glob(str(tmp_path / "assigned/batch=backfill/*")):
        if not os.path.basename(f).startswith(("_", ".")):
            os.remove(f)
    assert not assigned._has_data()
    fn = semantic_dedup_batch_fn(clean, cent, threshold=0.95,
                                 assigned_table=assigned)
    fn(frame(spark, [(10, 0), (11, 1)]), 1)  # must not raise
    assert {r["vec_id"] for r in clean.read().collect()} == {
        0, 1, 2, 10, 11}
    # replay converges too (the wedge was a replay-forever failure)
    fn(frame(spark, [(10, 0), (11, 1)]), 1)
    assert clean.count() == 5
    # and the guard still fires when there is NO backfill marker at
    # all (true plain-history / empty-index misconfiguration)
    bare = Table(spark, str(tmp_path / "bare"), assigned_schema)
    fn2 = semantic_dedup_batch_fn(clean, cent, threshold=0.95,
                                  assigned_table=bare)
    with pytest.raises(ValueError, match="assigned_table is empty"):
        fn2(frame(spark, [(30, 2)]), 9)


def test_autoscaler_unbootstrapped_without_corpus_raises(spark, tmp_path):
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    sc = SemanticIndexAutoscaler(clean, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="unbootstrapped"):
        sc.maybe_retrain()


def test_autoscaler_rejects_degenerate_retrain_factor(spark, tmp_path):
    clean = Table(spark, str(tmp_path / "clean"), VEC_SCHEMA)
    with pytest.raises(ValueError, match="retrain_factor"):
        SemanticIndexAutoscaler(clean, str(tmp_path / "idx"),
                                retrain_factor=1.0)

#!/usr/bin/env python
"""Adversarial day-N run for the autoscaled semantic dedup path
(round-10; r09 verdict ask #6). The r09 run exercised ONE epoch flip
under steady 10k/day growth; this run makes the corpus grow 10x across
six days (10k -> 100k delivered), which the geometric sizing contract
must answer with TWO retrains, and then re-runs the same schedule with
the SECOND retrain killed between its meta write and its centroid
commit (the deepest crash point — backfill and meta are on disk, the
epoch is not) and replayed.

Claims under test:
- the retrain trigger fires exactly twice on this growth curve
  (epochs 0 -> 1 -> 2), computed from committed state only;
- post-retrain per-day ingest cost stays proportional to BATCH size
  (occupancy re-pinned to target by each retrain), not to history;
- every planted re-delivery drops every day, including the days whose
  probes straddle an epoch flip;
- a mid-retrain kill leaves an orphan epoch invisible to readers, and
  the replayed day converges to the SAME epoch schedule, kept counts,
  and shipped centroid count as the uninterrupted arm (deterministic
  k-means over identical committed state).

Day sizes (thousands): 10, 15, 20, 25, 25, 5 — cumulative 100k = 10x
day 0. With target_occupancy=128 / retrain_factor=2.0 the schedule is
forced: bootstrap desired=79 (n=10k); day-2 sizing sees n=22k ->
desired 172 >= 2*79 (flip to epoch 1); day-4 sizing sees n=58k ->
desired 454 >= 2*172 (flip to epoch 2); days 1/3/5 are "none".
1-in-5 of every post-day-0 vector re-delivers day-0 CONTENT verbatim
under a fresh id (bit-identical floats -> cosine exactly 1.0), so
kept-per-day is an exact oracle: size - size/5.

Results recorded in SCALE.md round-10. Run:
    python scripts/dayn_semantic_adversarial_run.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dayn_semantic_scale_run import (  # noqa: E402
    VEC_SCHEMA, gen_vec,
)
from snowflake_data_pipeline_demo_spark.caching import (  # noqa: E402
    release_lane_caches, release_stray_persistent_rdds,
)
from snowflake_data_pipeline_demo_spark.session import get_spark  # noqa: E402
from snowflake_data_pipeline_demo_spark.sources.catalog import Table  # noqa: E402
from snowflake_data_pipeline_demo_spark.streaming.dedup import (  # noqa: E402
    SemanticIndexAutoscaler,
)

DAY_SIZES = [10_000, 15_000, 20_000, 25_000, 25_000, 5_000]
DAY0 = DAY_SIZES[0]
REDELIVER_FRAC = 5
EXPECT_ACTIONS = ["bootstrap", "none", "retrain", "none", "retrain", "none"]
EXPECT_EPOCHS = [0, 0, 1, 1, 2, 2]


def day_batch(spark, day: int):
    lo = sum(DAY_SIZES[:day])
    hi = lo + DAY_SIZES[day]
    base = spark.range(lo, hi).select(F.col("id").alias("vec_id"))
    src = F.col("vec_id")
    if day > 0:
        src = F.when(
            F.col("vec_id") % REDELIVER_FRAC == 0,
            F.col("vec_id") % DAY0,  # a day-0 gid
        ).otherwise(F.col("vec_id"))
    return base.select("vec_id", gen_vec(src).alias("embedding"))


def expected_kept(day: int) -> int:
    if day == 0:
        return DAY_SIZES[0]
    return DAY_SIZES[day] - DAY_SIZES[day] // REDELIVER_FRAC


def run_arm(spark, batches, kill_day: int | None = None) -> list[dict]:
    """Run the six-day schedule through a fresh autoscaler; when
    ``kill_day`` is set, that day's retrain is killed right before its
    centroid commit (backfill + meta already written — the orphan
    state) and then replayed."""
    root = tempfile.mkdtemp(prefix="dayn_sem_adv_")
    clean = Table(spark, f"{root}/clean", VEC_SCHEMA)
    scaler = SemanticIndexAutoscaler(
        clean, f"{root}/idx", threshold=0.85,
        target_occupancy=128, retrain_factor=2.0,
    )
    rows = []
    for day, batch in enumerate(batches):
        killed = False
        if day == kill_day:
            orig = scaler._cent.overwrite_subdir

            def _kill(df, sub):
                raise RuntimeError("injected kill before centroid commit")

            scaler._cent.overwrite_subdir = _kill
            try:
                scaler.maybe_retrain(bootstrap_df=batch)
                raise AssertionError(
                    "kill day must attempt a centroid commit — the "
                    "schedule math is wrong if no retrain fired here"
                )
            except RuntimeError as ex:
                assert "injected kill" in str(ex)
                killed = True
            finally:
                scaler._cent.overwrite_subdir = orig
            # orphan epoch must be invisible to readers
            assert scaler.latest_epoch() == EXPECT_EPOCHS[day] - 1
            release_lane_caches()
        t0 = time.time()
        info = scaler.maybe_retrain(bootstrap_df=batch)
        t_size = round(time.time() - t0, 2)
        t0 = time.time()
        scaler.inner_fn(info["epoch"])(batch, day)
        secs = round(time.time() - t0, 2)
        release_lane_caches()
        kept = spark.read.parquet(f"{root}/clean/batch={day}").count()
        rows.append({
            "day": day, "size": DAY_SIZES[day], "sec": secs,
            "sec_per_10k": round(secs * 10_000 / DAY_SIZES[day], 2),
            "sizing_sec": t_size, "action": info["action"],
            "epoch": info["epoch"], "nlist": info["nlist"],
            "kept": kept, "killed_then_replayed": killed,
        })
        print(json.dumps(rows[-1]), flush=True)
        assert info["action"] == EXPECT_ACTIONS[day], rows[-1]
        assert info["epoch"] == EXPECT_EPOCHS[day], rows[-1]
        assert kept == expected_kept(day), (kept, expected_kept(day))
    release_stray_persistent_rdds(spark)
    shutil.rmtree(root, ignore_errors=True)
    return rows


def main() -> None:
    spark = get_spark("dayn_semantic_adversarial")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    stage = tempfile.mkdtemp(prefix="dayn_sem_adv_stage_")
    batches = []
    for day in range(len(DAY_SIZES)):
        day_batch(spark, day).repartition(32).write.mode(
            "overwrite").parquet(f"{stage}/day={day}")
        batches.append(spark.read.parquet(f"{stage}/day={day}"))

    print("== uninterrupted arm ==", flush=True)
    ref = run_arm(spark, batches)
    print("== killed-and-replayed arm (kill on day 4's retrain) ==",
          flush=True)
    killed = run_arm(spark, batches, kill_day=4)

    # same epoch schedule, same kept counts, same shipped centroid
    # counts — the replay converged to the reference run's state
    for a, b in zip(ref, killed):
        assert (a["action"], a["epoch"], a["kept"], a["nlist"]) == \
               (b["action"], b["epoch"], b["kept"], b["nlist"]), (a, b)

    print("== summary ==")
    print(json.dumps({"reference": ref, "killed": killed}, indent=1))
    shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()

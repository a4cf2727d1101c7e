#!/usr/bin/env python
"""Measure WHERE the naive per-group top-k window actually spills
(r10 verdict ask #4) — and WHY it usually can't.

``group_quota_topk``'s ``salt_threshold_rows = 32_000_000`` was
extrapolated from a measured ~7M rows/s single-core sorter rate
(wall-clock argument) and claimed a memory contract ("the naive
window must fit the hot group in one task's sorter") that was never
measured at its bind point. Measuring it found the contract DOES NOT
BIND on this engine version: Spark >= 3.5's InferWindowGroupLimit
rewrites the ``row_number().over(partitionBy(g).orderBy(o)) <= k``
pattern into WindowGroupLimit(Partial) BEFORE the shuffle and
WindowGroupLimit(Final) after — each map partition forwards at most
k rows per group, so the hot reducer receives <= k * num_map_partitions
rows no matter how large the hot group is. The "naive" window has
been the two-phase form all along, which also explains the r09
skew-run result that the salted arm never won locally.

Two arms per size, on a 95%-hot skewed key (a FOLDABLE literal key
doesn't measure this at all — Catalyst drops the constant partition
key and plans a global TakeOrderedAndProject):

- rewrite ON (engine default): the production shape; expected flat
  wall and zero spill at any n.
- rewrite OFF (spark.sql.optimizer.windowGroupLimitThreshold=-1):
  the pre-3.5 single-task-sort shape the salted arm was designed
  for; grown until the sorter SPILLS to find the true memory
  crossover on this host (16g heap, one active reducer task owning
  the whole execution pool — the most generous bound; a cluster
  executor sharing its pool across task slots binds earlier).

Spill bytes read from the status REST API (UI enabled only here).
Run:  python scripts/window_spill_run.py
Results: SCALE.md round-11 + sampling.py's auto-dispatch docstring.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_data_pipeline_demo_spark.operators.sampling import (  # noqa: E402
    group_quota_topk,
)
from snowflake_data_pipeline_demo_spark.session import get_spark  # noqa: E402

UI_PORT = 4058
TOPK = 10
REWRITE_CONF = "spark.sql.optimizer.windowGroupLimitThreshold"


def rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def total_spill(app_id: str) -> int:
    """diskBytesSpilled summed over all completed stages."""
    return sum(
        st.get("diskBytesSpilled", 0)
        for st in rest(f"applications/{app_id}/stages?status=COMPLETE")
    )


def fact(spark, n: int):
    """95% of rows on key 0 — one reducer owns the hot group when the
    rewrite is off; same shape as scripts/skew_scale_run.py."""
    return spark.range(n).select(
        F.col("id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 95, F.lit(0))
         .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)))
         .alias("key"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).alias("val"),
    )


def run_arm(spark, app_id: str, n: int, rewrite: bool) -> dict:
    spark.conf.set(REWRITE_CONF, "1000" if rewrite else "-1")
    s0 = total_spill(app_id)
    t0 = time.time()
    row = (
        group_quota_topk(fact(spark, n), "key", "val", TOPK, "id",
                         mode="naive")
        .filter(F.col("key") == 0)
        .agg(F.count("*").alias("cnt"), F.sum("val").alias("chk"))
        .collect()[0]
    )
    wall = round(time.time() - t0, 1)
    spill_mb = round((total_spill(app_id) - s0) / 2**20)
    assert row["cnt"] == TOPK
    return {"hot_rows_total": n, "rewrite": rewrite, "wall_sec": wall,
            "spill_disk_mb": spill_mb, "hot_topk_chk": int(row["chk"])}


def main() -> None:
    spark = get_spark("window_spill", **{
        "spark.ui.enabled": "true",
        "spark.ui.port": str(UI_PORT),
    })
    app_id = spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    heap = spark.conf.get("spark.driver.memory")
    print(f"== per-group top-k window spill crossover (heap {heap}, "
          f"95%-hot key, row = 3 longs) ==", flush=True)
    results = []
    n = 32_000_000
    while n <= 1_024_000_000:
        on = run_arm(spark, app_id, n, rewrite=True)
        off = run_arm(spark, app_id, n, rewrite=False)
        # both arms agree on the hot group's top-k checksum
        assert on["hot_topk_chk"] == off["hot_topk_chk"], (on, off)
        results += [on, off]
        print(json.dumps(on), flush=True)
        print(json.dumps(off), flush=True)
        if off["spill_disk_mb"] > 0:
            print(f"== rewrite-OFF sorter SPILLED at ~{int(n*0.95):,} "
                  f"hot rows; rewrite-ON arm at the same size: "
                  f"{on['spill_disk_mb']} MB spill, {on['wall_sec']} s "
                  f"==", flush=True)
            break
        n *= 2
    spark.conf.set(REWRITE_CONF, "1000")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

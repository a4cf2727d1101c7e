#!/usr/bin/env python
"""Planted-skew measurement of the skew toolkit (round-9 scale run).

operators/skew.py and the salted two-phase window in
sampling.group_quota_topk are oracle-gated for CORRECTNESS
(x_skew_salted_agg, x_cluster_quota) but none of the skew claims had a
measurement: SCALE.md asserts "AQE's runtime skew splitting is the
first line of defense", "salting is for the cases AQE can't fix", and
"the textbook window puts every row of a group on ONE reducer". This
run plants a hot key and measures all three over (corpus size,
hot share) points, because the interesting quantity is the CROSSOVER:
the skew tax is the single-task time on the hot group (it scales with
hot-group SIZE and is invisible while the other cores have their own
work), while the mitigation tax (an extra shuffle / dim replication)
scales with TOTAL rows. At 50% hot the residual 50% keeps all 32 cores
busy for about as long as the hot task runs — mitigation buys little;
at 95% hot one task owns the job while 31 cores idle, which is the
actual 100 TB pathology (a boilerplate-heavy domain on one reducer of
a 1000-executor job).

Fact: N rows, ~50% on key 0 (the hot key), the rest uniform over
N_KEYS; all values deterministic xxhash64 derivations. Dim: one row
per key. Arms per N:

1. group-by sum/count: direct vs salted_groupby_agg — expected WASH at
   every N (map-side partial aggregation collapses the hot key to one
   row per map task before the shuffle in both forms); the honest
   negative that scopes the toolkit to aggregates whose state cannot
   collapse map-side.
2. fact-dim shuffle equi-join (broadcast disabled — the stand-in for
   a dim too big to broadcast): AQE off vs AQE on (runtime skew split)
   vs salted_join with AQE off.
3. per-group top-k window: single row_number window vs the salted
   two-phase form — the case AQE can NOT fix (window partitions are
   not splittable at runtime).

Every mitigated arm's RESULT is asserted equal to its naive arm's via
exact integer checksums (val/rate are longs: float sums are execution-
order-dependent and would be ULP-flaky), so a speed number can never
hide a wrong answer. Results recorded in SCALE.md round-9. Run:
    python scripts/skew_scale_run.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from snowflake_data_pipeline_demo_spark.operators.sampling import (  # noqa: E402
    group_quota_topk,
)
from snowflake_data_pipeline_demo_spark.operators.skew import (  # noqa: E402
    salted_groupby_agg, salted_join,
)
from snowflake_data_pipeline_demo_spark.session import get_spark  # noqa: E402

N_KEYS = 100_000
BUCKETS = 32
TOPK = 10


def fact(spark, n_rows: int, hot_pct: int):
    """~hot_pct% of rows on key 0, the rest uniform over N_KEYS keys."""
    return spark.range(n_rows).select(
        F.col("id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < hot_pct, F.lit(0))
         .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_KEYS)))
         .alias("key"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).alias("val"),
    )


def dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)).alias("rate"),
    )


def timed(thunk):
    t0 = time.time()
    r = thunk()
    return r, round(time.time() - t0, 2)


def run_scale(spark, n_rows: int, hot_pct: int) -> dict:
    f = fact(spark, n_rows, hot_pct).repartition(32).cache()
    d = dim(spark).repartition(32).cache()
    hot = f.filter(F.col("key") == 0).count()
    d.count()
    out = {"n_rows": n_rows, "n_keys": N_KEYS, "hot_rows": hot,
           "hot_share": round(hot / n_rows, 4)}

    def set_conf(aqe: bool, broadcast: bool = True) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       "10485760" if broadcast else "-1")

    # -- arm 1: decomposable group-by agg (expected wash) -------------
    direct, t_direct = timed(lambda: (
        f.groupBy("key")
         .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
         .agg(F.count("*"), F.sum("n"), F.sum("s")).collect()
    ))
    salted, t_salted = timed(lambda: (
        salted_groupby_agg(f, ["key"], "id",
                           {"n": "count(val)", "s": "sum(val)"},
                           buckets=BUCKETS)
        .agg(F.count("*"), F.sum("n"), F.sum("s")).collect()
    ))
    assert [tuple(r) for r in direct] == [tuple(r) for r in salted], \
        (direct, salted)
    out["agg"] = {"direct_sec": t_direct, "salted_sec": t_salted}

    # -- arm 2: skewed shuffle join ------------------------------------
    def join_arm(use_salt: bool):
        j = (salted_join(f, d, ["key"], "id", buckets=BUCKETS)
             if use_salt else f.join(d, "key"))
        return (j.select((F.col("val") * F.col("rate")).alias("x"))
                 .agg(F.count("*").alias("n"), F.sum("x").alias("chk"))
                 .collect()[0])

    set_conf(aqe=False, broadcast=False)
    r_off, t_off = timed(lambda: join_arm(False))
    set_conf(aqe=True, broadcast=False)
    r_aqe, t_aqe = timed(lambda: join_arm(False))
    set_conf(aqe=False, broadcast=False)
    r_salt, t_salt = timed(lambda: join_arm(True))
    set_conf(aqe=True, broadcast=True)  # restore session defaults
    assert tuple(r_off) == tuple(r_aqe) == tuple(r_salt), \
        (r_off, r_aqe, r_salt)
    out["join"] = {"rows": int(r_off["n"]), "aqe_off_sec": t_off,
                   "aqe_on_sec": t_aqe, "salted_aqe_off_sec": t_salt}

    # -- arm 3: per-group top-k window ---------------------------------
    def naive_topk():
        w = Window.partitionBy("key").orderBy(F.desc("val"), F.asc("id"))
        return (f.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= TOPK)
                 .agg(F.count("*").alias("n"),
                      F.sum("val").alias("chk"),
                      F.sum("id").alias("idchk")).collect()[0])

    def salted_topk():
        return (group_quota_topk(f, "key", "val", TOPK, "id",
                                 salt_buckets=BUCKETS,
                                 # the measurement wants the salted arm
                                 # itself; auto would (correctly) pick
                                 # naive below the 32M-row threshold
                                 mode="salted")
                .agg(F.count("*").alias("n"),
                     F.sum("val").alias("chk"),
                     F.sum("id").alias("idchk")).collect()[0])

    r_naive, t_naive = timed(naive_topk)
    r_quota, t_quota = timed(salted_topk)
    assert tuple(r_naive) == tuple(r_quota), (r_naive, r_quota)
    out["window_topk"] = {"rows": int(r_naive["n"]),
                          "naive_sec": t_naive, "salted_sec": t_quota}
    f.unpersist(), d.unpersist()
    return out


def main() -> None:
    spark = get_spark("skew_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    results = []
    # (rows, hot%): the 50% points probe hot-group SIZE with balanced
    # residual work (32 cores each hold ~1/32 of total — the hot task
    # is ~16x the average but the rest of the cluster is busy); the
    # 95% point isolates the STRAGGLER: one task owns ~all rows while
    # 31 cores idle — the local analog of a boilerplate-heavy domain
    # landing on one reducer of a 1000-executor job.
    for n_rows, hot_pct in ((4_000_000, 50), (32_000_000, 50),
                            (32_000_000, 95)):
        row = run_scale(spark, n_rows, hot_pct)
        results.append(row)
        print(json.dumps(row), flush=True)
    print("== summary ==")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

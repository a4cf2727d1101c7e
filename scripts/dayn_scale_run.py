#!/usr/bin/env python
"""Day-N ingest flatness (round-7 scale run).

The state-family claim every SCALE.md section leans on is "day-2 pays
O(batch)". This run extends it to day N: ingest SIX consecutive daily
batches of 10,000 docs each through the persisted-index MinHash dedup
(streaming/dedup.minhash_dedup_batch_fn with a bands_table), where 20%
of each post-day-0 batch exactly re-delivers day-0 content, and
measure per-day wall time while history grows 6x. The contrast is the
from-scratch BOOTSTRAP at days 2 and 5 (fresh state, all history as
one batch): flat incremental seconds vs linearly growing scratch
seconds is the measured form of the claim.

Corpus: the winnow study's deterministic generator shape — 10,240-word
Zipf-ish vocabulary, ~120 tokens/doc, md5-derived draws (no RNG).
Results recorded in SCALE.md round-7. Run: python scripts/dayn_scale_run.py
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
from pyspark.sql import types as T  # noqa: E402

from snowflake_data_pipeline_demo_spark.caching import (  # noqa: E402
    release_lane_caches, release_stray_persistent_rdds,
)
from snowflake_data_pipeline_demo_spark.session import get_spark  # noqa: E402
from snowflake_data_pipeline_demo_spark.sources.catalog import Table  # noqa: E402
from snowflake_data_pipeline_demo_spark.streaming.dedup import (  # noqa: E402
    minhash_dedup_batch_fn,
)

VOCAB = 10_240
TOKENS_PER_DOC = 120
DOCS_PER_DAY = 10_000
N_DAYS = 6
REDELIVER_FRAC = 5  # 1-in-5 of each post-day-0 batch re-delivers day 0

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def gen_text(src_gid):
    """Deterministic document text for a source gid COLUMN: token j is
    drawn from the vocab by squashing a uniform md5 draw through
    pow(u, 2.2) (Zipf-ish head skew) — same generator shape as the
    winnow study. ONE shared generator: the benchmark's 'verbatim
    re-delivery' invariant is that equal src_gid means byte-identical
    text, so the day-0 path and the re-delivery path MUST evaluate
    the identical expression (r07 third review killed the duplicated
    closure that invariant was one drive-by edit from breaking)."""
    def tok(j):
        u = F.conv(
            F.substring(
                F.md5(F.concat_ws("-", src_gid.cast("string"),
                                  j.cast("string"))), 1, 8),
            16, 10,
        ).cast("double") / F.lit(float(1 << 32))
        idx = F.floor(F.pow(u, F.lit(2.2)) * VOCAB).cast("long")
        return F.concat(F.lit("w"), idx.cast("string"))

    return F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
                    tok), " ",
    )


def day_batch(spark, day: int):
    """Day ``day``'s 10k-doc batch: doc_ids are day-offset; for
    day > 0, every REDELIVER_FRAC-th doc re-delivers day-0 TEXT
    verbatim under a fresh doc_id (the exact-duplicate flood the
    banded probe must drop against 10k*day rows of history). The
    re-delivered text is REBUILT from the day-0 gid through the same
    generator — identical md5 draws, no day-0 scan needed."""
    lo, hi = day * DOCS_PER_DAY, (day + 1) * DOCS_PER_DAY
    base = spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    src = F.col("doc_id")
    if day > 0:
        src = F.when(
            F.col("doc_id") % REDELIVER_FRAC == 0,
            F.col("doc_id") % DOCS_PER_DAY,   # a day-0 gid
        ).otherwise(F.col("doc_id"))
    return base.select("doc_id", gen_text(src).alias("text"))


def make_tables(spark, root: str):
    clean = Table(spark, f"{root}/clean", DOC_SCHEMA)
    sigs = Table(spark, f"{root}/sigs", T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]))
    bands = Table(spark, f"{root}/bands", T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("key", T.StringType()),
    ]))
    return clean, sigs, bands


def main() -> None:
    spark = get_spark("dayn_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    root = tempfile.mkdtemp(prefix="dayn_state_")
    clean, sigs, bands = make_tables(spark, root)
    fn = minhash_dedup_batch_fn(clean, sigs, bands, threshold=0.9)

    batches = []
    for day in range(N_DAYS):
        b = day_batch(spark, day).repartition(32)
        b.write.mode("overwrite").parquet(f"{root}/staged/day={day}")
        batches.append(spark.read.parquet(f"{root}/staged/day={day}"))

    out = {"per_day": [], "scratch": []}
    for day in range(N_DAYS):
        t0 = time.time()
        fn(batches[day], day)
        secs = round(time.time() - t0, 2)
        # tracked caches only INSIDE the timed loop — the stray-RDD
        # sweep's async block removals would contaminate the next
        # day's timing (the verify-skill per-pass-not-per-query rule;
        # the ~12 leftover checkpoint RDDs are id+16-long rows)
        release_lane_caches()
        row = {
            "day": day,
            "sec": secs,
            "history_sigs": sigs.read().count(),
            "kept": spark.read.parquet(
                f"{root}/clean/batch={day}").count(),
        }
        out["per_day"].append(row)
        print(json.dumps(row), flush=True)
    release_stray_persistent_rdds(spark)

    # contrast: bootstrap-from-scratch over the union at day 2 and 5 —
    # the cost a pipeline WITHOUT persisted state pays every day
    for upto in (2, 5):
        sroot = tempfile.mkdtemp(prefix="dayn_scratch_")
        c2, s2, b2 = make_tables(spark, sroot)
        fn2 = minhash_dedup_batch_fn(c2, s2, b2, threshold=0.9)
        union = batches[0]
        for b in batches[1:upto + 1]:
            union = union.unionByName(b)
        t0 = time.time()
        fn2(union, 0)
        secs = round(time.time() - t0, 2)
        release_lane_caches()
        release_stray_persistent_rdds(spark)
        row = {"scratch_through_day": upto, "docs": (upto + 1) * DOCS_PER_DAY,
               "sec": secs}
        out["scratch"].append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(sroot, ignore_errors=True)

    print("== summary ==")
    print(json.dumps(out, indent=1))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

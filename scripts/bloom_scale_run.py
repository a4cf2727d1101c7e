#!/usr/bin/env python
"""Bloom seen-set FPR realization at 1M keys (round-7 scale run).

dedup.bloom_size promises that the closed-form (m_bits, k) it returns
realizes at-or-under the target false-positive rate; the unit test
checks the FORMULA, this run checks the FILTER — build the seen-set
from 1,000,000 distinct md5 fingerprints at three fpr targets, probe
500k members + 500k non-members, and measure:

- realized FPR on true non-members vs the target (must be <= target
  within binomial noise on 500k trials);
- false negatives (must be EXACTLY zero — the one hard guarantee);
- state size in block rows (m/32) and build/probe wall time.

Everything is deterministic (keys are md5 of sequential ids — no RNG).
Results recorded in SCALE.md round-7. Run: python scripts/bloom_scale_run.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_data_pipeline_demo_spark.caching import (  # noqa: E402
    release_lane_caches, release_stray_persistent_rdds,
)
from snowflake_data_pipeline_demo_spark.operators import dedup  # noqa: E402
from snowflake_data_pipeline_demo_spark.session import get_spark  # noqa: E402

N_KEYS = 1_000_000
N_PROBE_EACH = 500_000


def keys(spark, lo: int, hi: int, id_start: int = 0):
    """Deterministic fingerprints: md5 of the sequential id."""
    return spark.range(lo, hi).select(
        (F.col("id") - lo + id_start).alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )


def main() -> None:
    spark = get_spark("bloom_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    hist = keys(spark, 0, N_KEYS).repartition(32).cache()
    hist.count()
    # members: first 500k history keys; non-members: ids past N_KEYS
    members = keys(spark, 0, N_PROBE_EACH)
    nonmembers = keys(spark, N_KEYS, N_KEYS + N_PROBE_EACH,
                      id_start=N_KEYS)
    probe = members.unionByName(nonmembers).repartition(32).cache()
    probe.count()

    out = []
    for fpr in (0.05, 0.01, 0.001):
        m_bits, k = dedup.bloom_size(N_KEYS, fpr)
        t0 = time.time()
        blocks = dedup.bloom_merge(
            dedup.bloom_shard_blocks(hist, "fp", m_bits=m_bits, k=k)
        ).cache()
        n_blocks = blocks.count()
        build_s = round(time.time() - t0, 2)

        t0 = time.time()
        res = (
            dedup.bloom_probe(probe, blocks, "fp",
                              m_bits=m_bits, k=k)
            .withColumn("is_member", F.col("doc_id") < N_PROBE_EACH)
            .groupBy("is_member", "maybe_member")
            .count().collect()
        )
        probe_s = round(time.time() - t0, 2)
        cnt = {(r["is_member"], r["maybe_member"]): r["count"]
               for r in res}
        false_neg = cnt.get((True, False), 0)
        false_pos = cnt.get((False, True), 0)
        row = {
            "fpr_target": fpr,
            "m_bits": m_bits,
            "k": k,
            "block_rows": n_blocks,
            "state_mib": round(m_bits / 8 / 2 ** 20, 1),
            "build_sec": build_s,
            "probe_sec": probe_s,
            "false_negatives": false_neg,
            "false_positives": false_pos,
            "fpr_realized": round(false_pos / N_PROBE_EACH, 5),
        }
        blocks.unpersist()
        release_lane_caches()
        out.append(row)
        print(json.dumps(row), flush=True)
        assert false_neg == 0, "Bloom false negative — broken filter"

    release_stray_persistent_rdds(spark)
    print("== summary ==")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

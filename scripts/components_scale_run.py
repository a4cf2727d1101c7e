#!/usr/bin/env python
"""Connected-components diameter stress (round-9 scale run).

SCALE.md has carried the round contract as prose since r04 — min-label
propagation converges in DIAMETER rounds, large-star/small-star
(Kiveris et al. 2014) in rounds independent of diameter — pinned only
by a 64-node unit test. Dup-cluster graphs are near-cliques (diameter
2-3, propagation is optimal there), but the operator is also the
backbone for chunk-reassembly and cross-source link graphs where long
chains are REAL, and at 100 TB each extra round is a full shuffle over
the edge list. This run measures the contract at planted diameters the
unit test can't reach.

Graph: N nodes split into chains of length L (so diameter = L - 1 per
component, N/L components, component min = the chain head). Both
algorithms run through the SAME public entry
(components_from_pairs(..., stats=)), which now reports rounds; labels
are verified exactly against the analytic expectation (nid - nid % L),
so a speed number can never hide a wrong answer.

Arms per L: bigstar to convergence; propagation to convergence where
the diameter makes that merely painful (L <= PROP_MAX_L), else one
CAPPED run at the default max_iter=25 to show it is provably
mid-flight (converged=False) — executing ~16k propagation rounds is
the point, not an oversight. Results recorded in SCALE.md round-9.
Run:
    python scripts/components_scale_run.py
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
from snowflake_data_pipeline_demo_spark.operators.dedup import (  # noqa: E402
    components_from_pairs,
)
from snowflake_data_pipeline_demo_spark.session import get_spark  # noqa: E402

N_NODES = 1 << 17          # 131,072 nodes at every L — edges ~= N
PROP_MAX_L = 64            # propagation runs to convergence only here
BIGSTAR_MAX_ITER = 40


def chain_graph(spark, n: int, length: int):
    """(ids, pairs): n nodes in n/length chains; edge (i, i+1) unless
    i+1 starts the next chain. Deterministic, no data files."""
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(n)
        .filter((F.col("id") + 1) % length != 0)
        .filter(F.col("id") + 1 < n)
        .select(F.col("id").alias("id_a"),
                (F.col("id") + 1).alias("id_b"))
    )
    return ids, pairs


def run_arm(spark, ids, pairs, algorithm: str, max_iter: int,
            length: int, on_exhausted: str = "ignore") -> dict:
    """One timed arm over its OWN fresh input caches. The per-arm
    cache scope matters twice over (r09 review, both passes): the
    algorithms localCheckpoint per round (the lineage cut), and those
    blocks are invisible to the lane-cache drain — they must be
    force-swept between arms or they contaminate the next arm's
    timing with storage pressure + async removals (same per-stage rule
    as dayn_semantic_scale_run). But the force-sweep unpersists the
    SQL caches' buffer RDDs behind the CacheManager's back, after
    which a re-`.cache()` is a registered no-op that never re-stores —
    so a shared cache would leave later arms silently UNCACHED and the
    arms incomparable. Fresh cache in, full unpersist + sweep out."""
    ids, pairs = ids.cache(), pairs.cache()
    ids.count(), pairs.count()
    stats: dict = {}
    t0 = time.time()
    labels = components_from_pairs(
        ids, pairs, id_col="doc_id", max_iter=max_iter,
        algorithm=algorithm, stats=stats,
        # "ignore" arms WANT the partial labels at cap (the wrong-label
        # count below is the point); the "escalate" arm measures the
        # r10 production default on the same capped input
        on_exhausted=on_exhausted,
    )
    wrong = labels.filter(
        F.col("component_id")
        != F.col("doc_id") - F.col("doc_id") % length
    ).count()
    secs = round(time.time() - t0, 2)
    ids.unpersist(), pairs.unpersist()
    release_lane_caches()
    # safe: the arm is fully executed (wrong-label count) before the
    # sweep, so no live plan depends on a checkpoint
    release_stray_persistent_rdds(spark)
    return {
        "algorithm": algorithm, "max_iter": max_iter,
        "on_exhausted": on_exhausted,
        "rounds": stats["rounds"], "converged": stats["converged"],
        "escalated": stats.get("escalated"),
        "wrong_labels": wrong, "sec": secs,
    }


def main() -> None:
    spark = get_spark("components_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    out = []
    for length in (64, 1024, 16384):
        # caching happens per-arm (run_arm docstring); here only the
        # partitioning is fixed
        ids, pairs = chain_graph(spark, N_NODES, length)
        ids = ids.repartition(32)
        pairs = pairs.repartition(32)
        row = {"n_nodes": N_NODES, "chain_len": length,
               "diameter": length - 1,
               "components": N_NODES // length,
               "arms": []}
        row["arms"].append(
            run_arm(spark, ids, pairs, "bigstar", BIGSTAR_MAX_ITER,
                    length)
        )
        if length <= PROP_MAX_L:
            # diameter+1 rounds to converge; +4 headroom
            arm = run_arm(spark, ids, pairs, "propagation", length + 4,
                          length)
        else:
            # capped at the operator default — the measurement IS that
            # 25 rounds leave a diameter-1023+ graph unconverged
            arm = run_arm(spark, ids, pairs, "propagation", 25, length)
        row["arms"].append(arm)
        if length > PROP_MAX_L:
            # r10 arm: the production DEFAULT on the same capped input —
            # propagation burns its 25 rounds, then escalates to bigstar
            # over the contracted graph. wrong_labels MUST be 0; the
            # cost question is how much the wasted propagation prefix +
            # contraction adds over running bigstar from the start.
            row["arms"].append(
                run_arm(spark, ids, pairs, "propagation", 25, length,
                        on_exhausted="escalate")
            )
        out.append(row)
        print(json.dumps(row), flush=True)
    print("== summary ==")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

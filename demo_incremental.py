#!/usr/bin/env python
"""Run-book for INCREMENTAL ingest — the day-2 story.

Day 1 curates a corpus and persists the state a later run needs:
the MinHash signature + banded-key LSH index, the Bloom seen-set,
and the corpus-profile sketches (HLL + length histograms). Day 2
ingests a fresh batch touching ONLY that state — no day-1 text is
re-read anywhere — which is the entire operating model at 100 TB:
every run pays O(its own batch); corpus-wide reports stay one merge
over persisted sketch rows.

The day-2 batch is built to exercise every path: exact re-deliveries
(Bloom catches them join-free), near-duplicates (the banded index
flags them at O(batch) probe cost), and novel documents (signed and
appended, so day 3 sees them).

Usage: python demo_incremental.py [sf_dir] [state_dir]
       (defaults /root/testdata/sf0.01, a temp dir)
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_data_pipeline_demo_spark.caching import release_lane_caches
from snowflake_data_pipeline_demo_spark.operators import (
    dedup, similarity, text,
)
from snowflake_data_pipeline_demo_spark.session import get_spark
from snowflake_data_pipeline_demo_spark.sources import testdata
from snowflake_data_pipeline_demo_spark.sources.catalog import Table
from snowflake_data_pipeline_demo_spark.streaming.dedup import (
    minhash_dedup_batch_fn,
)
from snowflake_data_pipeline_demo_spark.streaming.profile import (
    corpus_profile, profile_batch_fn,
)

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("source", T.StringType()),
])
SIG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sig", T.ArrayType(T.LongType())),
])
BAND_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("key", T.StringType()),
])
BLOOM_SCHEMA = T.StructType([
    T.StructField("shard", T.LongType()),
    T.StructField("block", T.IntegerType()),
    T.StructField("bits", T.LongType()),
])
HLL_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("shard", T.LongType()),
    T.StructField("sketch", T.BinaryType()),
])
HIST_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("shard", T.LongType()),
    T.StructField("bucket", T.IntegerType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("gamma", T.DoubleType()),
])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    state = (sys.argv[2] if len(sys.argv) > 2
             else tempfile.mkdtemp(prefix="incremental_state_"))
    spark = get_spark("demo_incremental")
    d = testdata.load(spark, sf_dir, "documents") \
        .select("doc_id", "text", "source")
    # Bloom sizing from the closed form, not hand-picked constants
    # (r06 verdict ask #5): size for the EXPECTED HISTORY — here ~4
    # snapshots of this corpus before the one-pass rebuild — at 1% FPR.
    bloom_m, bloom_k = dedup.bloom_size(4 * d.count(), fpr=0.01)
    print(f"== bloom sized by closed form: m=2^{bloom_m.bit_length() - 1}"
          f" bits ({bloom_m // 32} block rows), k={bloom_k}")

    clean = Table(spark, f"{state}/clean", DOC_SCHEMA)
    sigs = Table(spark, f"{state}/sigs", SIG_SCHEMA)
    bands = Table(spark, f"{state}/bands", BAND_SCHEMA)
    bloom = Table(spark, f"{state}/bloom", BLOOM_SCHEMA)
    hll = Table(spark, f"{state}/hll", HLL_SCHEMA)
    hist = Table(spark, f"{state}/hist", HIST_SCHEMA)

    # ---- day 1: curate, persist all state ----
    day1 = d.filter(F.col("doc_id") % 3 < 2)
    ingest = minhash_dedup_batch_fn(clean, sigs, bands_table=bands,
                                    threshold=0.5)
    ingest(day1, 0)
    # persist day-1's component assignment — day 2 folds into it
    dedup.neardup_components(clean.read(), threshold=0.5) \
        .select("doc_id", "component_id") \
        .write.mode("overwrite").parquet(f"{state}/components")
    bloom.overwrite_subdir(
        dedup.bloom_shard_blocks(
            clean.read().select(
                text.content_fingerprint("text").alias("fp")),
            "fp", m_bits=bloom_m, k=bloom_k,
        ),
        "run=day1",
    )
    profile_batch_fn(hll, hist)(day1, 0)
    # covariance state (the 6th state-family member): day-1 embeddings
    # reduce to (i, j, sp, si, sj, n) second-moment rows — dim^2-scale,
    # exact-mergeable, so day 2 refreshes corpus PCA at O(own batch)
    emb = testdata.load(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    similarity.embedding_covariance_state(
        emb.filter(F.col("vec_id") % 3 < 2)
    ).write.mode("overwrite").parquet(f"{state}/covstate")
    n1 = clean.read().count()
    print(f"== day 1: ingested {day1.count()} docs, kept {n1}; "
          f"state: {sigs.read().count()} sigs, "
          f"{bands.read().count()} band keys, "
          f"{bloom.read().count()} bloom blocks")
    # day boundary: drain the operators' lane-scoped caches (the
    # caching.py contract for long-lived sessions — a day-N loop pays
    # one lane's caches at a time, not N days' worth)
    release_lane_caches()

    # ---- day 2: exact re-deliveries + near-dups + novel docs ----
    # deterministic doc_id predicates, not limit(): an unordered limit
    # is re-evaluated per job and can return different rows each time
    redelivered = day1.filter(F.col("doc_id") % 12 == 0)  # exact repeats
    neardup = day1.filter(F.col("doc_id") % 12 == 1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        # perturb one token: still >= 0.5 estimated Jaccard
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "source",
    )
    novel = d.filter(F.col("doc_id") % 3 == 2)
    print(f"== day 2 batch: {redelivered.count()} re-delivered, "
          f"{neardup.count()} near-dup, {novel.count()} novel")

    # stage 1: Bloom pre-filter kills exact re-deliveries join-free
    # (bloom_probe bit_or-merges the multi-run blocks internally)
    seen = bloom.read()
    keyed = redelivered.unionByName(neardup).unionByName(novel) \
        .withColumn("fp", text.content_fingerprint("text"))
    probed = dedup.bloom_probe(keyed, seen, "fp",
                               m_bits=bloom_m, k=bloom_k).join(
        keyed.select("doc_id", "text", "source"), "doc_id")
    fresh = probed.filter(~F.col("maybe_member")) \
        .select("doc_id", "text", "source")
    n_skipped = probed.count() - fresh.count()
    # NOTE: n_skipped can be LESS than the re-delivered count — the
    # Bloom state holds only docs actually KEPT on day 1, so a
    # re-delivery of a doc that day 1 dropped as a near-dup reads
    # "definitely new" here (its fp was never ingested) and is
    # correctly re-dropped by the banded-index probe in stage 2.
    print(f"== bloom pre-filter: skipped {n_skipped} already-ingested "
          f"docs without touching the history table")

    # stage 2: banded-index near-dup probe over the survivors
    ingest(fresh, 1)
    kept2 = clean.read().count() - n1
    print(f"== banded-index ingest: kept {kept2} of {fresh.count()} "
          f"(near-dups dropped at O(batch) probe cost)")

    # stage 3: fold the batch into the PERSISTED component assignment —
    # only batch shingles join the corpus (ngram_jaccard_pairs_probe)
    # and history folds in as id-scale label edges; day-1 components
    # are never recomputed (5.3x vs recompute at 4xsf0.1, SCALE.md)
    is_day2 = (F.col("doc_id") % 3 == 2) | (F.col("doc_id") >= 1_000_000)
    new_pairs = dedup.ngram_jaccard_pairs_probe(
        clean.read(), probe=is_day2, threshold=0.5)
    merged_comps = dedup.merge_components_incremental(
        spark.read.parquet(f"{state}/components"),
        clean.read().filter(is_day2).select("doc_id"),
        new_pairs,
    )
    n_comp = merged_comps.filter(
        F.col("doc_id") != F.col("component_id")).count()
    print(f"== incremental component merge over persisted assignment: "
          f"{n_comp} docs labeled into another doc's cluster")

    # stage 4: profile state stays current; report reads state only
    profile_batch_fn(hll, hist)(novel, 1)
    print("== corpus profile from persisted sketch state alone:")
    corpus_profile(hll, hist).orderBy("source").show(5)

    # day-3 bloom state: merge day-2 novel fingerprints in
    bloom.overwrite_subdir(
        dedup.bloom_shard_blocks(
            fresh.select(text.content_fingerprint("text").alias("fp")),
            "fp", shard_col=F.lit(1).cast("long"),
            m_bits=bloom_m, k=bloom_k,
        ),
        "run=day2",
    )
    print(f"== day-3-ready: bloom now {bloom.read().count()} block rows "
          f"across 2 runs (bit_or-merged at probe time)")

    # stage 5: PCA refresh from MERGED covariance state — day 2 grams
    # only its own embeddings, sums them into day-1's persisted
    # second-moment rows, and re-derives the corpus components; day-1
    # vectors are never re-read. The from-scratch comparison below is
    # the live merge==recompute assertion (e2e twin:
    # tests/test_extensions.py::test_day2_pca_refresh_equals_scratch).
    import numpy as np

    day2_state = similarity.embedding_covariance_state(
        emb.filter(F.col("vec_id") % 3 == 2))
    merged_state = similarity.covariance_partial_state(
        spark.read.parquet(f"{state}/covstate").unionByName(day2_state))
    dim = int(emb.select(F.size("embedding")).first()[0])
    # one collect, reused for components AND eigenvalues — the merged
    # plan re-runs the day-2 gram pass per action otherwise
    cov_rows = similarity.covariance_finalize(merged_state).collect()
    comps = similarity.pca_components(cov_rows, dim, k=4)
    scratch = similarity.pca_components(
        similarity.embedding_covariance(emb).collect(), dim, k=4)
    assert np.allclose(np.asarray(comps), np.asarray(scratch),
                       atol=1e-4), "merged-state PCA drifted"
    merged_state.write.mode("overwrite").parquet(
        f"{state}/covstate_day2")
    ev = similarity.pca_eigenvalues(cov_rows, comps)
    print(f"== PCA refreshed from merged covariance state "
          f"(day-1 embeddings untouched): top eigenvalues "
          f"{[round(e, 4) for e in ev]} == from-scratch day1+2")

    # stage 6: SEMANTIC ingest dedup under the nlist-sizing contract —
    # the autoscaler owns the centroid set as persisted, epoch-
    # versioned state (streaming/dedup.SemanticIndexAutoscaler) and
    # retrains + re-backfills on geometric index growth, so per-day
    # probe cost stays O(batch) instead of drifting with history (the
    # +27%/2.8x fixed-nlist slope measured r08; autoscaled day-N
    # flatness: SCALE.md round-9). Day 1 bootstraps nlist from the
    # corpus; day 2 pays O(batch): bit-identical re-deliveries drop
    # against the index at cosine 1.0, novel vectors append. E2e twin:
    # tests/test_semantic_autoscale.py (cross-epoch dedup, orphan-
    # epoch replay, plain-mode migration).
    from snowflake_data_pipeline_demo_spark.streaming.dedup import (
        SemanticIndexAutoscaler,
    )

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("embedding"))
    vclean = Table(spark, f"{state}/vec_clean", T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]))
    scaler = SemanticIndexAutoscaler(vclean, f"{state}/vec_index",
                                     threshold=0.99, target_occupancy=32)
    vfn = scaler.batch_fn()
    day1_vecs = vecs.filter(F.col("vec_id") % 3 < 2)
    vfn(day1_vecs, 0)
    boot = dict(scaler.last_action)
    n_v1 = vclean.read().count()
    redeliv = day1_vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding")
    n_re = redeliv.count()
    day2_vecs = vecs.filter(F.col("vec_id") % 3 == 2).unionByName(redeliv)
    vfn(day2_vecs, 1)
    kept_v2 = vclean.read().count() - n_v1
    # every re-delivery is bit-identical to an indexed day-1 vector:
    # none may survive (cosine exactly 1.0 in its own cluster)
    assert vclean.read().filter(F.col("vec_id") >= 5_000_000).count() == 0, \
        "a re-delivered vector escaped the semantic index probe"
    assert kept_v2 <= day2_vecs.count() - n_re
    print(f"== autoscaled semantic ingest: day-1 bootstrap sized "
          f"nlist={boot['nlist']} from n={boot['n']} (occupancy target "
          f"32); day 2 dropped all {n_re} re-deliveries, kept {kept_v2} "
          f"novel; day-2 sizing action: {scaler.last_action['action']} "
          f"(epoch {scaler.last_action['epoch']}, "
          f"nlist {scaler.last_action['nlist']})")
    # lane_cache'd operator caches (shingle frames, probe bases) end
    # their useful life with the run — drain them like the registry
    # runners do (the caching.py contract for long-lived sessions; a
    # day-N loop would call this per day)
    release_lane_caches()


if __name__ == "__main__":
    main()

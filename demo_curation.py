#!/usr/bin/env python
"""Run-book for the training-data surface: curate a document corpus
end to end — dedup -> decontaminate -> quality-filter -> semantic
dedup -> importance-weight -> chunk -> pack -> split — printing what
a curation run reports at every scale.

Usage: python demo_curation.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from snowflake_data_pipeline_demo_spark.operators import (
    chunking, curation, decontam, dedup, packing, sampling, text,
)
from snowflake_data_pipeline_demo_spark.session import get_spark
from snowflake_data_pipeline_demo_spark.sources import testdata


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo_curation")
    d = testdata.load(spark, sf_dir, "documents")
    eval_docs = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)

    print("== curation funnel:")
    funnel = curation.curation_funnel(corpus, eval_docs, min_required=1).orderBy("stage_id")
    funnel.show(truncate=False)

    # materialize the kept set and carry it through chunk -> pack -> split
    deduped = dedup.drop_exact_dups(corpus)
    clean = decontam.decontaminate(deduped, eval_docs)
    kept = clean.filter(text.gopher_flags("text", min_required=1)["keep"]).cache()

    # semantic dedup over the embeddings table (cluster-bounded, BLAS
    # assignment) — at scale this joins back to kept doc ids; here the
    # id spaces are separate tables, so report the embedding-side drops
    emb = testdata.load(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    sem = dedup.semdedup(emb, cent, threshold=0.4,
                         assignment_impl="pandas")
    n_vec = sem.count()
    n_drop = sem.filter(~F.col("is_kept")).count()
    print(f"== semantic dedup: {n_vec} vectors, {n_drop} semantic dups dropped")

    # DSIR importance vs the eval-like target sample: the weights a
    # resampling loader consumes
    print("== DSIR importance (top 5 target-like kept docs):")
    text.dsir_importance(kept, eval_docs) \
        .orderBy(F.desc("importance")).limit(5).show()

    chunks = chunking.chunk_by_tokens(kept, window=32, stride=24)
    packed = packing.pack_sequences(chunks, seq_len=64)
    n_chunks = chunks.count()
    max_pack = packed.agg(F.max("pack_id")).first()[0]
    n_packs = (max_pack + 1) if max_pack is not None else 0
    print(f"== chunks: {n_chunks}, packed 64-token sequences: {n_packs}")

    print("== deterministic splits:")
    kept.withColumn("split", sampling.split_label("doc_id", 90, 5)) \
        .groupBy("split").agg(F.count("*").alias("n_docs")) \
        .orderBy("split").show()


if __name__ == "__main__":
    main()

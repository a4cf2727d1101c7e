"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard guard against
test-set leakage in LLM training corpora.

Design for 100 TB: the eval set is benchmark-scale (thousands of docs,
MBs of distinct n-grams) while the corpus is the 100 TB side, so the
eval n-gram set is BROADCAST and the corpus never shuffles its text:
corpus docs stream through shingling, probe the broadcast set, and only
(doc_id, hit-count) rows — a few bytes each — reach the final per-doc
aggregation, which combines map-side. If the eval set ever outgrows
broadcast range, the same plan degrades gracefully to a shuffle
hash-join on the shingle key; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exploded_shingles


def ngram_contamination(corpus: DataFrame, eval_docs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, min_hits: int = 2) -> DataFrame:
    """Per corpus document: how many distinct word ``k``-grams it shares
    with the eval set, and whether that makes it contaminated
    (``n_hits >= min_hits``).

    Output: ``(id_col, n_hits, contaminated)`` — one row per corpus doc
    (docs with zero overlap included, n_hits = 0), ready to drive a
    filter or a quarantine split.
    """
    ev = (
        exploded_shingles(eval_docs, text_col, id_col, k)
        .select(F.col("_sh")).filter(F.col("_sh").isNotNull()).distinct()
    )
    hits = (
        exploded_shingles(corpus, text_col, id_col, k)
        .join(F.broadcast(ev), "_sh")
        .groupBy(id_col)
        .agg(F.count_distinct("_sh").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits)
            .alias("contaminated"),
        )
    )


def decontaminate(corpus: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, min_hits: int = 2) -> DataFrame:
    """The filtering form: corpus rows whose n-gram overlap with the
    eval set stays below ``min_hits``."""
    clean = ngram_contamination(
        corpus, eval_docs, text_col, id_col, k, min_hits
    ).filter(~F.col("contaminated")).select(id_col)
    return corpus.join(clean, id_col, "left_semi")


def contamination_matrix(corpus: DataFrame,
                         eval_sets: dict[str, DataFrame],
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 3, min_hits: int = 2) -> DataFrame:
    """The report a curation run publishes before training: per eval
    set, how much of the corpus is contaminated. Output one row per
    eval set: (eval_set, n_docs, n_contaminated, rate 4dp), union-ed in
    dict order.

    Scale shape: each eval set contributes one broadcast of its
    distinct shingles (eval sets are benchmark-scale); the corpus
    shingle stream is re-derived per set — at many eval sets, stage the
    corpus shingles once (a table write) and reuse, exactly like the
    funnel stages its id sets.
    """
    from functools import reduce

    from pyspark.sql import DataFrame as DF

    reports = []
    for name, ev in eval_sets.items():
        c = ngram_contamination(corpus, ev, text_col, id_col, k, min_hits)
        reports.append(
            c.agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum(F.col("contaminated").cast("long"))
                .cast("long").alias("n_contaminated"),
            ).select(
                F.lit(name).alias("eval_set"),
                "n_docs", "n_contaminated",
                F.round(F.col("n_contaminated") / F.col("n_docs"), 4)
                .alias("rate"),
            )
        )
    return reduce(DF.unionByName, reports)

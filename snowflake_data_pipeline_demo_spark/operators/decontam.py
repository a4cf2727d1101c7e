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

Preconditions (r12 ADVICE, made explicit):

- ``id_col`` is assumed UNIQUE per corpus row. The id-keyed forms
  (:func:`contaminated_ids` counting, :func:`contamination_matrix`'s
  ``n_contaminated``, :func:`~.curation.curation_funnel`'s left join)
  count distinct contaminated IDS; under duplicate ids they diverge
  from per-row counts (and the funnel's left join would fan out).
- A corpus row with NULL ``id_col`` is never dropped by
  :func:`decontaminate`'s anti-join form (NULL keys match nothing in a
  left-anti join), regardless of its text's overlap — whereas the
  min_hits <= 0 spine form drops it (NULL matches nothing in a
  left-semi join either). Pinned by the degenerate-inputs sweep;
  assign real ids upstream if NULL-id rows must be gated on content.
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


def contaminated_ids(corpus: DataFrame, eval_docs: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     k: int = 3, min_hits: int = 2) -> DataFrame:
    """Just the contaminated doc ids — :func:`ngram_contamination`
    without the zero-fill spine (the corpus-scan + left-join that
    exists only to give n_hits=0 docs a row). For ``min_hits >= 1`` a
    doc absent from the hit table cannot be contaminated, so consumers
    that need only the positive verdict (the funnel, the drop-reason
    audit, :func:`decontaminate`) skip that corpus pass and LEFT-join
    this id set instead. Requires ``min_hits >= 1``."""
    if min_hits < 1:
        raise ValueError(
            "contaminated_ids requires min_hits >= 1 (zero-hit docs "
            "carry no hit row; use ngram_contamination's spine form)"
        )
    ev = (
        exploded_shingles(eval_docs, text_col, id_col, k)
        .select(F.col("_sh")).filter(F.col("_sh").isNotNull()).distinct()
    )
    return (
        exploded_shingles(corpus, text_col, id_col, k)
        .join(F.broadcast(ev), "_sh")
        .groupBy(id_col)
        .agg(F.count_distinct("_sh").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
        .select(id_col)
    )


def decontaminate(corpus: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, min_hits: int = 2) -> DataFrame:
    """The filtering form: corpus rows whose n-gram overlap with the
    eval set stays below ``min_hits``.

    r12 shape: one ANTI-join of the corpus against the contaminated id
    set (hit-count agg filtered to >= min_hits). The previous form went
    through :func:`ngram_contamination`'s per-doc report, whose
    zero-fill spine (corpus ids LEFT-joined to the hit counts) exists
    only so n_hits=0 docs get a row — information the filter never
    uses, since a doc absent from the hit table cannot reach min_hits.
    Dropping it removes one corpus scan and one join from the plan
    (Scan 3 -> 2; the left-join + left-semi pair collapses to one
    left-anti). Requires min_hits >= 1 (a doc with zero hits must not
    count as contaminated); min_hits <= 0 keeps the spine form, whose
    `0 >= min_hits` zero-fill verdict drops every row.

    NULL-id seam (module docstring): the anti-join keeps NULL-id rows
    unconditionally (NULL matches nothing), where the old left-semi
    report form dropped them; pinned by the degenerate-inputs sweep."""
    if min_hits <= 0:
        clean = ngram_contamination(
            corpus, eval_docs, text_col, id_col, k, min_hits
        ).filter(~F.col("contaminated")).select(id_col)
        return corpus.join(clean, id_col, "left_semi")
    return corpus.join(
        contaminated_ids(corpus, eval_docs, text_col, id_col, k, min_hits),
        id_col, "left_anti",
    )


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

    r12 shape: the corpus row count is the SAME for every report row,
    so it is computed once (one id-only scan) and broadcast-crossJoined
    into each per-set count — the previous form re-ran
    ngram_contamination's zero-fill spine (corpus scan + left join) per
    eval set just to count rows whose n_hits the count never reads
    (per-set plan: Scan 3 -> 2, the spine join gone). Per-set
    contaminated counts come straight off the hit agg; min_hits <= 0
    (everything contaminated, zero-hit docs included) short-circuits to
    n_docs arithmetically instead of forcing the spine back.
    """
    from functools import reduce

    from pyspark.sql import DataFrame as DF

    total = corpus.agg(F.count("*").cast("long").alias("n_docs"))
    reports = []
    for name, ev in eval_sets.items():
        if min_hits <= 0:
            counted = total.select(
                F.lit(name).alias("eval_set"),
                "n_docs",
                F.col("n_docs").alias("n_contaminated"),
            )
        else:
            counted = (
                contaminated_ids(corpus, ev, text_col, id_col, k, min_hits)
                .agg(F.count("*").cast("long").alias("n_contaminated"))
                .crossJoin(F.broadcast(total))
                .select(
                    F.lit(name).alias("eval_set"),
                    "n_docs", "n_contaminated",
                )
            )
        reports.append(
            counted.select(
                "eval_set", "n_docs", "n_contaminated",
                F.round(F.col("n_contaminated") / F.col("n_docs"), 4)
                .alias("rate"),
            )
        )
    return reduce(DF.unionByName, reports)

"""The corpus-curation funnel: exact dedup → benchmark decontamination
→ quality filtering, composed from the individually oracle-gated
operators, with per-stage survivor counts — the summary a data-curation
run reports at every scale.

Scale: each stage is the operator's own plan (see their modules); the
funnel adds only four global counts. Stages compose as semi-joins on
doc ids, so text columns never re-shuffle between stages — at 100 TB
the funnel materializes each stage's id set (or runs as one plan and
lets the cache/table boundaries the caller chooses decide).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import ngram_contamination
from .dedup import exact_dedup_clusters
from .text import gopher_flags


def curation_funnel(corpus: DataFrame, eval_docs: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3, min_hits: int = 2,
                    min_required: int = 2) -> DataFrame:
    """Per-stage survivor counts: raw → exact-dedup'd → decontaminated
    → quality-kept. Output: (stage_id, stage, n_docs), stage_id giving
    the funnel order."""
    # stage boundaries: each later stage (and its count) would re-run
    # everything upstream otherwise — the contamination shingle join in
    # particular. Materialize only the ID SETS (a long per surviving
    # doc, not the text): same recompute savings, bounded footprint. Via
    # localCheckpoint, not cache — checkpoint blocks are released when
    # the funnel result is dropped, where cached frames would stay
    # pinned in the catalog until explicitly unpersisted, accumulating
    # storage across calls in a long-lived session. At warehouse scale
    # these id sets are the stage tables a curation run persists anyway.
    dedup_keep = exact_dedup_clusters(corpus, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    ).localCheckpoint(eager=False)
    deduped = corpus.join(dedup_keep, id_col, "left_semi")
    clean_ids = ngram_contamination(
        deduped, eval_docs, text_col, id_col, k, min_hits
    ).filter(~F.col("contaminated")).select(id_col).localCheckpoint(eager=False)
    clean = deduped.join(clean_ids, id_col, "left_semi")
    kept = clean.filter(gopher_flags(text_col, min_required)["keep"])

    stages = [
        (0, "raw", corpus),
        (1, "exact_dedup", deduped),
        (2, "decontaminated", clean),
        (3, "quality_kept", kept),
    ]
    counts = [
        df.agg(F.count("*").alias("n_docs")).select(
            F.lit(sid).alias("stage_id"),
            F.lit(name).alias("stage"),
            "n_docs",
        )
        for sid, name, df in stages
    ]
    return reduce(DataFrame.unionByName, counts)


def drop_reasons(corpus: DataFrame, eval_docs: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 min_required: int = 2, min_hits: int = 2) -> DataFrame:
    """Per-document audit of the curation funnel: WHY was each document
    dropped — the first failing gate in funnel order ('exact_dup' ->
    'contaminated' -> 'low_quality') or 'kept'. The explainability
    report reviewers ask for when a source's volume collapses.

    Output: (id, drop_reason) — one row per corpus doc.

    Scale shape: each gate is its operator's own plan (fingerprint
    hash-agg, broadcast eval n-grams, codegen'd quality flags); the
    verdicts join back on the doc key — three id-scale joins, the text
    column read once per gate and never shuffled.
    """
    from .text import content_fingerprint

    # same representative policy as the funnel: exact_dedup_clusters'
    # min-id keeper — reusing it keeps the audit's verdicts from
    # drifting if the dedup policy ever changes
    clusters = exact_dedup_clusters(corpus, text_col, id_col).select(
        F.col("fp").alias("_fp"), "keep_id"
    )
    dup = corpus.select(
        F.col(id_col), content_fingerprint(text_col).alias("_fp")
    ).join(clusters, "_fp").select(
        F.col(id_col), (F.col(id_col) != F.col("keep_id")).alias("_is_dup")
    )
    cont = ngram_contamination(
        corpus, eval_docs, text_col, id_col, min_hits=min_hits
    ).select(F.col(id_col), "contaminated")
    qual = corpus.select(
        F.col(id_col),
        gopher_flags(text_col, min_required=min_required)["keep"].alias("_q"),
    )
    return (
        corpus.select(id_col)
        .join(dup, id_col)
        .join(cont, id_col)
        .join(qual, id_col)
        .select(
            id_col,
            F.when(F.col("_is_dup"), F.lit("exact_dup"))
            .when(F.col("contaminated"), F.lit("contaminated"))
            .when(~F.col("_q"), F.lit("low_quality"))
            .otherwise(F.lit("kept"))
            .alias("drop_reason"),
        )
    )


def snapshot_diff(old: DataFrame, new: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  group_col: str = "source") -> DataFrame:
    """Per-group content diff between two corpus SNAPSHOTS (crawl N vs
    crawl N+1): how much is new, how much disappeared, how much
    carried over — the first report an incremental ingest run produces,
    and the input to re-crawl budgeting. Compares distinct normalized
    content fingerprints, not ids, so a re-crawled unchanged page
    counts as kept and a moved page does not count twice.

    Scale shape: each snapshot reduces to a distinct (group, 16-byte
    fp) set first (map-side-combined agg — text never shuffles), the
    diff is one full-outer equi-join of the two id-scale sets, and the
    report is a group-key agg of presence flags. No step carries more
    than O(distinct contents) rows.

    Output: (group, n_old, n_new, n_added, n_removed, n_kept) where
    kept = fingerprint present in both snapshots.
    """
    from .text import content_fingerprint

    def fps(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(group_col),
            content_fingerprint(text_col).alias("_fp"),
        ).distinct()

    o = fps(old).withColumn("_in_old", F.lit(True))
    n = fps(new).withColumn("_in_new", F.lit(True))
    joined = o.join(n, [group_col, "_fp"], "full_outer").select(
        group_col,
        F.coalesce("_in_old", F.lit(False)).alias("_in_old"),
        F.coalesce("_in_new", F.lit(False)).alias("_in_new"),
    )
    return joined.groupBy(group_col).agg(
        F.sum(F.col("_in_old").cast("long")).cast("long").alias("n_old"),
        F.sum(F.col("_in_new").cast("long")).cast("long").alias("n_new"),
        F.sum((F.col("_in_new") & ~F.col("_in_old")).cast("long"))
        .cast("long").alias("n_added"),
        F.sum((F.col("_in_old") & ~F.col("_in_new")).cast("long"))
        .cast("long").alias("n_removed"),
        F.sum((F.col("_in_old") & F.col("_in_new")).cast("long"))
        .cast("long").alias("n_kept"),
    )

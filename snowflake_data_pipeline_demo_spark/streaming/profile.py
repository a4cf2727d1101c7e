"""Streaming corpus-profile state maintenance — the continuous-ingest
side of the cross-run mergeable sketch family (operators/text.py:
token_hll_shard_sketches / length_histogram_shard_sketches /
token_cms_shard_sketches).

The batch operators prove state persists and merges ACROSS runs; this
module keeps that state current CONTINUOUSLY: each micro-batch appends
its own fixed-size sketch rows (shard = batch id), so the corpus-wide
profile — distinct tokens, length quantiles, token frequencies — is
always one cheap merge over the state tables away, and no report ever
re-reads an earlier batch's text. At 100 TB this is the difference
between "profile = O(sketch rows) merge" and "profile = rescan the
corpus": the ingest pays O(its own batch) per trigger, forever.

Exactly-once under crash-replay by the pipe's contract
(streaming/pipeline.py): every write is batch-keyed
(``overwrite_subdir(batch=<id>)``) and the replay gate checks the
table written LAST, so a crash between the two writes replays both
(overwrite is idempotent) and a crash after both skips cleanly. The
decision plan reads nothing it writes — no checkpoint-before-overwrite
hazard here, unlike the dedup index (streaming/dedup.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_batch_fn(
    hll_table, hist_table, cms_table=None,
    group_col: str = "source", text_col: str = "text",
    gamma: float = 1.1, lg_config_k: int = 14,
    cms_depth: int = 4, cms_width: int = 1024,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` factory: per micro-batch, append the batch's
    HLL token sketches, log-bucketed length histograms, and (when
    ``cms_table`` is given) count-min counters — each keyed by
    shard = batch id. State per batch is fixed-size (groups x sketch
    bytes + groups x <=217 buckets + depth x width counters) no matter
    how many documents the trigger carried.

    Read the profile back with :func:`corpus_profile` — or any later
    BATCH run: the tables are exactly the shapes
    hll_merge_estimate / histogram_merge_quantiles / cms_lookup merge,
    so streaming-maintained and batch-run state interoperate.
    """
    from ..operators.text import (
        length_histogram_shard_sketches,
        token_cms_shard_sketches,
        token_hll_shard_sketches,
    )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sub = f"batch={batch_id}"
        last = cms_table if cms_table is not None else hist_table
        if last.subdir_committed(sub):
            return
        shard = F.lit(batch_id).cast("long")
        docs = batch_df.withColumn(
            "n_chars", F.length(F.col(text_col)).cast("long")
        )
        hll_table.overwrite_subdir(
            token_hll_shard_sketches(
                docs, shard, group_col=group_col, text_col=text_col,
                lg_config_k=lg_config_k,
            ),
            sub,
        )
        hist_table.overwrite_subdir(
            length_histogram_shard_sketches(
                docs, shard, group_col=group_col, gamma=gamma,
            ),
            sub,
        )
        if cms_table is not None:
            cms_table.overwrite_subdir(
                token_cms_shard_sketches(
                    docs, shard, text_col=text_col,
                    depth=cms_depth, width=cms_width,
                ),
                sub,
            )

    return fn


def corpus_profile(hll_table, hist_table, group_col: str = "source",
                   qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                   gamma: float = 1.1) -> DataFrame:
    """The always-current corpus profile from streaming-maintained (or
    batch-appended — same shapes) sketch state: per group, estimated
    distinct tokens, value count, and length quantiles. Cost is
    O(state rows); no document text is touched.

    Output: (group, est_tokens, n_values, p<q>... per qs).
    """
    from ..operators.text import hll_merge_estimate, histogram_merge_quantiles

    est = hll_merge_estimate(hll_table.read(), group_col=group_col)
    q = histogram_merge_quantiles(
        hist_table.read(), group_col=group_col, qs=qs, gamma=gamma
    )
    return q.join(F.broadcast(est), group_col)

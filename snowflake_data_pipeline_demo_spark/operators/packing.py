"""Sequence packing for training pipelines: lay the (ordered) token
stream of chunked documents end to end and cut fixed-length training
sequences — the "concat then split every L tokens" packing GPT-style
data loaders use.

The core primitive is a GLOBAL running prefix sum over a total order.
The naive Spark form — ``sum().over(Window.orderBy(...))`` with no
partition key — collapses to ONE partition (Spark even warns) and dies
at scale. The scale-correct shape used here:

1. ``repartitionByRange`` on the order columns (range exchange — the
   same movement a global sort pays, and the only full-data move);
2. per-partition running sums via a window keyed on
   ``spark_partition_id()`` (parallel, no further shuffle);
3. per-partition TOTALS (one tiny row per partition) collected to the
   driver, prefix-summed there, and joined back as broadcast offsets.

Step 3 moves #partitions rows — bytes — so the whole prefix sum costs
one range exchange plus a broadcast. Range boundaries are sampled and
therefore not deterministic, but the OUTPUT is: a row's global prefix
is invariant to where partition boundaries fall.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_offset(df: DataFrame, order_cols: Sequence[str],
                          value_col: str,
                          out_col: str = "offset") -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows strictly
    BEFORE this row in the total order defined by ``order_cols``
    (exclusive prefix sum). Ties in ``order_cols`` must not exist —
    the order must be total for the result to be well-defined."""
    order_cols = list(order_cols)
    # localCheckpoint BEFORE the totals collect: the ranged frame is
    # computed by two jobs (totals, output), and without pinning it the
    # range boundaries could be re-sampled differently per job — a row
    # near a boundary would take its _prefix from the wrong partition's
    # total. Checkpoint (not cache): materialized once by whichever job
    # runs first (the totals collect), lineage truncated after, and its
    # blocks are released when the result frame is dropped — a cache
    # here would stay pinned in the catalog until someone unpersists it,
    # accumulating storage across calls in a long-lived session.
    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    w = (
        Window.partitionBy("_pid").orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(
        "_local", F.sum(value_col).over(w) - F.col(value_col)
    )
    totals = {
        r["_pid"]: r["_tot"]
        for r in part.groupBy("_pid").agg(
            F.sum(value_col).alias("_tot")
        ).collect()
    }
    running, prefix = 0, {}
    for pid in sorted(totals):
        prefix[pid] = running
        running += totals[pid]
    spark = df.sparkSession
    pre = spark.createDataFrame(
        [(pid, int(off)) for pid, off in prefix.items()],
        "_pid int, _prefix long",
    )
    return (
        local.join(F.broadcast(pre), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_prefix")).cast("long"))
        .drop("_pid", "_local", "_prefix")
    )


def pack_sequences(chunks: DataFrame, seq_len: int = 64,
                   id_col: str = "doc_id", chunk_col: str = "chunk_id",
                   tokens_col: str = "n_chunk_tokens") -> DataFrame:
    """Assign every chunk its position in the packed token stream:
    ``pack_id`` = which fixed-length training sequence the chunk STARTS
    in, ``pack_offset`` = its start position within that sequence, and
    ``spans_packs`` = whether it straddles a sequence boundary (loaders
    split those at read time). Deterministic global order is
    (``id_col``, ``chunk_col``)."""
    offs = global_running_offset(
        chunks, [id_col, chunk_col], tokens_col, out_col="token_offset"
    )
    return offs.select(
        id_col, chunk_col, tokens_col, "token_offset",
        (F.col("token_offset") / seq_len).cast("long").alias("pack_id"),
        (F.col("token_offset") % seq_len).cast("long").alias("pack_offset"),
        (
            (F.col("token_offset") % seq_len) + F.col(tokens_col) > seq_len
        ).alias("spans_packs"),
    )


def shard_by_token_budget(df: DataFrame, budget: int = 4096,
                          id_col: str = "doc_id",
                          tokens_col: str | None = None,
                          text_col: str = "text") -> DataFrame:
    """Assign every document to a TOKEN-BALANCED output shard: lay docs
    end to end in ``id_col`` order and cut a new shard every ``budget``
    tokens — ``shard = floor(exclusive_prefix_tokens / budget)``. The
    training-data writer's sharding policy: shards carry ~equal token
    counts (not doc counts), so data-parallel readers get balanced
    work regardless of document-length skew.

    Output: (id, n_tokens, token_offset, shard). ``tokens_col=None``
    tokenizes ``text_col`` inline (scan-time projection).

    Scale shape: the global exclusive prefix sum is
    :func:`global_running_offset` — one range exchange plus a broadcast
    of per-partition totals; the shard id is then a narrow projection.
    A doc larger than ``budget`` still lands in exactly one shard (its
    start position decides), so shard token sums can exceed budget by
    at most one document — the standard writer tolerance.
    """
    from .text import token_count

    if tokens_col is None:
        base = df.select(
            F.col(id_col), token_count(text_col).alias("n_tokens")
        )
        tokens_col = "n_tokens"
    else:
        base = df.select(F.col(id_col), F.col(tokens_col))
    offs = global_running_offset(
        base, [id_col], tokens_col, out_col="token_offset"
    )
    raw = offs.select(
        id_col,
        F.col(tokens_col).cast("long").alias("n_tokens"),
        "token_offset",
        (F.col("token_offset") / budget).cast("long").alias("_raw_shard"),
    )
    # densify: a doc larger than budget would otherwise skip raw bucket
    # values, producing sparse shard=N directories (and any max(shard)+1
    # shard count overcounts). The rank window runs over the DISTINCT
    # bucket values — n_shards rows, bounded by total_tokens/budget, not
    # corpus rows — then broadcasts back onto the assignment.
    from pyspark.sql import Window

    buckets = raw.select("_raw_shard").distinct()
    dense = buckets.withColumn(
        "shard",
        (F.row_number().over(Window.orderBy("_raw_shard")) - 1).cast("long"),
    )
    return raw.join(F.broadcast(dense), "_raw_shard").drop("_raw_shard")


def write_token_balanced_shards(df: DataFrame, path: str,
                                budget: int = 4096,
                                id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """Write ``df`` as parquet partitioned by token-balanced shard:
    one directory (shard=N) per ~``budget`` tokens of text, each fed by
    exactly one task. Returns the shard assignment frame (id -> shard)
    for the manifest the caller keeps.

    Plan shape: the assignment join is an id-key exchange;
    ``repartition(shard)`` then co-locates each shard in one task so
    ``partitionBy`` emits ONE file per shard directory instead of
    #tasks files — the small-files guard a 100 TB writer needs.
    """
    assign = shard_by_token_budget(
        df, budget=budget, id_col=id_col, text_col=text_col
    ).select(id_col, "shard")
    (
        df.join(assign, id_col)
        .repartition(F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return assign


def pack_boundaries(packed: DataFrame) -> DataFrame:
    """Loader-side packing artifact: per training sequence, the sorted
    list of chunk-START offsets inside it — what an attention-mask /
    document-boundary builder consumes so packed neighbors don't attend
    across documents. Input is :func:`pack_sequences` output.

    Output: (pack_id, n_chunks, boundaries array<long> ascending,
    n_tokens = tokens STARTING in this pack).

    Scale shape: one pack-key hash agg; the boundary array is sorted
    inside the aggregate (array_sort over collected offsets), never a
    second window pass. Packs hold O(seq_len) chunk starts, so rows
    stay bounded regardless of corpus size.
    """
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.array_sort(
                F.collect_list(F.col("pack_offset").cast("long"))
            ).alias("boundaries"),
            F.sum("n_chunk_tokens").cast("long").alias("n_tokens"),
        )
    )

"""Document chunking for training pipelines: split long documents into
fixed token windows with overlap (stride), producing the chunk table a
tokenizer/packing stage consumes.

Scale shape: pure per-row projection — tokenize once, explode the
chunk-start sequence, slice the token array. No shuffle, no Python;
chunk count per doc is ceil(n/stride), so output volume is bounded by
``window/stride`` × input tokens. At 100 TB this runs at scan speed and
the chunk table partitions however the write chooses (typically by
source/date, inherited from the input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_by_tokens(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 32,
                    stride: int = 24) -> DataFrame:
    """One output row per (doc, chunk): chunk i covers tokens
    ``[i*stride, i*stride + window)``; starts advance by ``stride`` while
    ``i*stride < n_tokens``, so consecutive chunks overlap by
    ``window - stride`` tokens and the tail chunk may be short. Empty
    docs produce no chunks.

    Output: ``(id_col, chunk_id, n_chunk_tokens, chunk_text)``.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = df.select(F.col(id_col), tokens(text_col).alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    n_chunks = F.floor((F.col("_n") - 1) / stride) + 1
    return (
        toks.filter(F.col("_n") > 0)
        .select(
            F.col(id_col), F.col("_t"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, window)
            .alias("_chunk"),
        )
        .select(
            id_col, "chunk_id",
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def truncate_chars(df: DataFrame, budget: int = 200,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Character-budget document truncation at a whitespace boundary:
    docs at or under budget pass through byte-identical; longer docs
    are cut at ``budget`` chars, and the trailing non-whitespace run
    is dropped ONLY when the cut landed mid-token (the character after
    the cut is non-whitespace) — a token ending exactly at the budget
    survives. Output is right-trimmed, never ends mid-token, and is
    always a prefix of the original in ORIGINAL characters (unlike
    token-window chunking, which normalizes). A doc whose first token
    alone exceeds the budget truncates to '' (documented contract —
    the curation funnel's min-length gate catches those).

    Whitespace = ASCII ``\\s`` on both engines. Both the tail-drop
    (``\\S*\\z``) and the final trim (``\\s+\\z``) anchor with ``\\z``,
    NOT ``$``: Java's ``$`` also matches BEFORE a final line
    terminator (so ``\\S*$`` on a prefix ending in ``\\n`` deletes the
    complete last token) while RE2's ``$`` is end-of-text only —
    ``\\z`` means end-of-input in both engines. The trim handles every
    whitespace class (``rtrim`` strips spaces only), so output never
    carries trailing tabs/newlines and whitespace-only cuts become ''.

    Shape: pure per-row projection — no shuffle, no UDF; at 100 TB
    this rides whatever scan already touches the text.

    Output: (id, n_chars_in, n_chars_out, was_truncated, fp_out) —
    fp_out is md5 of the output text (the lane compares fingerprints,
    not multi-KB strings).
    """
    t = F.col(text_col)
    prefix = F.substring(t, 1, budget)
    mid_token = F.substring(t, budget + 1, 1).rlike(r"\S")
    cut = F.regexp_replace(
        F.when(mid_token, F.regexp_replace(prefix, r"\S*\z", ""))
        .otherwise(prefix),
        r"\s+\z", "",
    )
    out = F.when(F.length(t) <= budget, t).otherwise(cut)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars_in"),
        F.length(out).cast("long").alias("n_chars_out"),
        (F.length(t) > budget).alias("was_truncated"),
        F.md5(out).alias("fp_out"),
    )

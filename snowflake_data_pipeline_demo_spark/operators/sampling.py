"""Deterministic sampling / splitting for training-data pipelines.

Splits must be (a) stable across runs and cluster layouts — no
`rand()`, which reshuffles rows between retries and breaks exactly-once
reprocessing — and (b) computable without coordination. Both come from
hashing the row's stable id: a narrow per-row projection, no shuffle,
no state, identical on every engine that has md5 (so the DuckDB oracle
reproduces the split bit-for-bit; same portability rule as the dedup
operators).

At 100 TB the split column is computed at scan time and pushed into
partition pruning (`write.partitionBy("split")`) so downstream trainers
read only their slice.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def hash_bucket(id_col: Column | str, buckets: int = 100,
                hex_digits: int = 4) -> Column:
    """Uniform bucket in [0, buckets) from the first ``hex_digits`` hex
    digits of md5(id) — 16 bits is plenty for percent-level splits;
    feature-hashing callers (text.hashed_token_bucket) widen to 8. The
    digit count must stay <= 15 so the value fits any engine's int64
    (oracle portability)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, hex_digits), 16, 10)
        .cast("long") % buckets
    )


def split_label(id_col: Column | str, train_pct: int = 80,
                val_pct: int = 10) -> Column:
    """'train' / 'val' / 'test' label from the id hash (80/10/10 by
    default). Disjoint and exhaustive by construction."""
    b = hash_bucket(id_col)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — stable under retries
    and incremental reruns (a row's fate never changes), unlike
    `df.sample`, which is seed- and partitioning-dependent."""
    # round, don't truncate: float rates like 0.29 are binary-inexact
    # (0.29*10000 = 2899.99...), and int() would silently drop one
    # whole bucket from the sample forever
    return df.filter(hash_bucket(id_col, 10_000) < round(fraction * 10_000))


def weighted_mixture(df: DataFrame, rates: dict[str, float],
                     source_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Curriculum / mixture sampling: keep each row with its SOURCE's
    rate (sources absent from ``rates`` are dropped — an explicit
    mixture spec, not a passthrough). Same deterministic id-hash gate
    as :func:`deterministic_sample`, so the mixture is stable under
    retries and re-runs and needs no shuffle — the filter evaluates at
    scan time and composes with partition pruning when the corpus is
    written partitioned by source."""
    b = hash_bucket(id_col, 10_000)
    gate = F.lit(False)
    for src, rate in sorted(rates.items()):
        gate = gate | (
            (F.col(source_col) == src) & (b < round(rate * 10_000))
        )
    return df.filter(gate)


def group_quota_topk(df: DataFrame, group_col: str = "source",
                     rank_col: str = "n_chars", k: int = 10,
                     id_col: str = "doc_id",
                     salt_buckets: int = 16,
                     mode: str = "naive",
                     salt_threshold_rows: int = 32_000_000) -> DataFrame:
    """Per-group quota sampling: keep the top ``k`` rows of every group
    ordered by (``rank_col`` DESC, ``id_col`` ASC) — the domain-cap
    curation gate (a hot domain contributes at most k documents, ranked
    by quality/length). Output: input columns + ``quota_rank`` (1..k).

    ``mode`` picks the physical form:

    - ``"naive"`` (default): one row_number window over
      partitionBy(group). On Spark >= 3.5 this is NOT the textbook
      straggler: InferWindowGroupLimit rewrites the rank-filter
      pattern into WindowGroupLimit(Partial) before the shuffle and
      (Final) after, so each map partition forwards at most k rows
      per group and the hot reducer receives <= k * num_map_partitions
      rows regardless of group size. Measured (r11,
      scripts/window_spill_run.py, 95%-hot key, 16g heap): flat and
      spill-free to 1B rows, 10-12x faster than the rewrite-disabled
      single-task shape at 32-128M rows. The default is LAZY — no
      estimate pass runs at call time.
    - ``"salted"``: explicit two-phase — phase 1 ranks within (group,
      hash(id) % salt_buckets) and keeps k per salt; phase 2 re-ranks
      the <= salt_buckets*k survivors per group. Correct because a
      group's global top-k is contained in the union of its per-salt
      top-ks. The portability arm for engines WITHOUT the group-limit
      rewrite (Spark < 3.5, or spark.sql.optimizer.
      windowGroupLimitThreshold=-1), where the naive window really
      does put the whole hot group on one reducer's sorter.
    - ``"auto"``: estimate the hottest group's row count with one
      map-side-combinable aggregation (decomposable — the estimate
      itself cannot skew) and dispatch on it against
      ``salt_threshold_rows``. Only meaningful on rewrite-less
      engines; on this engine the naive arm wins at every measured
      size, so auto is opt-in, not the default (it also makes the
      builder EAGER — the estimate executes one extra pass over
      ``df.select(group_col)`` at call time; cache computed inputs
      first, r10 review).

    All forms return identical values (the DuckDB oracle runs the
    naive form; tests/test_properties.py pins multiset equality).
    """
    from pyspark.sql import Window

    if mode not in ("auto", "naive", "salted"):
        raise ValueError(f"unknown mode: {mode}")
    if mode == "auto":
        # Threshold provenance, remeasured r11 at the actual bind
        # point (scripts/window_spill_run.py; r10 verdict ask #4):
        # with the group-limit rewrite DISABLED (the legacy shape this
        # dispatch exists for), the single reducer task owning a 16g
        # heap's whole execution pool sorts a 60.8M-row hot group
        # without spilling and SPILLS at 121.6M (1.4 GB to disk,
        # 356 s wall); the wall cost is ~70 s at 30M hot rows under
        # this round's host conditions. A cluster executor sharing
        # its pool across several task slots binds proportionally
        # earlier, so 32M is a conservative memory crossover for the
        # legacy shape — and on engines WITH the rewrite the naive
        # arm never loses, so crossing the threshold merely trades a
        # never-spilling plan for an equivalent two-phase one.
        hot = (
            # select(group_col) first: makes the column pruning the
            # estimate depends on explicit rather than inferred
            df.select(group_col).groupBy(group_col).count()
            .agg(F.max("count").alias("m")).first()["m"]
        )
        mode = "salted" if (hot or 0) > salt_threshold_rows else "naive"
        # The eager pass is otherwise invisible to callers who relied
        # on builder laziness (r10 ADVICE) — make it observable.
        _LOG.info(
            "group_quota_topk auto-dispatch: hottest %s group ~%s rows "
            "(threshold %s) -> %s window", group_col, hot,
            salt_threshold_rows, mode,
        )
    w2 = Window.partitionBy(group_col).orderBy(
        F.desc(rank_col), F.asc(id_col)
    )
    if mode == "naive":
        return (
            df.withColumn(
                "quota_rank", F.row_number().over(w2).cast("long")
            )
            .filter(F.col("quota_rank") <= k)
        )
    salt = hash_bucket(id_col, salt_buckets)
    w1 = (
        Window.partitionBy(F.col(group_col), salt)
        .orderBy(F.desc(rank_col), F.asc(id_col))
    )
    survivors = (
        df.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1")
    )
    return (
        survivors.withColumn(
            "quota_rank", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("quota_rank") <= k)
    )


def deterministic_global_shuffle(df: DataFrame,
                                 id_col: str = "doc_id") -> DataFrame:
    """Assign every row its position in a DETERMINISTIC global shuffle:
    ``shuffle_key = md5(id)`` defines a pseudo-random total order
    (ties impossible — md5 of distinct ids collides only
    astronomically, and ``id_col`` breaks even those), and
    ``shuffle_rank`` is the row's 0-based position in it. The "shuffle
    the corpus before training" step, reproducible across runs,
    retries, and cluster layouts — unlike ``orderBy(rand())``.

    Output: (id, shuffle_key, shuffle_rank).

    Scale shape: the rank is the two-phase global prefix sum over a
    constant 1 (packing.global_running_offset) — one range exchange on
    the hash key (uniform by construction: no skew, no hot range) plus
    a broadcast of per-partition counts. A writer that wants shuffled
    SHARDS rather than ranks skips the prefix sum entirely:
    repartitionByRange(shuffle_key) + sortWithinPartitions is the same
    exchange without the offset join.
    """
    from .packing import global_running_offset

    keyed = df.select(
        F.col(id_col),
        F.md5(F.col(id_col).cast("string")).alias("shuffle_key"),
        F.lit(1).alias("_one"),
    )
    return global_running_offset(
        keyed, ["shuffle_key", id_col], "_one", out_col="shuffle_rank"
    ).select(id_col, "shuffle_key", "shuffle_rank")


def _per_source_tokens(df: DataFrame, source_col: str,
                       text_col: str) -> DataFrame:
    """Shared per-source token accounting for the mixture solvers —
    ONE definition so :func:`mixture_budget` and
    :func:`temperature_weights` can never drift apart on what a
    'token' is. Map-side-combined source-key agg; output
    (source, tokens long)."""
    from .text import token_count

    return (
        df.select(F.col(source_col), token_count(text_col).alias("_n"))
        .groupBy(source_col)
        .agg(F.sum("_n").cast("long").alias("tokens"))
    )


def mixture_budget(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Solve the mixture budget: given target mixture ``weights`` (per
    source, summing to 1) and the corpus's actual per-source token
    counts, compute the LARGEST total token budget achievable without
    oversampling any source (``n_star = min over s of tokens_s /
    w_s``), and each source's take and sampling rate under it — the
    numbers :func:`weighted_mixture` is then run with.

    Output: (source, tokens, weight, take_tokens, rate 4dp) — one row
    per WEIGHT entry. Corpus sources absent from ``weights`` are
    excluded (explicit spec, like weighted_mixture); a weight entry
    whose source is absent from the corpus appears with tokens=0 and
    BINDS THE BUDGET TO ZERO — the spec demands tokens from a source
    that has none, and silently dropping it would report an
    unachievable budget as achievable.

    Scale shape: one source-key token agg over the corpus (map-side
    combined), a broadcast join against the literal weight table, and
    a one-row broadcast min — the whole solve is lazy and
    source-count-sized after the first agg.
    """
    # a zero/negative weight has no meaning in the solve (tokens_s /
    # w_s) and would throw DIVIDE_BY_ZERO under ANSI mode mid-job —
    # reject it at call time, driver-side, with a message
    bad = {s: w for s, w in weights.items() if not w > 0}
    if bad:
        raise ValueError(f"mixture weights must be positive: {bad}")

    spark = df.sparkSession
    per = _per_source_tokens(df, source_col, text_col)
    wtab = spark.createDataFrame(
        sorted(weights.items()), f"{source_col} string, weight double"
    )
    capped = wtab.join(per, source_col, "left").select(
        source_col,
        F.coalesce("tokens", F.lit(0).cast("long")).alias("tokens"),
        "weight",
        (
            F.coalesce("tokens", F.lit(0).cast("long")) / F.col("weight")
        ).alias("_cap"),
    )
    n_star = capped.agg(F.min("_cap").alias("_n_star"))
    return capped.join(F.broadcast(n_star)).select(
        source_col, "tokens", "weight",
        F.floor(F.col("weight") * F.col("_n_star")).cast("long")
        .alias("take_tokens"),
        F.when(
            F.col("tokens") > 0,
            F.round(
                F.floor(F.col("weight") * F.col("_n_star"))
                / F.col("tokens"), 4
            ),
        ).otherwise(F.lit(0.0)).alias("rate"),
    )


def temperature_weights(df: DataFrame, alpha: float = 0.7,
                        source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Temperature-based mixture weights: w_s ∝ tokens_s^alpha,
    normalized to sum to 1 — the standard multi-source/multilingual
    mixing rule (alpha=1 is proportional sampling, alpha=0 uniform;
    public precedent: multilingual LM sampling à la mBERT/XLM-R and
    the UL2/PaLM data mixtures). The output feeds
    :func:`mixture_budget` / :func:`weighted_mixture` directly.

    Output: (source, tokens, raw = tokens^alpha 4dp, weight 4dp) —
    sorted consumers should read ``weight``. Degenerate corpus (a
    source with zero tokens) gets raw 0 and weight 0 rather than an
    ANSI pow/div error; an entirely empty corpus yields zero rows.

    Scale shape: one source-key token agg over the corpus (map-side
    combined), then a one-row broadcast total — the whole solve stays
    lazy and source-count-sized after the first agg, exactly like
    mixture_budget.
    """
    per = _per_source_tokens(df, source_col, text_col)
    raw = per.select(
        source_col, "tokens",
        F.when(
            F.col("tokens") > 0, F.pow(F.col("tokens").cast("double"), alpha)
        ).otherwise(F.lit(0.0)).alias("_raw"),
    )
    total = raw.agg(F.sum("_raw").alias("_tot"))
    return raw.join(F.broadcast(total)).select(
        source_col, "tokens",
        F.round("_raw", 4).alias("raw"),
        F.coalesce(
            F.when(F.col("_tot") > 0,
                   F.round(F.col("_raw") / F.col("_tot"), 4)),
            F.lit(0.0),
        ).alias("weight"),
    )


def gumbel_topk_resample(scored: DataFrame, k: int = 50,
                         id_col: str = "doc_id",
                         logweight_col: str = "importance") -> DataFrame:
    """Gumbel top-k importance resampling — the SELECTION step of DSIR
    (Xie et al. 2023): drawing k documents without replacement with
    probability proportional to exp(log-weight) is exactly taking the
    top k by ``log_weight + Gumbel(0,1)`` (the Gumbel-top-k trick,
    Vieira 2014). The noise is DETERMINISTIC — u = md5-uniform of the
    doc id in the portable hash family, g = -ln(-ln(u)) — so the draw
    is reproducible, cross-engine replayable, and stable across reruns
    (the same property every sampler in this module has; a fresh draw
    is a salt away).

    Here ``logweight_col`` is dsir_importance's MEAN per-token LLR —
    the length-normalized variant; pass a sum-scaled column for the
    paper's raw-weight behavior.

    Hash-gate care: the perturbed key rounds to 6 dp and ties break on
    id, so engine ulp differences in ln can never flip the cut.

    Scale shape: a per-row projection plus one distributed top-k
    (TakeOrderedAndProject) — no shuffle beyond the k-row collect per
    partition.

    Output: scored's columns + ``gumbel_key``, the k selected rows.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("g:"), F.col(id_col).cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("double")
    u = (h + 1.0) / float((1 << 60) + 1)
    key = F.round(
        F.col(logweight_col) + (-F.log(-F.log(u))), 6
    ).alias("gumbel_key")
    return (
        scored.select("*", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
    )

"""Skew-mitigation join/aggregation helpers (salting).

AQE's runtime skew-join splitting (on by default in session.py) is the
first line of defense and needs no code. Salting is for the cases AQE
can't fix: a shuffle HASH join where one key holds a large share of
the fact rows (AQE splits sort-merge partitions, but a single hot key
still lands on one reducer for the build of hash aggregates), or a
groupBy whose hot key serializes one reducer.

Mechanics: the fact side gets a per-row salt in [0, buckets); the dim
side is exploded ``buckets`` times, so (key, salt) joins reconstruct
exactly the original matches while the hot key spreads over ``buckets``
reducers. Costs dim x buckets rows — use for mid-size dims that are
too big to broadcast; never needed for broadcast joins (no shuffle to
skew). Aggregations use the same idea as partial-then-final two-phase.

Measured under a planted 95%-hot key (32M rows, local[32],
scripts/skew_scale_run.py; SCALE.md round-9): the naive shuffle join
straggles at 14.4 s with 31 cores idle, AQE's skew split halves it
(8.8 s), :func:`salted_join` flattens it (3.4 s). The same run scopes
:func:`salted_groupby_agg` honestly: for DECOMPOSABLE aggregates
(count/sum/min/max — everything this helper accepts) Spark's map-side
partial aggregation already collapses the hot key to one row per map
task, so salting was a wash at every skew level measured; it exists
for aggregation STATE that cannot collapse map-side (wide collect-
like states) and as the AQE-off fallback.

The salt is ``pmod(xxhash64(unique_col), buckets)`` — deterministic per
row (stable under retries, like everything else in the engine), uniform
across rows of the same hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, unique_col: str | Column,
              buckets: int = 16) -> DataFrame:
    """Add a deterministic per-row salt column in [0, buckets)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(c), F.lit(buckets)))


def explode_salt(df: DataFrame, buckets: int = 16) -> DataFrame:
    """Replicate every row once per salt value (the dim side)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
    )


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str],
                fact_unique_col: str, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on ``on`` with the hot-key shuffle
    spread over ``buckets`` reducers. Semantically identical to
    ``fact.join(dim, on, how)`` for inner/left joins (each fact row
    meets each matching dim row exactly once, at its own salt)."""
    f = with_salt(fact, fact_unique_col, buckets)
    d = explode_salt(dim, buckets)
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)


def salted_groupby_agg(df: DataFrame, keys: list[str],
                       unique_col: str, aggs: dict[str, str],
                       buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable aggregates
    (count/sum/min/max): partial agg on (keys, salt) — the hot key
    spreads over ``buckets`` reducers — then final agg on keys over
    ``buckets`` partial rows per key.

    ``aggs`` maps output column -> 'count(col)' | 'sum(col)' |
    'min(col)' | 'max(col)'."""
    _RE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        fn = fn.strip().lower()
        col = col.rstrip(")").strip()
        if fn not in _RE:
            raise ValueError(f"non-decomposable aggregate: {spec}")
        partial_exprs.append(F.expr(f"{fn}({col})").alias(out))
        final_exprs.append(F.expr(f"{_RE[fn]}({out})").alias(out))
    partial = (
        with_salt(df, unique_col, buckets)
        .groupBy(*keys, SALT_COL)
        .agg(*partial_exprs)
    )
    return partial.groupBy(*keys).agg(*final_exprs)

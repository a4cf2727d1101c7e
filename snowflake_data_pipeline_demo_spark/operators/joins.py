"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join.

Neither appears in the reference (SURVEY §2.3 J9 — explicitly "not
present"), but both are core training-data/feature-pipeline operators,
so they ship as first-class engine operators with DuckDB oracles
(DuckDB has native ``ASOF JOIN``; the range join is a plain inequality
join there).

Design for 100 TB:

- **as-of join** is NOT a broadcast-nested-loop inequality join (the
  naive translation, quadratic per key). It is a union-merge: tag both
  sides, one shuffle on the equi-key, one sort by (ts, tag), and a
  running ``last(value, ignorenulls)`` window carries the most recent
  right-side row forward onto every left row. Cost = one exchange +
  one sort over rows that each move exactly once — the same shape as a
  sort-merge join, and AQE skew-splitting applies to hot keys.

- **range join** avoids the cross product by bucketing time: intervals
  explode to the (few) fixed-width buckets they overlap, points land
  in exactly one bucket, and the join is EQUI on (key, bucket) with a
  residual between-filter. Each point matches each interval in at most
  one bucket (buckets partition the time axis), so no post-join dedup
  is needed. Bucket width tunes the explode factor vs join selectivity
  trade; AQE handles residual bucket skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              ts_col: str = "ts", right_cols: Sequence[str] = (),
              tolerance_seconds: int | None = None,
              suffix: str = "_asof",
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the nearest right row on the same
    ``keys``: ``direction="backward"`` (default) = latest right with
    ``right.ts <= left.ts``; ``"forward"`` = earliest right with
    ``right.ts >= left.ts`` (both inclusive — the pandas ``merge_asof``
    contract).

    Appends, for each name in ``right_cols``, a column ``name+suffix``
    (null when no matching right row exists), plus ``ts_col+suffix``
    (the matched right timestamp). With ``tolerance_seconds``, matches
    farther than the tolerance are nulled out — the standard as-of
    staleness bound.

    Determinism caveat: if several RIGHT rows share the same
    (keys, ts), which of them wins is partition-order-dependent —
    pre-aggregate the right side to unique (keys, ts) when that
    matters (pandas merge_asof has the same ambiguity).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    keys = list(keys)
    right_cols = [c for c in right_cols if c not in keys and c != ts_col]
    lpay = [c for c in left.columns if c not in keys and c != ts_col]
    # a null right timestamp would sort nulls-first in the ascending
    # window and get carried as a phantom match (value without ts,
    # invisible to the tolerance check) — there is no "as of null"
    right = right.filter(F.col(ts_col).isNotNull())

    # union-tag: right rows sort BEFORE left rows on timestamp ties, so
    # a right row at exactly left.ts is visible (inclusive as-of).
    l = left.select(
        *keys, F.col(ts_col), F.lit(1).alias("_tag"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r = right.select(
        *keys, F.col(ts_col), F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    # backward walks time ascending (carry the last prior right row
    # forward); forward walks descending (carry the next future right
    # row back). Right rows sort before left on timestamp ties either
    # way, which is what makes both directions inclusive.
    order = (
        [F.col(ts_col).asc(), F.col("_tag").asc()]
        if direction == "backward"
        else [F.col(ts_col).desc(), F.col("_tag").asc()]
    )
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *keys, ts_col, "_tag", *lpay,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in right_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_seconds is not None:
        # microsecond-precision gap: cast('long') truncates to whole
        # seconds, which lets matches up to ~1s past the tolerance
        # boundary slip through on micro-precision timestamps
        gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(
            F.col(f"{ts_col}{suffix}")
        )
        stale = (
            gap if direction == "backward" else -gap
        ) > tolerance_seconds * 1_000_000
        for c in [*right_cols, ts_col]:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
    return out


def range_interval_join(intervals: DataFrame, points: DataFrame,
                        keys: Sequence[str], start_col: str = "start",
                        end_col: str = "end", point_ts: str = "ts",
                        bucket_seconds: int = 300) -> DataFrame:
    """Inner-join every point to every interval of the same ``keys``
    with ``start <= point_ts <= end`` — via time-bucket equi-join, not
    a nested-loop inequality join (module docstring).

    Returns interval columns + the point columns (point ``ts`` kept).
    Non-key column names must not collide between the two inputs
    (rename before joining — the output keeps both sides' columns).
    Interval [start, end] explodes to ``floor(end/b) - floor(start/b)
    + 1`` bucket rows; keep ``bucket_seconds`` within ~an order of
    magnitude of typical interval length so the explode factor stays
    small.
    """
    keys = list(keys)
    b = F.lit(bucket_seconds)
    # explicit aliases: both sides may derive from the same source
    # DataFrame (a self range-join), which otherwise makes every shared
    # column ambiguous
    ivl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("long") / b).cast("long"),
                (F.col(end_col).cast("long") / b).cast("long"),
            )
        ),
    ).alias("_ivl")
    pts = points.withColumn(
        "_bucket", (F.col(point_ts).cast("long") / b).cast("long")
    ).alias("_pts")
    cond = [
        F.col(f"_ivl.{k}") == F.col(f"_pts.{k}") for k in keys
    ] + [F.col("_ivl._bucket") == F.col("_pts._bucket")]
    joined = ivl.join(pts, cond).filter(
        F.col(f"_pts.{point_ts}").between(
            F.col(f"_ivl.{start_col}"), F.col(f"_ivl.{end_col}")
        )
    )
    ivl_cols = [F.col(f"_ivl.{c}") for c in intervals.columns]
    pt_cols = [F.col(f"_pts.{c}") for c in points.columns if c not in keys]
    return joined.select(*ivl_cols, *pt_cols)

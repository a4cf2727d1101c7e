"""Streaming observability: per-micro-batch ingest metrics from a
StreamingQuery's progress stream — the rate / latency / watermark-lag
surface an ops dashboard plots next to ``pipe_status`` (T7) and the
history ledgers (T8/T9).

Spark already computes all of this per micro-batch
(StreamingQueryProgress); this module just lifts the driver-side JSON
into a queryable DataFrame. Scale: progress objects are one small dict
per batch held on the driver (bounded by
``spark.sql.streaming.numRecentProgressUpdates``, default 100) — no
executor work at all; persist the frame into a ledger table if history
beyond the buffer is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: one row per micro-batch
STREAM_METRICS_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType()),
    T.StructField("ts", T.StringType()),                # progress timestamp (ISO)
    T.StructField("num_input_rows", T.LongType()),
    T.StructField("input_rows_per_second", T.DoubleType()),
    T.StructField("processed_rows_per_second", T.DoubleType()),
    T.StructField("batch_duration_ms", T.LongType()),
    T.StructField("watermark", T.StringType()),         # ISO or null
    T.StructField("state_rows", T.LongType()),          # total keyed state rows
])


def stream_metrics(spark: SparkSession, query) -> DataFrame:
    """Lift ``query.recentProgress`` into a DataFrame (one row per
    micro-batch, newest last). Accepts any pyspark
    ``StreamingQuery``."""
    rows = []
    for p in query.recentProgress:
        dur = p.get("durationMs") or {}
        ev = p.get("eventTime") or {}
        state = p.get("stateOperators") or []
        rows.append((
            int(p["batchId"]),
            p.get("timestamp"),
            int(p.get("numInputRows") or 0),
            float(p.get("inputRowsPerSecond") or 0.0),
            float(p.get("processedRowsPerSecond") or 0.0),
            int(dur.get("triggerExecution") or 0),
            ev.get("watermark"),
            int(sum(int(s.get("numRowsTotal") or 0) for s in state)),
        ))
    return spark.createDataFrame(rows, STREAM_METRICS_SCHEMA)


def watermark_lag_seconds(metrics: DataFrame) -> DataFrame:
    """Append ``watermark_lag_s`` = progress wall-clock minus the event
    watermark, per batch — the "how far behind real time is the
    stream" number alerting keys on. Null when the query has no
    watermark (stateless sinks) AND on a watermarked query's early
    batches, where Spark reports the epoch sentinel
    ``1970-01-01T00:00:00.000Z`` before the first event advances it —
    treating that as a real watermark would read as a ~1.7e9-second lag
    and fire any alert keyed on this column."""
    wm = F.to_timestamp("watermark")
    return metrics.withColumn(
        "watermark_lag_s",
        F.when(
            F.col("watermark").isNotNull()
            & (wm > F.to_timestamp(F.lit("1970-01-01T00:00:00Z"))),
            (
                F.unix_micros(F.to_timestamp("ts"))
                - F.unix_micros(wm)
            ) / 1_000_000.0,
        ),
    )

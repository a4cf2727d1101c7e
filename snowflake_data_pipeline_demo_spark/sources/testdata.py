"""Loaders for the driver-generated testdata (TESTDATA.md).

These are the engine's operator-correctness inputs: TPC-H-ish star schema
plus `events` (JSON props column — the trips_raw analog), `documents`
(text analysis / dedup) and `embeddings` (similarity search).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: fact-scale threshold for the scan-parallelism adaptation below;
#: dim tables (region/nation/supplier/...) stay un-shuffled — their
#: plan is broadcast, not partitioned compute.
_REPARTITION_MIN_BYTES = 512 * 1024


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    Fact-scale tables are repartitioned to ``defaultParallelism`` right
    after the scan: every testdata parquet file is a SINGLE row group,
    so the scan is one task no matter how split configs are set, and
    all narrow per-row compute (shingling, signatures, text stats,
    histograms) would otherwise run on one core of 32. A real 100 TB
    stage arrives as thousands of files whose natural split count
    saturates the cluster — this exchange is purely the small-file
    local adaptation, and it moves each row once, before any
    compute-heavy projection."""
    # events.parquet carries parquet TIMESTAMP(NANOS), which Spark rejects
    # unless this legacy conf is on. It is runtime-settable, and the driver
    # hands us an externally built session that lacks it — set it here so
    # loads work regardless of how the session was constructed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    # events.ts arrives either as parquet TIMESTAMP(NANOS) — read as long
    # (ns since epoch) under spark.sql.legacy.parquet.nanosAsLong — or,
    # in newer testdata drops, as micros-precision TIMESTAMP_NTZ.
    # Normalize both to the session (UTC) TIMESTAMP type so downstream
    # epoch arithmetic (sessionize, window rollup) sees one type.
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            # integer div — double division would lose ulp precision on
            # epoch-nanos magnitudes and skew timestamps by ±1us.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        fact_scale = os.path.getsize(path) >= _REPARTITION_MIN_BYTES
    except OSError:
        fact_scale = False
    if fact_scale:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Register each parquet table as a temp view (mirrors the DuckDB
    oracle's pre-registered views, __spark_entry__.py docstring)."""
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)

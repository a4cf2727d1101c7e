"""CDC streams (SURVEY §2.9 T2/T3).

Reference: ``CREATE STREAM new_trips ON TABLE raw.trips_raw`` x3
(dp_demo.sql:57-59) — each stream is an independent CDC bookmark on the
same table; inserts are delivered to every stream; a DML that selects
from the stream advances its offset transactionally
(dp_setup.sql:179-182).

Spark-native: one ``readStream`` per consumer over the raw table's
directory (parquet file source), each with its **own checkpoint dir**
— the checkpoint IS the stream offset. Offsets commit only when the
micro-batch (the consumer's foreachBatch DML) succeeds: exactly the
reference's consumed-by-DML semantics (T3). The workload is
insert-only (§1.5), so file-arrival CDC is complete CDC.

SURVEY §7.3 hard part: sharing one checkpoint between consumers would
silently drop data for all but one — the Stream class binds checkpoint
to consumer name so it cannot happen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Table


class TableStream:
    """A named, independently-bookmarked change stream on a table."""

    def __init__(self, spark: SparkSession, name: str, table: Table,
                 checkpoint_root: str):
        self.spark = spark
        self.name = name
        self.table = table
        # one checkpoint per consumer: the per-stream offset (T2)
        self.checkpoint_dir = f"{checkpoint_root.rstrip('/')}/{name}"

    def read(self) -> DataFrame:
        """The stream's un-consumed changes as a streaming DataFrame.
        All reference streams are insert-only, so every row is
        metadata$action='INSERT' (column provided for parity)."""
        return (
            self.spark.readStream.schema(self.table.schema)
            .parquet(self.table.path)
            .withColumn("metadata$action", F.lit("INSERT"))
        )

    def backlog_count(self) -> int:
        """``select count(*) from stream`` (dp_demo.sql:154-158): rows
        not yet consumed = table rows minus rows in files the checkpoint
        has committed. Computed by replaying the file-source log."""
        import json
        import os
        import re

        def norm(p: str) -> str:
            # file:///x, file:/x, /x -> /x
            return re.sub(r"^file:/+", "/", p)

        seen: set[str] = set()
        src = os.path.join(self.checkpoint_dir, "sources", "0")
        if os.path.isdir(src):
            for fn in sorted(os.listdir(src)):
                p = os.path.join(src, fn)
                if not os.path.isfile(p) or fn.startswith("."):
                    continue
                with open(p) as fh:
                    for line in fh:
                        line = line.strip()
                        if not line or line.startswith("v"):
                            continue
                        try:
                            entry = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        path = entry.get("path", "")
                        if path:
                            seen.add(norm(path))
        total = self.table.read().count()
        if not seen:
            return total
        consumed = (
            self.table.read()
            .withColumn(
                "__f", F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
            )
            .filter(F.col("__f").isin(list(seen)))
            .count()
        )
        return total - consumed

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

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Table


def last_committed_batch(checkpoint_dir: str) -> int | None:
    """Highest batch id present in a streaming checkpoint's ``commits/``
    log — the transactional consumption frontier. Offsets under
    ``sources/0`` are written at micro-batch START, so a batch that is
    in flight (or failed and will retry) appears there but NOT in
    commits; anything trusting the offset log alone over-counts."""
    commits = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(commits):
        return None
    ids = [int(fn) for fn in os.listdir(commits) if fn.isdigit()]
    return max(ids) if ids else None


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
            # raw-table rows land in idempotent batch_N subdirs
            # (catalog.Table.overwrite_subdir) — discover them too
            .option("recursiveFileLookup", "true")
            .parquet(self.table.path)
            .withColumn("metadata$action", F.lit("INSERT"))
        )

    def backlog_count(self) -> int:
        """``select count(*) from stream`` (dp_demo.sql:154-158): rows
        not yet consumed = table rows minus rows in files of COMMITTED
        batches. Only offset-log entries whose batch id appears in the
        checkpoint's commits/ log count as consumed — offsets are
        written at batch start, so an in-flight or failed-and-retrying
        batch must still show as backlog (T3 consumed-by-DML)."""

        def norm(p: str) -> str:
            # file:///x, file:/x, /x -> /x
            return re.sub(r"^file:/+", "/", p)

        frontier = last_committed_batch(self.checkpoint_dir)
        seen: set[str] = set()
        src = os.path.join(self.checkpoint_dir, "sources", "0")
        if frontier is not None and os.path.isdir(src):
            for fn in sorted(os.listdir(src)):
                p = os.path.join(src, fn)
                if not os.path.isfile(p) or fn.startswith("."):
                    continue
                if fn.isdigit() and int(fn) > frontier:
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

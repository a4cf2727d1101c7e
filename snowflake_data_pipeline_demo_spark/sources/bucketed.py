"""Bucketed tables: the shuffle-deletion story for fact-to-fact joins.

SCALE.md's relational-core note says "on a cluster, bucket both tables
by orderkey to delete that exchange" — this module makes that concrete.
``spark.write.bucketBy(n, key)`` hash-partitions files at WRITE time
and records the bucket spec in the catalog; a join of two tables
bucketed by the same key into the same bucket count reads co-located
buckets and plans a SortMergeJoin with NO Exchange on either side
(tests/test_plan_shapes.py pins this against ``.explain``).

At 100 TB this converts the recurring per-query shuffle of both fact
tables into a one-time write-side cost: the nightly build of
lineitem/orders pays one hash exchange each, and every downstream join
— revenue rollups, as-of enrichments, the star slice — scans bucket
files straight into the join. Pick the bucket count once per table
pair (it must MATCH for the exchange to disappear) and size it so a
bucket ≈ one task's worth of data at target scale.

Plain parquet ``path``-based writes cannot carry a bucket spec — this
is catalog-table-only (``saveAsTable``), which is why the engine's
path-based Table (catalog.py) does not expose it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table_name: str,
                   bucket_cols: Sequence[str], num_buckets: int = 8,
                   sort_cols: Sequence[str] | None = None) -> None:
    """Write ``df`` as a catalog table bucketed (and optionally
    bucket-sorted) on ``bucket_cols``. Sorting within buckets lets the
    SortMergeJoin skip its per-task sort as well."""
    w = (
        df.write.mode("overwrite").format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucket_spec(spark, table_name: str) -> dict:
    """The table's bucket spec (DESCRIBE-style introspection):
    {num_buckets, bucket_cols, sort_cols}; zeros/empty when the table
    is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    def _cols(key: str) -> list[str]:
        raw = info.get(key, "")
        return [c.strip(" `") for c in raw.strip("[]").split(",") if c.strip()]
    return {
        "num_buckets": int(info.get("Num Buckets", "0") or 0),
        "bucket_cols": _cols("Bucket Columns"),
        "sort_cols": _cols("Sort Columns"),
    }

"""stream_data: the data-producer simulator (SURVEY §2.9 T11).

Reference: JavaScript SP ``stream_data(start, stop)`` (dp_setup.sql:29-93):
enumerate distinct days in [start, stop] -> per day, unload the joined +
denormalized JSON to the stage under prefix ``snowpipe_demo<yyyy-mm-dd>``
-> busy-wait ~1s per file ("trickle-unload", dp_setup.sql:85-90).

Spark-native: the unload query is one day-filtered write of the doc
DataFrame per day. The day enumeration collects a tiny distinct list to
the driver (same as the SP's resultset loop).

Scale notes: each per-day write is a full distributed job writing many
files for a real day-partition; the trickle (sleep) exists only to
simulate file arrival cadence for the pipe and defaults to 0.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import to_date_auto
from ..sources.stage import Stage


def stream_data(
    docs: DataFrame,
    stage: Stage,
    start_date: str,
    stop_date: str,
    *,
    day_col: str = "day",
    doc_col: str = "v",
    prefix: str = "snowpipe_demo",
    sleep_s: float = 0.0,
    on_file: Callable[[str], None] | None = None,
    order_field: str | None = "starttime",
    files_per_day: int = 1,
) -> int:
    """Unload ``docs`` (a DataFrame with a JSON text column and a day
    column) one day-prefix at a time, reference cadence optional.

    ``start_date``/``stop_date`` accept both yyyy-MM-dd and M/d/yyyy
    (Snowflake AUTO parsing — dp_demo.sql:115 passes '01/10/2020').
    Returns the number of day-partitions written (the SP returns a
    float file count, dp_setup.sql:38).

    ``order_field`` reproduces the unload subquery's ``ORDER BY
    starttime`` (S5/O2, dp_setup.sql:81): file contents are
    time-clustered via ``sortWithinPartitions`` on the doc's field (the
    honest Spark equivalent for file layout — a global sort would add a
    range-shuffle for no downstream benefit). ``files_per_day``
    defaults to 1, the reference's one-file-per-day cadence
    (dp_setup.sql:57); raise it (or pass 0 to skip the coalesce) when a
    day-partition is big enough to want parallel writers.
    """
    lo = to_date_auto(F.lit(start_date))
    hi = to_date_auto(F.lit(stop_date))
    in_range = docs.filter(F.col(day_col).cast("date").between(lo, hi))

    days = [
        r["d"]
        for r in in_range.select(F.col(day_col).alias("d")).distinct().orderBy("d").collect()
    ]
    for d in days:
        day_df = in_range.filter(F.col(day_col) == d).select(doc_col)
        if files_per_day:
            day_df = day_df.coalesce(files_per_day)
        if order_field:
            # the doc col is JSON text; the sort key is extracted from it
            # (epoch-micros long in the wire format, so a numeric sort)
            day_df = day_df.sortWithinPartitions(
                F.get_json_object(F.col(doc_col), f"$.{order_field}").cast("long")
            )
        # JSON-lines, one prefix per day (dp_setup.sql:57). The doc col is
        # already JSON text, so write as text to keep bytes verbatim.
        target = f"{stage.url}/{prefix}{d}"
        day_df.write.mode("append").text(target)
        if on_file is not None:
            on_file(target)
        if sleep_s:
            time.sleep(sleep_s)
    return len(days)

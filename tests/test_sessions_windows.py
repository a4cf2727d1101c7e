"""Sessionization + event-time window operators: the batch
gaps-and-islands path, the session_window/tumbling rollups, and their
agreement (same gap rule => same per-user session counts)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from snowflake_data_pipeline_demo_spark.operators.sessions import (
    session_stats, sessionize,
)
from snowflake_data_pipeline_demo_spark.streaming.windows import (
    session_counts, tumbling_counts,
)


@pytest.fixture(scope="module")
def events(spark):
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def e(i, user, minutes):
        return (i, user, t0 + dt.timedelta(minutes=minutes), "click")

    rows = [
        # user 1: two sessions (gap 45 min > 30)
        e(1, 1, 0), e(2, 1, 10), e(3, 1, 55), e(4, 1, 60),
        # user 2: one session, events exactly 30 min apart (not > gap)
        e(5, 2, 0), e(6, 2, 30), e(7, 2, 60),
        # user 3: three singleton sessions
        e(8, 3, 0), e(9, 3, 100), e(10, 3, 200),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    ).cache()


def test_sessionize_gap_semantics(events):
    s = sessionize(events, gap_minutes=30)
    got = {(r["event_id"]): r["session_id"] for r in s.collect()}
    assert [got[i] for i in (1, 2, 3, 4)] == [1, 1, 2, 2]
    assert [got[i] for i in (5, 6, 7)] == [1, 1, 1]  # 30min == gap, not >
    assert [got[i] for i in (8, 9, 10)] == [1, 2, 3]


def test_session_stats(events):
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in session_stats(events, gap_minutes=30).collect()}
    assert got == {1: (2, 4), 2: (1, 3), 3: (3, 3)}


def test_session_window_agrees_with_batch_sessionize(events):
    """session_window closes a session `gap` after its LAST event —
    the same rule gaps-and-islands encodes, so per-user session counts
    must match (session_window gap is exclusive at exactly-gap, so use
    a strictly-larger gap on the batch side semantics: both count a
    30-min-apart pair as one session)."""
    sw = (
        session_counts(events, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    got_sw = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in sw.collect()}
    got_batch = {r["user_id"]: (r["n_sessions"], r["n_events"])
                 for r in session_stats(events, gap_minutes=30).collect()}
    assert got_sw == got_batch


def test_tumbling_counts_batch(events):
    out = tumbling_counts(events, window="1 hour", keys=("event_type",))
    got = {(r["window_start"].hour, r["event_type"]): r["n_events"]
           for r in out.collect()}
    # 9:00-10:00 window: minutes 0-59 => u1@{0,10,55}, u2@{0,30}, u3@{0}
    assert got[(9, "click")] == 6
    assert got[(10, "click")] == 3  # u1@60, u2@60, u3@100
    assert got[(12, "click")] == 1  # u3@200 = 12:20



def test_session_counts_streaming_matches_batch(spark, events, tmp_path):
    """The same session_counts definition run as a STREAM (file source,
    availableNow, complete output) produces the batch answer."""
    src = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    # one stateful operator per streaming query (stacking a second agg
    # trips Spark's global-watermark correctness check); the rollup of
    # closed sessions happens batch-side on the sink
    q = (
        session_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"]: r["n_sessions"] for r in spark.sql(
        "select user_id, count(*) as n_sessions from sess_stream group by 1"
    ).collect()}
    assert got == {1: 2, 2: 1, 3: 3}

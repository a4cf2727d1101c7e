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


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (error -> follow-up
    views within 5 min) run as TWO file streams matches the batch
    range-join on the same data."""
    import json

    from snowflake_data_pipeline_demo_spark.operators import joins
    from snowflake_data_pipeline_demo_spark.streaming.windows import (
        interval_join_stream,
    )

    errs = [(1, "2024-01-01T10:00:00"), (2, "2024-01-01T11:00:00")]
    views = [(1, "2024-01-01T10:02:00"), (1, "2024-01-01T10:06:00"),
             (2, "2024-01-01T11:04:59"), (2, "2024-01-01T10:59:00")]
    ldir, rdir = tmp_path / "errs", tmp_path / "views"
    ldir.mkdir(); rdir.mkdir()
    (ldir / "l.json").write_text("\n".join(
        json.dumps({"user_id": u, "ts": t}) for u, t in errs))
    (rdir / "r.json").write_text("\n".join(
        json.dumps({"user_id": u, "r_ts": t}) for u, t in views))

    ls = spark.readStream.schema("user_id long, ts timestamp").json(str(ldir))
    rs = spark.readStream.schema("user_id long, r_ts timestamp").json(str(rdir))
    got: list = []
    q = (
        interval_join_stream(ls, rs, keys=("user_id",),
                             window_seconds=300)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, _: got.extend(
            (r["user_id"], str(r["ts"]), str(r["r_ts"])) for r in df.collect()))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    # batch twin on the same rows
    lb = spark.read.schema("user_id long, ts timestamp").json(str(ldir))
    rb = spark.read.schema("user_id long, r_ts timestamp").json(str(rdir))
    ivl = lb.select("user_id", F.col("ts").alias("s"),
                    (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"))
    batch = joins.range_interval_join(
        ivl, rb.select("user_id", F.col("r_ts").alias("ts")),
        keys=["user_id"], start_col="s", end_col="e", point_ts="ts",
        bucket_seconds=300,
    ).select("user_id", F.col("s").alias("ts"), F.col("ts").alias("r_ts"))
    want = sorted((r["user_id"], str(r["ts"]), str(r["r_ts"]))
                  for r in batch.collect())
    assert sorted(got) == want
    # 10:02 and 11:04:59 match; 10:06 is outside the 5-min window and
    # 10:59 precedes its error
    assert len(got) == 2

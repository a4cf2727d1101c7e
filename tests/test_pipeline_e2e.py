"""End-to-end pipeline tests (SURVEY §5 strategy #2/#4): stream_data ->
pipe -> 3 streams/tasks -> modelled tables; exactly-once-per-file
ingest; per-consumer offsets; idempotent merges; purge safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_data_pipeline_demo_spark.plans.citibike import trip_docs
from snowflake_data_pipeline_demo_spark.streaming.pipeline import CitibikePipeline
from snowflake_data_pipeline_demo_spark.streaming.stream_data import stream_data


@pytest.fixture(scope="module")
def pipeline(spark, tables, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipeline"))
    p = CitibikePipeline(spark, root)
    docs = trip_docs(tables["lineitem"], tables["supplier"], tables["nation"])
    # keep the fixture fast: two day-partitions only
    days = [r["day"] for r in docs.select("day").distinct().orderBy("day").limit(2).collect()]
    docs_2d = docs.filter(F.col("day").isin(days)).cache()
    n_files = stream_data(docs_2d, p.stage, days[0], days[-1])
    p.expected_rows = docs_2d.count()
    p.n_days = n_files
    from snowflake_data_pipeline_demo_spark.plans.citibike import (
        extract_trips, programs_from_raw, stations_from_raw,
    )
    ext = extract_trips(docs_2d)
    p.expected_programs = programs_from_raw(ext).count()
    p.expected_stations = stations_from_raw(ext).select("station_id").distinct().count()
    return p


def test_stream_data_day_prefixes(pipeline):
    files = pipeline.stage.list()
    assert files, "stream_data wrote no files"
    assert all("snowpipe_demo" in f.path for f in files)
    assert pipeline.n_days == 2


def test_pipe_ingests_exactly_once(pipeline):
    pipeline.pipe.run_available()
    assert pipeline.trips_raw.count() == pipeline.expected_rows
    # re-run: file-source checkpoint must not re-ingest (T1 exactly-once)
    pipeline.pipe.run_available()
    assert pipeline.trips_raw.count() == pipeline.expected_rows
    # copy_history ledger has one row per staged file, zero errors (T8)
    ch = pipeline.copy_history.read()
    assert ch.filter("error_count != 0").count() == 0
    assert ch.select("file_name").distinct().count() == len(pipeline.stage.list())


def test_tasks_push_and_streams_drain(pipeline):
    pipeline.runner.run_available_all()
    assert pipeline.trips.count() == pipeline.expected_rows
    # dims: distinct keys merged once (930-stations/61-programs analog)
    assert pipeline.programs.count() == pipeline.expected_programs
    assert pipeline.stations.count() == pipeline.expected_stations
    # streams drained to 0 (dp_demo.sql:155-158)
    assert pipeline.new_trips.backlog_count() == 0
    assert pipeline.new_programs.backlog_count() == 0
    assert pipeline.new_stations.backlog_count() == 0
    # task_history records SUCCEEDED runs (T9)
    th = pipeline.task_history.read()
    assert th.filter("state = 'SUCCEEDED'").count() >= 3


def test_rerun_is_idempotent_and_skipped(pipeline):
    before = (pipeline.trips.count(), pipeline.programs.count(), pipeline.stations.count())
    pipeline.runner.run_available_all()
    after = (pipeline.trips.count(), pipeline.programs.count(), pipeline.stations.count())
    assert before == after
    # empty micro-batches recorded as SKIPPED (dp_demo.sql:170)
    assert pipeline.task_history.read().filter("state = 'SKIPPED'").count() >= 1


def test_purge_chained_after_push_trips(pipeline, spark):
    # the AFTER-chained purge (dp_setup.sql:249-252) already ran inside
    # push_trips' drain: every loaded file is gone from the stage
    assert pipeline.stage.list() == []
    # purge never touches a file copy_history hasn't committed (T10
    # restart-safety): stage a new, un-ingested file and re-purge
    spark.range(1).coalesce(1).selectExpr("cast(id as string) as v").write.mode(
        "append"
    ).text(f"{pipeline.stage.url}/snowpipe_demo9999-01-01")
    n_staged = len(pipeline.stage.list())
    assert n_staged >= 1
    assert pipeline.purge_files() == 0
    assert len(pipeline.stage.list()) == n_staged  # unloaded files survived
    pipeline.stage.rm("snowpipe_demo9999-01-01")


def test_incremental_second_wave(pipeline, spark, tables):
    """New files after the first drain flow through incrementally —
    per-consumer offsets advance independently (T2/T3)."""
    docs = trip_docs(tables["lineitem"], tables["supplier"], tables["nation"])
    days = sorted(r["day"] for r in docs.select("day").distinct().collect())
    wave2 = days[2]
    stream_data(docs, pipeline.stage, wave2, wave2)
    wave2_rows = docs.filter(F.col("day") == wave2).count()

    programs_before = pipeline.programs.count()
    pipeline.run_available()
    assert pipeline.trips_raw.count() == pipeline.expected_rows + wave2_rows
    assert pipeline.trips.count() == pipeline.expected_rows + wave2_rows
    assert pipeline.programs.count() >= programs_before  # insert-only merge
    assert pipeline.new_trips.backlog_count() == 0


def test_pipe_status_and_dashboard(pipeline):
    st = pipeline.pipe.status()
    assert st["pendingFileCount"] == 0
    row = pipeline.status().collect()[0]
    assert row["trips_rows"] == pipeline.trips.count()
    assert row["backlog_new_trips"] == 0
    assert row["programs_rows"] == pipeline.programs.count()


def test_record_failure_dropped_only_while_stopping(spark):
    """The suspend-interrupt race pin (r11): a task-history append that
    fails WHILE the task is stopping is dropped (the uncommitted epoch
    replays on resume, so the row re-appends), but the same failure on
    a running task propagates — the guard must never absorb a real
    write error."""
    from snowflake_data_pipeline_demo_spark.streaming.history import (
        TASK_HISTORY_SCHEMA,
    )
    from snowflake_data_pipeline_demo_spark.streaming.tasks import Task

    class _Boom:
        schema = TASK_HISTORY_SCHEMA

        def append(self, df):
            raise RuntimeError("py4j interrupted write stand-in")

    t = Task("t", stream=None, body=lambda b, i: 0, task_history=_Boom())
    t._stopping = True
    # dropped, no raise — and the False return tells _on_batch to skip
    # AFTER hooks on the dying thread
    assert t._record(spark, "SKIPPED", None, -1, 0, None) is False
    t._stopping = False
    with pytest.raises(RuntimeError, match="stand-in"):
        t._record(spark, "SKIPPED", None, -1, 0, None)


def test_concurrent_appends_to_one_table_are_safe(spark, tmp_path):
    """The r11 staging-collision pin: concurrent append jobs into one
    path share the committer's _temporary/0 staging dir, and one
    commit's cleanup used to delete the other's in-flight attempt dir
    (captured live from two task ticks appending task_history).
    Table.append serializes per path; 12 appends from 4 threads must
    all land."""
    import concurrent.futures

    from pyspark.sql import types as T

    from snowflake_data_pipeline_demo_spark.sources.catalog import Table

    t = Table(spark, str(tmp_path / "ledger"), T.StructType([
        T.StructField("k", T.LongType()),
    ]))

    def one(i):
        t.append(spark.range(i, i + 1).select(F.col("id").alias("k")))

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, range(12)))
    assert t.read().count() == 12
    assert {r["k"] for r in t.read().collect()} == set(range(12))

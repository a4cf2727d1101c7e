"""Unit tests for the engine's library layers (stage, catalog, merge,
scalars, variant) — the pieces the driver gate doesn't see directly."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowflake_data_pipeline_demo_spark.functions.scalars import (
    iff, md5_mask, to_date_auto,
)
from snowflake_data_pipeline_demo_spark.functions.variant import (
    extract_variant, object_construct_json, variant_get,
)
from snowflake_data_pipeline_demo_spark.operators.merge import (
    insert_only_merge, merge_result,
)
from snowflake_data_pipeline_demo_spark.sources.catalog import Catalog, PROGRAMS_SCHEMA
from snowflake_data_pipeline_demo_spark.sources.stage import Stage


def test_stage_roundtrip(spark, tmp_path):
    stage = Stage(spark, str(tmp_path / "stage"))
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    stage.unload_json(df, "snowpipe_demo2020-01-10")
    files = stage.list()
    assert files and all("snowpipe_demo2020-01-10" in f.path for f in files)

    back = stage.read_json("id long, v long", "snowpipe_demo2020-01-10")
    assert back.count() == 10
    assert {r["v"] for r in back.collect()} == {2 * i for i in range(10)}

    raw = stage.read_raw("snowpipe_demo2020-01-10")
    assert raw.columns == ["$1", "metadata$filename"]
    assert raw.count() == 10

    # RM one file, then the prefix (S8)
    assert stage.rm(files[0].path)
    assert len(stage.list()) == len(files) - 1
    stage.rm("snowpipe_demo2020-01-10")
    assert stage.list() == []


def test_catalog_append_truncate(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("modelled.programs", PROGRAMS_SCHEMA)
    assert t.count() == 0  # empty table reads as empty typed df
    df = spark.createDataFrame([(1, "A"), (2, "B")], PROGRAMS_SCHEMA)
    t.append(df)
    assert t.count() == 2
    t.append(df)
    assert t.count() == 4
    t.truncate()
    assert t.count() == 0


def test_concurrent_append_from_second_process_refused(spark, tmp_path):
    """A second DRIVER process appending to the same parquet path is
    detected and refused LOUDLY (r12; upgraded from the r11
    'documented non-goal' — the silent failure mode is the first
    commit's cleanup wiping the second job's shared `_temporary/0`
    staging). A live subprocess acquires the pid lock file exactly the
    way Table._append_lockfile does (O_CREAT|O_EXCL + pid inside) and
    holds it; this process's append must raise ConcurrentAppendError
    naming the holder, not corrupt."""
    import os
    import subprocess
    import sys
    import time

    from snowflake_data_pipeline_demo_spark.sources.catalog import (
        ConcurrentAppendError,
    )

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("modelled.programs", PROGRAMS_SCHEMA)
    df = spark.createDataFrame([(1, "A")], PROGRAMS_SCHEMA)
    t.append(df)  # uncontended append works and releases the lock
    lock = os.path.join(t._lock_key, "_append.lock")
    assert not os.path.exists(lock)

    holder = subprocess.Popen([
        sys.executable, "-c",
        "import os, sys, time\n"
        f"fd = os.open({lock!r}, os.O_CREAT | os.O_EXCL | os.O_WRONLY)\n"
        "os.write(fd, str(os.getpid()).encode()); os.close(fd)\n"
        "print('held', flush=True)\n"
        "time.sleep(60)\n",
    ], stdout=subprocess.PIPE, text=True)
    try:
        assert holder.stdout.readline().strip() == "held"
        with pytest.raises(ConcurrentAppendError, match=str(holder.pid)):
            t.append(df)
    finally:
        holder.kill()
        holder.wait()
    # the refused append must not have clobbered the holder's lock
    assert os.path.exists(lock)
    os.remove(lock)
    t.append(df)  # and the table still works once the writer is gone
    assert t.count() == 2


def test_stale_append_lock_from_dead_process_is_broken(spark, tmp_path):
    """A lock file left by a CRASHED writer (pid no longer alive) must
    not wedge the table: the guard breaks it and the append proceeds,
    removing the lock afterwards."""
    import os
    import subprocess
    import sys

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("modelled.programs", PROGRAMS_SCHEMA)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    lock = os.path.join(t._lock_key, "_append.lock")
    with open(lock, "w") as f:
        f.write(str(dead.pid))
    t.append(spark.createDataFrame([(1, "A")], PROGRAMS_SCHEMA))
    assert t.count() == 1
    assert not os.path.exists(lock)


def test_append_lock_key_is_path_normalized(spark, tmp_path):
    """Trailing-slash / relative spellings of one physical dir must
    take the SAME in-process lock (r11 ADVICE: distinct raw-string
    keys silently stopped serializing)."""
    from snowflake_data_pipeline_demo_spark.sources.catalog import (
        Table, _append_lock, _normalize_path_key,
    )

    base = str(tmp_path / "wh" / "t")
    assert _normalize_path_key(base + "/") == _normalize_path_key(base)
    assert _normalize_path_key("file://" + base) == _normalize_path_key(base)
    t1 = Table(spark, base, PROGRAMS_SCHEMA)
    t2 = Table(spark, base + "/", PROGRAMS_SCHEMA)
    assert t1._lock_key == t2._lock_key
    assert _append_lock(t1._lock_key) is _append_lock(t2._lock_key)


def test_has_data_ignores_temporary_staging_subtrees(spark, tmp_path):
    """_has_data must never DESCEND into `_temporary`/hidden subtrees
    (r12 live-load capture: the old recursive listFiles stats staging
    children with an eager permission load that shells `ls` on local
    fs — a committer deleting the dir mid-walk turned that into a
    RuntimeException the FileNotFoundException-only retry missed,
    killing a task query). A table whose only files sit under a
    staging dir is EMPTY; data files at any non-hidden depth count."""
    import os

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("modelled.programs", PROGRAMS_SCHEMA)
    staging = os.path.join(t._lock_key, "_temporary", "0", "_temporary")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-000.parquet"), "w") as f:
        f.write("in-flight attempt data")
    assert not t._has_data()  # staging content is invisible
    nested = os.path.join(t._lock_key, "batch_1")
    os.makedirs(nested)
    with open(os.path.join(nested, "part-000.parquet"), "wb") as f:
        f.write(b"x")
    assert t._has_data()  # real nested data still found


def test_suspend_keeps_stopping_flag_when_stop_fails(spark, tmp_path):
    """If query.stop() itself raises (e.g. stopTimeout), the query may
    still be live and tearing down: suspend must RETAIN the handle and
    LEAVE _stopping raised so the stream thread's interrupted ledger
    append doesn't re-raise across the dying callback connection (r11
    ADVICE: a finally-reset reopened that channel). resume() resets
    the flag for the fresh start."""
    from snowflake_data_pipeline_demo_spark.streaming.tasks import Task

    t = Task.__new__(Task)
    t.name = "t"
    t._stopping = False

    class _StubQuery:
        def stop(self):
            raise RuntimeError("stop timed out")

    t.query = _StubQuery()
    with pytest.raises(RuntimeError, match="stop timed out"):
        t.suspend()
    assert t._stopping is True  # still raised while the query tears down
    assert t.query is not None  # handle retained (r11 review)

    class _OkQuery:
        def stop(self):
            pass

    t.query = _OkQuery()
    t.suspend()
    assert t._stopping is False and t.query is None  # clean stop resets


def test_insert_only_merge_semantics(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("modelled.programs", PROGRAMS_SCHEMA)
    t.append(spark.createDataFrame([(1, "A"), (2, "B")], PROGRAMS_SCHEMA))

    src = spark.createDataFrame(
        [(2, "B-dup"), (3, "C"), (3, "C"), (4, "D")], PROGRAMS_SCHEMA
    )
    inserted = insert_only_merge(t, src, ["program_id"])
    assert inserted == 2  # 3 and 4; 2 matched, dup 3 deduped
    assert t.count() == 4
    # idempotent re-merge (reference stream re-delivery safety)
    assert insert_only_merge(t, src, ["program_id"]) == 0
    assert t.count() == 4
    # existing rows never updated (insert-only: no WHEN MATCHED branch)
    assert t.read().filter("program_id = 2").collect()[0]["program_name"] == "B"


def test_merge_result_pure(spark):
    target = spark.createDataFrame([(1, "A")], PROGRAMS_SCHEMA)
    src = spark.createDataFrame([(1, "A"), (2, "B")], PROGRAMS_SCHEMA)
    out = merge_result(target, src, ["program_id"]).collect()
    assert [(r["program_id"], r["program_name"]) for r in out] == [(2, "B")]


def test_iff_and_mask(spark):
    df = spark.createDataFrame([(1, "x"), (10, "y")], "a int, s string")
    out = df.select(
        iff(F.col("a") > 5, F.lit("big"), F.lit("small")).alias("b"),
        md5_mask("s").alias("m"),
    ).collect()
    assert [r["b"] for r in out] == ["small", "big"]
    assert all(r["m"].startswith("REDACTED (") and r["m"].endswith(")") for r in out)


def test_to_date_auto_both_formats(spark):
    df = spark.createDataFrame([("2020-01-10",), ("01/10/2020",)], "d string")
    out = df.select(to_date_auto("d").alias("dt")).collect()
    assert str(out[0]["dt"]) == "2020-01-10"
    assert str(out[1]["dt"]) == "2020-01-10"  # M/d/yyyy (dp_demo.sql:115)


def test_variant_roundtrip_timestamp_fidelity(spark):
    """SURVEY §7.3: timestamp_ntz must survive the JSON round trip."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("n", T.IntegerType()),
    ])
    df = spark.sql(
        "SELECT timestamp_ntz'2020-01-10 12:34:56.789' AS ts, 7 AS n"
    )
    doc = df.select(object_construct_json({"ts": F.col("ts"), "n": F.col("n")}).alias("v"))
    back = doc.select(extract_variant("v", schema).alias("p")).select(
        variant_get("p", "ts"), variant_get("p", "n", "long").alias("n")
    ).collect()[0]
    assert str(back[0]) == "2020-01-10 12:34:56.789000"
    assert back["n"] == 7


def test_use_role_session_context(spark):
    from snowflake_data_pipeline_demo_spark.session import current_role, use_role

    assert current_role(spark) == "ACCOUNTADMIN"  # demo default
    use_role(spark, "sysadmin")
    assert current_role(spark) == "SYSADMIN"
    use_role(spark, "accountadmin")


def test_table_compact_merges_small_files(spark, tmp_path):
    from snowflake_data_pipeline_demo_spark.sources.catalog import Table
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
    ])
    t = Table(spark, str(tmp_path / "t"), schema)
    for i in range(6):
        t.append(spark.createDataFrame([(i, f"v{i}")], schema).coalesce(1))
    before = t.read().orderBy("k").collect()
    assert len(t.data_files()) >= 6
    stats = t.compact(target_file_bytes=1 << 30)
    assert stats["files_before"] >= 6 and stats["files_after"] == 1
    assert t.read().orderBy("k").collect() == before
    # idempotent on an already-compact table
    stats2 = t.compact(target_file_bytes=1 << 30)
    assert stats2["files_after"] == 1
    assert t.read().orderBy("k").collect() == before


def test_loader_contract_normalizes_testdata_schemas(spark):
    """Canary against driver testdata regenerations: the loader must
    present stable column types to the operator layer regardless of how
    the parquet files encode them (events.ts has shipped as both
    TIMESTAMP(NANOS)-as-long and micros TIMESTAMP_NTZ across rounds —
    a silent change here broke 5 queries once; fail loudly instead)."""
    from pyspark.sql import types as T

    from snowflake_data_pipeline_demo_spark.sources.testdata import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load(spark, sf, "events")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType), sf
        docs = load(spark, sf, "documents")
        assert isinstance(docs.schema["text"].dataType, T.StringType), sf
        emb = load(spark, sf, "embeddings")
        el = emb.schema["embedding"].dataType
        assert isinstance(el, T.ArrayType) and isinstance(
            el.elementType, (T.FloatType, T.DoubleType)), sf
        li = load(spark, sf, "lineitem")
        assert "l_shipdate" in li.columns and "l_quantity" in li.columns, sf


def test_stage_multi_format_roundtrip(spark, tmp_path):
    """S5/S6 across every staged format available on this deployment:
    unload a frame, read it back typed, bytes agree — the format
    breadth the reference's VARIANT table claims (dp_setup.sql:140).
    Optional module formats (avro/xml) are probed: available ones must
    round-trip, absent ones must be rejected with a clear error (in
    this sandbox xml is built in to Spark 4; avro's module jar is not
    deployed)."""
    import pytest

    from snowflake_data_pipeline_demo_spark.sources.stage import (
        Stage, optional_formats,
    )

    stage = Stage(spark, str(tmp_path / "stage"))
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.25)],
        "id long, s string, x double",
    )
    want = sorted(map(tuple, df.collect()))
    opt = optional_formats(spark)
    per_fmt_opts = {"csv": {"header": "true"}, "xml": {"rowTag": "row"}}
    for fmt in ("json", "csv", "parquet", "orc") + opt:
        opts = per_fmt_opts.get(fmt, {})
        stage.unload(df, f"t_{fmt}", format=fmt, **opts)
        back = stage.read("id long, s string, x double",
                          f"t_{fmt}", format=fmt, **opts)
        assert sorted(map(tuple, back.collect())) == want, fmt
    for fmt in ("avro", "xml"):
        if fmt not in opt:
            with pytest.raises(ValueError, match="external Spark module"):
                stage.unload(df, f"t_{fmt}_missing", format=fmt)


class TestLaneCacheContract:
    """Pins the r08 ADVICE fixes in caching.py: _TRACKED is
    lock-guarded (a torn pop under a future threaded runner must fail
    soft, not corrupt the list), and unpersist-failure swallowing is
    decided by the frame's OWN SparkContext stopped-state, not the
    thread-local getActiveSession (which is None on any non-Spark
    thread and used to hide genuine failures). Stub frames — the
    contract under test is pure bookkeeping, no JVM needed."""

    class _Stub:
        def __init__(self):
            self.released = 0

        def cache(self):
            return self

        def unpersist(self):
            self.released += 1

    def test_concurrent_track_and_drain_consistent(self):
        import threading

        from snowflake_data_pipeline_demo_spark import caching

        caching.release_lane_caches()  # clean slate
        stubs = [self._Stub() for _ in range(2000)]
        chunks = [stubs[i::4] for i in range(4)]
        drained: list[int] = []

        def track(chunk):
            for s in chunk:
                caching.lane_cache(s)

        def drain():
            total = 0
            for _ in range(200):
                total += caching.release_lane_caches()
            drained.append(total)

        threads = [threading.Thread(target=track, args=(c,))
                   for c in chunks]
        threads += [threading.Thread(target=drain) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        drained.append(caching.release_lane_caches())  # final sweep
        assert sum(drained) == 2000
        assert all(s.released == 1 for s in stubs)
        assert caching.release_lane_caches() == 0

    def test_unpersist_failure_raises_when_context_alive(self):
        import pytest

        from snowflake_data_pipeline_demo_spark import caching

        caching.release_lane_caches()

        class _Sc:
            def sc(self):
                return self

            def isStopped(self):
                return False

        class _Session:
            class sparkContext:
                _jsc = _Sc()

        class _Boom(self._Stub):
            sparkSession = _Session()

            def unpersist(self):
                raise RuntimeError("block manager exploded")

        caching.lane_cache(_Boom())
        with pytest.raises(RuntimeError, match="exploded"):
            caching.release_lane_caches()

    def test_unpersist_failure_swallowed_when_context_stopped(self):
        from snowflake_data_pipeline_demo_spark import caching

        caching.release_lane_caches()

        class _Torn(self._Stub):
            # sparkSession access itself explodes (py4j gateway gone
            # at interpreter teardown) -> treated as stopped
            @property
            def sparkSession(self):
                raise RuntimeError("gateway down")

            def unpersist(self):
                raise RuntimeError("context stopped")

        caching.lane_cache(_Torn())
        assert caching.release_lane_caches() == 0


class TestRotationSuggest:
    """The rotation window cut policy as pure arithmetic
    (scripts/rotation_ledger.py --suggest, r10): fix obligations front
    the window, then never-graded, then freshness-due, then
    alphabetical refresh picks from the oldest cohort; the due-next
    cohort's leftovers become the _VERIFY_LAST obligation. The cut was
    hand-derived every round before r10 — a transcription slip there
    silently misses a lane's grading deadline, so the policy gets a
    pin like any other contract."""

    @staticmethod
    def _suggest(names, green, fail, cur, window):
        import importlib.util
        import io
        import os
        from contextlib import redirect_stdout

        spec = importlib.util.spec_from_file_location(
            "rotation_ledger",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "rotation_ledger.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        buf = io.StringIO()
        with redirect_stdout(buf):
            mod.suggest(names, green, fail, cur, window=window)
        out = buf.getvalue()
        blocks: dict[str, list[str]] = {}
        key = None
        for line in out.splitlines():
            if line.startswith("# "):
                key = line[2:].split(" (")[0]
                blocks[key] = []
            elif line.strip().startswith('"') and key:
                blocks[key].append(line.strip().strip('",'))
        return blocks

    def test_policy_order_and_leftovers(self):
        names = [f"l{i:02d}" for i in range(10)]
        green = {"l00": 5, "l01": 5, "l02": 4, "l03": 4, "l04": 3,
                 "l05": 3, "l06": 5, "l08": 2, "l09": 5}
        # l07 never graded; l08 green r02 then FAILED r05; l04/l05 due
        fail = {"l08": 5}
        b = self._suggest(names, green, fail, cur=5, window=6)
        assert b["fix obligations"] == ["l08"]
        assert b["never graded"] == ["l07"]
        assert b["freshness-due"] == ["l04", "l05"]
        # 2 refresh slots left -> oldest cohort (r04) alphabetical
        assert b["refresh picks"] == ["l02", "l03"]
        # the r04 cohort is exhausted by the picks; leftovers list the
        # r04-cohort lanes NOT refreshed (none here)
        assert b["_VERIFY_LAST"] == []

    def test_leftovers_name_the_next_due_cohort(self):
        names = ["a", "b", "c", "d", "e"]
        green = {"a": 3, "b": 4, "c": 4, "d": 4, "e": 5}
        b = self._suggest(names, green, {}, cur=5, window=2)
        assert b["freshness-due"] == ["a"]
        assert b["refresh picks"] == ["b"]
        # c, d (r04) hit the limit at r07 and MUST front that window
        assert b["_VERIFY_LAST"] == ["c", "d"]

    def test_slipped_lane_is_still_an_obligation(self):
        # r10 review: a lane whose deadline already PASSED (green at
        # cur-3 or older — an earlier cut missed it) must front the
        # window as due, not hide in the refresh pool where the
        # overflow guard can't see it
        names = ["a", "b", "c"]
        green = {"a": 2, "b": 3, "c": 4}  # cur=5: 'a' slipped, 'b' due
        b = self._suggest(names, green, {}, cur=5, window=3)
        assert b["freshness-due"] == ["a", "b"]
        assert b["refresh picks"] == ["c"]

    def test_overflow_is_loud(self):
        import pytest as _pytest
        names = [f"l{i}" for i in range(5)]
        green = {n: 3 for n in names}  # all due at once
        with _pytest.raises(SystemExit, match="exceed"):
            self._suggest(names, green, {}, cur=5, window=3)


def test_env_extra_conf_parses_semicolon_pairs(monkeypatch):
    """The SPARK_GRAFT_EXTRA_CONF experiment hook (r12): ';'-separated
    key=value pairs, malformed fragments ignored, embedded '=' kept."""
    from snowflake_data_pipeline_demo_spark.session import _env_extra_conf

    monkeypatch.setenv(
        "SPARK_GRAFT_EXTRA_CONF",
        "spark.sql.join.preferSortMergeJoin=false;"
        "spark.driver.extraJavaOptions=-Da=b=c;garbage;=alsobad;",
    )
    assert _env_extra_conf() == {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.driver.extraJavaOptions": "-Da=b=c",
    }
    monkeypatch.delenv("SPARK_GRAFT_EXTRA_CONF")
    assert _env_extra_conf() == {}

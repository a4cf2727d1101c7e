#!/usr/bin/env python
"""The reference run-book (dp_demo.sql), end-to-end on this engine.

Mirrors the demo sequence step by step: reset -> stream_data unload ->
pipe ingest (Snowpipe analog) -> monitoring -> 3 streams / 3 tasks ->
chained purge -> secure-view consumer reports per account -> the
one-row ops dashboard. Runs in ~1 min on sf0.001.

Usage: python demo.py [workdir]   (default: a temp directory)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from snowflake_data_pipeline_demo_spark.plans.citibike import (
        security_fixture, trip_docs,
    )
    from snowflake_data_pipeline_demo_spark.plans.secure_view import (
        consumer_report, secure_trips_view,
    )
    from snowflake_data_pipeline_demo_spark.session import (
        get_spark, set_current_account, use_role,
    )
    from snowflake_data_pipeline_demo_spark.sources import testdata
    from snowflake_data_pipeline_demo_spark.sources.shares import ShareRegistry
    from snowflake_data_pipeline_demo_spark.streaming.pipeline import (
        CitibikePipeline,
    )
    from snowflake_data_pipeline_demo_spark.streaming.stream_data import (
        stream_data,
    )

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="dp_demo_")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("dp_demo")
    use_role(spark, "accountadmin")  # dp_demo.sql:8

    print(f"== demo workdir: {root} (testdata: {sf_dir})")
    p = CitibikePipeline(spark, root)

    # -- reset (dp_demo.sql:13-19): truncate x4, clear the stage
    for t in (p.trips_raw, p.trips, p.programs, p.stations):
        t.truncate()
    for f in p.stage.list():
        p.stage.rm(f.path)

    # -- provider side (dp_demo.sql:115): stream_data over two days;
    #    reference passes M/d/yyyy — AUTO parsing accepts it
    t = testdata.load_tables(spark, sf_dir, ("lineitem", "supplier", "nation", "region"))
    docs = trip_docs(t["lineitem"], t["supplier"], t["nation"])
    days = [r["day"] for r in
            docs.select("day").distinct().orderBy("day").limit(2).collect()]
    n_files = stream_data(docs.filter(F.col("day").isin(days)), p.stage,
                          days[0], days[-1])
    print(f"== stream_data wrote {n_files} day files; staged:",
          [os.path.basename(f.path) for f in p.stage.list()])

    # -- Snowpipe analog (dp_demo.sql:45): ingest everything staged
    p.pipe.run_available()
    print("== pipe_status:", p.pipe.status())
    print("== copy_history rows:", p.copy_history.count())

    # -- streams before tasks (dp_demo.sql:154-158)
    print("== stream backlogs:", {
        s.name: s.backlog_count()
        for s in (p.new_trips, p.new_programs, p.new_stations)})

    # -- tasks (dp_setup.sql:188-252): 3 pushes + chained purge
    p.runner.run_available_all()
    print("== modelled counts:", {
        "trips": p.trips.count(),
        "programs": p.programs.count(),
        "stations": p.stations.count()})
    print("== streams drained:", {
        s.name: s.backlog_count()
        for s in (p.new_trips, p.new_programs, p.new_stations)})
    print("== task_history:", [
        (r["name"], r["state"]) for r in
        p.task_history.read().select("name", "state").collect()])
    print("== stage after chained purge:", len(p.stage.list()), "files")

    # -- secure sharing (dp_demo.sql:208-279): share + per-account report
    reg = ShareRegistry()
    share = reg.create_share("trips_share")
    security = security_fixture(spark, t["region"])

    def view_factory(account: str):
        return secure_trips_view(
            p.trips.read(), p.stations.read(), p.programs.read(),
            security, account=account,
        )

    share.grant("trips_secure_vw", view_factory)
    share.add_accounts("ACCT_AMERICA", "ACCT_ASIA")
    for account in ("ACCT_AMERICA", "ACCT_ASIA"):
        set_current_account(spark, account)  # dp_demo.sql:263/273 analog
        view = share.open("trips_secure_vw", account)
        rows = consumer_report(view).count()
        print(f"== consumer report as {account}: {rows} rows")
    set_current_account(spark, None)  # dp_demo.sql:282 UNSET

    # -- ops dashboard (dp_demo.sql:127-142)
    print("== pipeline status:")
    p.status().show(truncate=False)


if __name__ == "__main__":
    main()

"""Run-book mirror smoke tests (r10 verdict ask #5).

demo_curation.py has run under the suite since r09
(test_temporal_ops.py::test_demo_curation_runs_end_to_end); demo.py and
demo_incremental.py could rot silently until now. Both execute here at
sf0.001 with golden-count asserts on the printed contract lines —
modelled counts, stream-drain-to-0, per-account report rows for the
reference run-book mirror; bloom/banded-ingest/component-merge/
autoscaler stage lines for the incremental state run-book.
"""

from __future__ import annotations

import re
import sys


def test_demo_runs_end_to_end(spark, monkeypatch, capsys, tmp_path):
    """The dp_demo.sql mirror executes against sf0.001: pipe ingest,
    3 streams drained to 0 by the task runner, per-account secure
    consumer reports, one-row ops dashboard."""
    import demo

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(sys, "argv", ["demo.py", str(tmp_path)])
    demo.main()
    out = capsys.readouterr().out

    # ingest happened: stream_data staged files and the pipe loaded them
    m = re.search(r"stream_data wrote (\d+) day files", out)
    assert m and int(m.group(1)) >= 1
    # modelled counts: every push task landed rows
    m = re.search(r"modelled counts: \{'trips': (\d+), 'programs': (\d+), "
                  r"'stations': (\d+)\}", out)
    assert m, out
    assert all(int(g) > 0 for g in m.groups())
    # the streams DRAINED: consumed-by-DML offsets advanced to zero
    # backlog for all three consumers (the T3 contract, live)
    m = re.search(r"streams drained: \{[^}]*\}", out)
    assert m, out  # show the captured output, not a bare AttributeError
    drained = m.group(0)
    backlogs = [int(x) for x in re.findall(r": (\d+)", drained)]
    assert backlogs and all(b == 0 for b in backlogs), drained
    # chained purge ran: the stage is empty again
    assert re.search(r"stage after chained purge: 0 files", out)
    # per-account secure reports: both consumer accounts saw rows
    for acct in ("ACCT_AMERICA", "ACCT_ASIA"):
        m = re.search(rf"consumer report as {acct}: (\d+) rows", out)
        assert m and int(m.group(1)) > 0, out


def test_demo_incremental_runs_end_to_end(spark, monkeypatch, capsys,
                                          tmp_path):
    """The incremental state run-book executes against sf0.001: bloom
    pre-filter skips re-deliveries, banded-index ingest keeps only
    novel docs, the persisted component assignment folds the batch in,
    PCA refreshes from merged covariance state (its inline
    merged==scratch assert runs live), and the semantic autoscaler
    drops every bit-identical re-delivered vector."""
    import demo_incremental

    monkeypatch.setattr(sys, "argv", [
        "demo_incremental.py", "/root/testdata/sf0.001", str(tmp_path),
    ])
    demo_incremental.main()
    out = capsys.readouterr().out

    # day 1 ingest kept a positive corpus and persisted all 6 state
    # families
    m = re.search(r"day 1: ingested (\d+) docs, kept (\d+)", out)
    assert m and int(m.group(2)) > 0
    assert int(m.group(2)) <= int(m.group(1))
    # bloom pre-filter did its job join-free (>= 1 exact re-delivery
    # of a day-1-KEPT doc is guaranteed by the %12==0 slice)
    m = re.search(r"bloom pre-filter: skipped (\d+) already-ingested", out)
    assert m and int(m.group(1)) >= 1
    # banded ingest: survivors kept <= fresh (near-dups dropped)
    m = re.search(r"banded-index ingest: kept (\d+) of (\d+)", out)
    assert m and 0 < int(m.group(1)) <= int(m.group(2))
    # component fold over the persisted assignment ran
    assert "incremental component merge over persisted assignment" in out
    # PCA refresh passed its inline merged-state == from-scratch assert
    assert "PCA refreshed from merged covariance state" in out
    # autoscaler: day 2 dropped ALL re-deliveries (inline assert ran),
    # and the bootstrap sized nlist from the corpus
    m = re.search(r"day 2 dropped all (\d+) re-deliveries, kept (\d+)", out)
    assert m and int(m.group(1)) >= 1
    # bloom state is day-3-ready across 2 runs
    assert re.search(r"day-3-ready: bloom now \d+ block rows", out)

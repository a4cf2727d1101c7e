"""Regenerate ROTATION.md — the driver-window rotation ledger.

The external driver grades only the FIRST 50 registry entries each
round (CORRECTNESS_r{N}.json), so plans/queries.py rotates the window
(_VERIFY_FIRST / _VERIFY_LAST). This script computes each lane's
last-driver-green round from the CORRECTNESS files and writes the
ledger the rotation policy is audited against: every entry's last
green must be <= 2 rounds old once its cohort has cycled through.

Run from the repo root:  python scripts/rotation_ledger.py
"""
from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def grading_history() -> tuple[dict[str, int], dict[str, int]]:
    """(last_green, last_fail): per lane, the latest round with a
    green driver row (hash-match, or a rows-only `no_oracle` row that
    produced rows — the weaker gate the driver records for
    non-SQL-expressible lanes) and the latest round with a graded
    NON-green row. A lane in last_fail but not last_green was graded
    and FAILED — a fix obligation, distinct from never-graded's mere
    freshness obligation (r08 review: the ledger used to conflate
    the two as `—`)."""
    green: dict[str, int] = {}
    fail: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r"):-len(".json")])
        for name, row in json.load(open(f)).items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("hash_match")
                or (row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None)
            )
            if ok:
                green[name] = max(rnd, green.get(name, 0))
            else:
                fail[name] = max(rnd, fail.get(name, 0))
    return green, fail


def main() -> None:
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    import __spark_entry__ as E

    names = list(E.queries().keys())
    oracles = set(E.oracle_sql())
    green, fail = grading_history()
    cur = max(max(green.values()), max(fail.values(), default=0))

    lines = [
        "# ROTATION — driver-window ledger",
        "",
        f"Registry: {len(names)} lanes; driver window: first 50; "
        f"latest graded round: r{cur:02d}.",
        "Regenerate with `python scripts/rotation_ledger.py` after each "
        "round's CORRECTNESS file lands.",
        "",
        "Positions 1-50 are the NEXT round's window "
        "(plans/queries.py `_VERIFY_FIRST`); `last green` is the lane's "
        "most recent GREEN driver row (`— (FAILED rNN)` = graded and "
        "failed, never green — a FIX obligation; plain `—` = never "
        "graded, a freshness obligation only; `rows-only` lanes get "
        "the weaker no-oracle gate).",
        "",
        "| # | lane | oracle | last green | due |",
        "|---|------|--------|-----------|-----|",
    ]
    for i, n in enumerate(names, 1):
        lg = green.get(n)
        kind = "sql" if n in oracles else "rows-only"
        lf = fail.get(n)
        if lg is None and lf is None:
            shown, due = "—", f"r{cur + 1:02d} (never graded)"
        elif lf is not None and (lg is None or lf > lg):
            # the lane's MOST RECENT grade is a failure — a fix
            # obligation regardless of any older green (r08 review
            # pass 2: the first cut only marked never-green lanes,
            # silently deferring a green-then-regressed lane)
            shown = (f"— (FAILED r{lf:02d})" if lg is None
                     else f"r{lg:02d} (FAILED r{lf:02d})")
            due = f"r{cur + 1:02d} (fix obligation)"
        else:
            # green at rN stays fresh through rN+2 (two rounds back);
            # rN+3 is the first round it would read stale, so its row
            # must appear in that round's window at the latest
            shown = f"r{lg:02d}"
            due = f"r{lg + 3:02d}"
        lines.append(f"| {i} | {n} | {kind} | {shown} | {due} |")

    hist = Counter(
        "failed" if (n in fail and fail[n] > green.get(n, -1))
        else (f"r{green[n]:02d}" if n in green else "never")
        for n in names
    )
    lines += [
        "",
        "## Cohorts",
        "",
        "| last green | lanes |",
        "|------------|-------|",
    ]
    for k in sorted(hist, key=lambda s: (s != "never", s)):
        lines.append(f"| {k} | {hist[k]} |")
    lines += [
        "",
        "Policy: a lane graded green at rN stays fresh through rN+2 "
        "(the two-round freshness budget) and is due again by rN+3 — "
        "matching the `due` column above; never-graded lanes front "
        "the next cut unconditionally. The leftover cohort that "
        "misses a window is recorded in `_VERIFY_LAST` and MUST "
        "front the round after.",
        "",
    ]
    with open(os.path.join(REPO, "ROTATION.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"ROTATION.md: {len(names)} lanes, latest round r{cur:02d}, "
          f"cohorts {dict(hist)}")


if __name__ == "__main__":
    main()

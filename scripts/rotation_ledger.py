"""Regenerate ROTATION.md — the driver-window rotation ledger.

The external driver grades only the FIRST 50 registry entries each
round (CORRECTNESS_r{N}.json), so plans/queries.py rotates the window
(_VERIFY_FIRST / _VERIFY_LAST). This script computes each lane's
last-driver-green round from the CORRECTNESS files and writes the
ledger the rotation policy is audited against: every entry's last
green must be <= 2 rounds old once its cohort has cycled through.

Run from the repo root:  python scripts/rotation_ledger.py
With --suggest, also print the NEXT round's window cut (the exact
policy every round has applied by hand: fix obligations, then
never-graded, then freshness-due lanes, then alphabetical refresh
picks from the oldest remaining cohort) as paste-ready Python lists
for plans/queries.py's _VERIFY_FIRST / _VERIFY_LAST — the cut is
policy arithmetic, and hand-deriving it each round is where a lane
could silently miss its deadline.
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

    if "--suggest" in sys.argv:
        suggest(names, green, fail, cur)


def suggest(names: list[str], green: dict[str, int],
            fail: dict[str, int], cur: int, window: int = 50) -> None:
    """Print the next round's window cut under the standing policy:
    (1) fix obligations (most recent grade is a failure), (2) never
    graded, (3) freshness-due (last green == cur-2: they read stale at
    cur+1), then (4) alphabetical refresh picks from the oldest
    remaining cohort until the window fills. Leftovers of the cohort
    that becomes due at cur+2 print as the _VERIFY_LAST obligation."""
    def is_fix(n): return n in fail and fail[n] > green.get(n, -1)

    fix = sorted(n for n in names if is_fix(n))
    never = sorted(n for n in names
                   if n not in green and n not in fail)
    # <= not ==: a lane that already SLIPPED past its deadline (green
    # at cur-3 or older because an earlier cut missed it) is the most
    # obligated lane of all — an equality test would quietly park it
    # in the refresh pool and hide it from the overflow guard (r10
    # review finding)
    due = sorted(n for n in names
                 if not is_fix(n) and n in green
                 and green[n] <= cur - 2)
    front = fix + never + due
    if len(front) > window:
        raise SystemExit(
            f"{len(front)} obligated lanes exceed the {window}-row "
            "window — the rotation math has already failed; grade "
            "these across two rounds and say so in ROTATION.md"
        )
    # refresh from the oldest remaining cohort upward, alphabetical
    # within a cohort for a deterministic audit trail
    rest = [n for n in names if n not in set(front)]
    rest.sort(key=lambda n: (green.get(n, -1), n))
    picks = rest[:window - len(front)]
    # every obligated cohort (<= cur-2) already fronted via `due`, so
    # unpicked lanes at cur-1 are exactly the ones that hit the limit
    # at cur+2; <= keeps the filter safe if the invariant ever breaks
    leftover = sorted(
        n for n in rest[window - len(front):]
        if n in green and green[n] <= cur - 1
    )
    def block(title, xs):
        print(f"# {title} ({len(xs)}):")
        for n in xs:
            print(f'    "{n}",')
    print(f"\n== suggested r{cur + 1:02d} window cut ==")
    block("fix obligations", fix)
    block("never graded", never)
    block(f"freshness-due (last green r{cur - 2:02d})", due)
    block("refresh picks (oldest cohort, alphabetical)", picks)
    block(f"_VERIFY_LAST (r{cur - 1:02d} cohort left over, MUST front "
          f"r{cur + 2:02d})", leftover)


if __name__ == "__main__":
    main()

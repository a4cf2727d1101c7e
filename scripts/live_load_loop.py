"""Re-run the live streaming test under synthetic CPU load.

This is the harness that root-caused the r11 live-test flake into its
three captured channels (tests/test_streaming_live.py:44-76): the
races only fire when micro-batch commits, monitoring polls, and
suspend interrupts overlap under scheduler pressure, so plain suite
runs can go many iterations without reproducing them. The r11 session
ran this shape by hand (20 busy-loop processes, 1 failure in 6
pre-fix iterations, 8/8 green post-fix); the r11 verdict (ask #4)
requires it committed so the absorbed races stay RE-TESTABLE under the
load that produced them.

Usage, from the repo root:

    python scripts/live_load_loop.py            # 8 iterations, 20 loaders
    python scripts/live_load_loop.py --iters 4 --load 32

Each iteration runs `pytest tests/test_streaming_live.py` in a fresh
subprocess (fresh JVM — the races are startup/teardown sensitive)
while the loader processes spin. A failing iteration's full output is
saved to /tmp/live_load_fail_<i>.log and the script exits non-zero
after finishing the remaining iterations (one trace is evidence; the
pass RATE is the measurement).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: pure-CPU spin — enough arithmetic that the interpreter never sleeps;
#: runs until killed by the parent's terminate()
_LOADER = "x = 1\nwhile True:\n    x = (x * 1103515245 + 12345) % (2**31)\n"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--iters", type=int, default=8,
                    help="test iterations (default 8)")
    ap.add_argument("--load", type=int, default=20,
                    help="busy-loop loader processes (default 20)")
    args = ap.parse_args()

    loaders = [
        subprocess.Popen([sys.executable, "-c", _LOADER],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for _ in range(args.load)
    ]
    failures = 0
    try:
        for i in range(1, args.iters + 1):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, "-m", "pytest",
                 "tests/test_streaming_live.py", "-x", "-q"],
                cwd=REPO, capture_output=True, text=True,
            )
            dt = time.time() - t0
            status = "PASS" if r.returncode == 0 else "FAIL"
            print(f"iter {i}/{args.iters}: {status} in {dt:.1f}s",
                  flush=True)
            if r.returncode != 0:
                failures += 1
                log = f"/tmp/live_load_fail_{i}.log"
                with open(log, "w") as f:
                    f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
                print(f"  trace saved to {log}", flush=True)
    finally:
        for p in loaders:
            p.terminate()
        for p in loaders:
            p.wait()

    print(f"{args.iters - failures}/{args.iters} green under "
          f"{args.load}-process load")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

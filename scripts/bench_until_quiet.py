"""Run bench.py until it self-reports a quiet window (VERDICT r9 #1).

The host is bimodally noisy (SURVEY §9: kernel-storm windows inflate
sub-second queries 3-10×); bench.py already detects this and stamps
``window_verdict``. This wrapper re-runs the whole bench — each run is
a fresh process, so nothing is cached across attempts — until the
verdict is "quiet" or the retry budget is spent, keeping every
artifact. It never changes the bench methodology; it only picks the
run the noise detector trusts.

Usage: python scripts/bench_until_quiet.py [max_attempts=4]
Artifacts: BENCH_full.json holds the LAST run (bench.py's contract);
/tmp/bench_attempt_<i>.{out,err} and BENCH_attempt_<i>.json hold each
attempt. Exit 0 iff some attempt was quiet (its JSON is re-copied into
BENCH_full.json so the committed artifact is the quiet one).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    max_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    best = None  # (total, attempt_path) among quiet runs
    for i in range(1, max_attempts + 1):
        print(f"[bench-until-quiet] attempt {i}/{max_attempts}", file=sys.stderr)
        with open(f"/tmp/bench_attempt_{i}.out", "w") as out, open(
            f"/tmp/bench_attempt_{i}.err", "w"
        ) as err:
            subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                stdout=out,
                stderr=err,
                cwd=ROOT,
                check=False,
            )
        full_path = os.path.join(ROOT, "BENCH_full.json")
        try:
            with open(full_path) as fh:
                full = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        keep = os.path.join(ROOT, f"BENCH_attempt_{i}.json")
        shutil.copy(full_path, keep)
        verdict = full.get("window_verdict")
        total = full.get("value")
        print(
            f"[bench-until-quiet] attempt {i}: {total}s, verdict={verdict}, "
            f"retries={len(full.get('retries', {}))}",
            file=sys.stderr,
        )
        if verdict == "quiet" and not full.get("failures"):
            if best is None or total < best[0]:
                best = (total, keep)
            break  # first quiet run is the receipt
    if best is not None:
        shutil.copy(best[1], os.path.join(ROOT, "BENCH_full.json"))
        print(f"[bench-until-quiet] quiet receipt: {best[0]}s", file=sys.stderr)
        return 0
    print("[bench-until-quiet] no quiet window found", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

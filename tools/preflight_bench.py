"""Bench-artifact preflight: prove the driver will get a parseable
BENCH record BEFORE the round ends.

BENCH_r07 and BENCH_r08 recorded `parsed: null` because bench.py's one
JSON stdout line outgrew the driver's 2000-char stdout tail. The repair
(bench.slim_line + BENCH_LOCAL.json) is test-pinned in
tests/test_bench_emit.py; this tool closes the loop on the LIVE
artifact: it takes the freshest BENCH_LOCAL.json (i.e. real key widths
and real float magnitudes, not synthetic ones), re-emits the compact
line, simulates the driver's tail-truncate-then-parse, and fails loudly
if anything doesn't round-trip.

Usage: python tools/preflight_bench.py            # checks BENCH_LOCAL.json
       python tools/preflight_bench.py path.json  # checks a specific artifact
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

DRIVER_TAIL = 2000


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else bench.FULL_OUT
    if not os.path.exists(path):
        print(f"preflight_bench: no artifact at {path} — run bench.py first",
              file=sys.stderr)
        return 2
    out = json.load(open(path))

    line = bench.slim_line(out)
    problems: list[str] = []
    if len(line) > bench.TAIL_BUDGET:
        problems.append(f"compact line {len(line)} chars > budget "
                        f"{bench.TAIL_BUDGET}")

    # simulate the driver: stdout noise + line, keep last 2000 chars,
    # parse the last non-empty line
    stdout = "x" * 5000 + "\n" + line + "\n"
    tail = stdout[-DRIVER_TAIL:]
    try:
        last = [ln for ln in tail.splitlines() if ln.strip()][-1]
        parsed = json.loads(last)
    except Exception as e:  # noqa: BLE001
        problems.append(f"tail parse failed: {type(e).__name__}: {e}")
        parsed = {}

    if parsed:
        want = set(out.get("queries", {}))
        got = set(parsed.get("queries", {}))
        omitted = parsed.get("queries_omitted", 0)
        if got | set() != want and len(got) + omitted != len(want):
            problems.append(f"query set mismatch: {sorted(want - got)}")
        if parsed.get("metric") != out.get("metric"):
            problems.append("metric key lost")

    if problems:
        print("preflight_bench: FAIL")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"preflight_bench: OK — line {len(line)} chars "
          f"(budget {bench.TAIL_BUDGET}, driver tail {DRIVER_TAIL}), "
          f"{len(parsed.get('queries', {}))} queries survive the tail, "
          f"full artifact {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

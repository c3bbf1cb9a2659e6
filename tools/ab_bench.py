"""Interleaved A/B bench runner for the noisy-VM protocol (BASELINE.md).

Runs bench.py repeatedly with different SPARK_GRAFT_EXTRA_CONF arms,
interleaved round-robin so host-contention windows hit every arm
equally, and reports per-query medians-of-medians per arm.

Usage:
    python tools/ab_bench.py --rounds 3 --queries q1,q2 \
        --arm base= --arm dp32=spark.default.parallelism=32 \
        [--out /tmp/ab.json]

Each bench invocation is itself a median of 3 warm runs per query
(bench.py's protocol); this script adds the across-invocation median
the r12 verdict asked for. Subprocess-per-invocation = fresh JVM per
sample, so arms cannot contaminate each other through a shared session.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(queries: str, extra_conf: str, tag: str) -> dict:
    out_file = tempfile.mktemp(prefix=f"ab_{tag}_", suffix=".json")
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env["SPARK_GRAFT_BENCH_OUT"] = out_file
    if extra_conf:
        env["SPARK_GRAFT_EXTRA_CONF"] = extra_conf
    else:
        env.pop("SPARK_GRAFT_EXTRA_CONF", None)
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    if p.returncode != 0:
        print(f"  {tag}: FAILED rc={p.returncode}\n{p.stderr[-2000:]}",
              file=sys.stderr)
        return {}
    try:
        with open(out_file) as f:
            d = json.load(f)
        os.unlink(out_file)
    except (OSError, json.JSONDecodeError) as exc:
        print(f"  {tag}: artifact unreadable: {exc}", file=sys.stderr)
        return {}
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    print(f"  {tag}: total={d.get('value')}s wall={wall:.0f}s "
          f"end_load1={load1}", file=sys.stderr)
    return d.get("queries", {})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--arm", action="append", required=True,
                    help="name=extra_conf (conf may be empty)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    arms = []
    for a in args.arm:
        name, _, conf = a.partition("=")
        arms.append((name, conf))

    samples: dict[str, dict[str, list[float]]] = {
        name: {} for name, _ in arms}
    for r in range(args.rounds):
        print(f"round {r + 1}/{args.rounds}", file=sys.stderr)
        # rotate arm order per round so slot-position effects (load
        # decay tails, page-cache state) cancel across rounds instead
        # of systematically taxing the later arms
        order = arms[r % len(arms):] + arms[:r % len(arms)]
        for name, conf in order:
            qs = run_once(args.queries, conf, name)
            for q, sec in qs.items():
                samples[name].setdefault(q, []).append(sec)

    result: dict = {"queries": args.queries, "rounds": args.rounds,
                    "arms": {}}
    base_name = arms[0][0]
    for name, conf in arms:
        med = {q: round(statistics.median(v), 3)
               for q, v in samples[name].items()}
        result["arms"][name] = {"conf": conf, "median": med,
                                "samples": samples[name],
                                "total": round(sum(med.values()), 3)}
    print("\n=== medians-of-medians ===")
    qnames = sorted(samples[base_name])
    hdr = "query".ljust(34) + "".join(n.rjust(10) for n, _ in arms)
    print(hdr)
    for q in qnames:
        row = q.ljust(34)
        for name, _ in arms:
            m = result["arms"][name]["median"].get(q)
            row += (f"{m:10.3f}" if m is not None else "         -")
        print(row)
    row = "TOTAL".ljust(34)
    for name, _ in arms:
        row += f"{result['arms'][name]['total']:10.3f}"
    print(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"written: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

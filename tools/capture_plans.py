"""Capture .explain("formatted") for registered queries into plans/r12/.

Usage:
    python tools/capture_plans.py --suffix before [--out plans/r12] name ...
    python tools/capture_plans.py --suffix before --headline   # bench set

Writes plans/r12/<query>_<suffix>.txt per query. Building a DataFrame may
run small dispatch jobs (COUNT(*) lane dials); the explain itself does not
execute the plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.plans.registry import all_queries
from datastream_processing_demo_spark.session import EngineConfig, get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12"))
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--headline", action="store_true",
                    help="capture the bench HEADLINE set")
    args = ap.parse_args()

    names = list(args.names)
    if args.headline:
        from bench import HEADLINE
        names += [n for n in HEADLINE if n not in names]
    os.makedirs(args.out, exist_ok=True)
    spark = get_session(EngineConfig(app_name="capture-plans"))
    specs = all_queries()
    for name in names:
        spec = specs[name]
        try:
            df = spec.spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()

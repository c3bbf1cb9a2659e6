"""Driver-window preflight: run the FIRST N entries of
`ordered_queries()` — exactly the slice the driver will check — on a
VANILLA SparkSession (the driver does not apply session.py configs) and
compare each against its DuckDB oracle.

This is the last gate before a round ends: `tools/selfcheck.py` proves
every query under the engine's own session; this proves the checked
window under the driver's conditions. Usage:

    python tools/preflight_window.py [--sf /root/testdata/sf0.01] [-n 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

from datastream_processing_demo_spark.catalog import TABLE_NAMES, table_path
from datastream_processing_demo_spark.plans.registry import ordered_queries
from tools.selfcheck import compare


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-n", type=int, default=50,
                    help="window size (driver default 50)")
    args = ap.parse_args()

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for tbl in TABLE_NAMES:
        con.execute(f"CREATE OR REPLACE VIEW {tbl} AS "
                    f"SELECT * FROM read_parquet('{table_path(args.sf, tbl)}')")

    window = list(ordered_queries().items())[:args.n]
    n_pass = n_fail = n_rows = 0
    for name, spec in window:
        t0 = time.time()
        try:
            spdf = spec.spark(spark, args.sf).toPandas()
            if spec.oracle is None:
                n_rows += 1
                print(f"ROWS {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
                continue
            problems = compare(spdf, con.execute(spec.oracle).fetchdf())
        except Exception as e:  # noqa: BLE001
            problems = [f"{type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {problems}")
        else:
            n_pass += 1
            print(f"PASS {name} [{time.time()-t0:.1f}s]")

    print(f"\n== window preflight: {n_pass} pass, {n_fail} fail, "
          f"{n_rows} rows-only of {len(window)} at {args.sf}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

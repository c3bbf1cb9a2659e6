"""Self-check harness: run every registered query on Spark AND its DuckDB
oracle, compare row-count + schema(names) + order-insensitive values.

This replicates the driver's correctness gate locally so mismatches are
caught before a round ends. Usage:

    python tools/selfcheck.py [--sf /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from datastream_processing_demo_spark.catalog import TABLE_NAMES, table_path
from datastream_processing_demo_spark.session import EngineConfig, get_session
from datastream_processing_demo_spark.plans.registry import all_queries


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize: sort columns by name, normalize dtypes, sort rows.

    Deliberately replicates the DRIVER's canonicalizer failure mode: the
    driver runs ``pandas.sort_values`` over raw object columns, so any
    unhashable cell (list / ndarray / dict — i.e. a top-level
    array/map/struct output column) raises TypeError and the query goes
    driver-RED even when every value is correct. The pre-r6 selfcheck
    masked this by mapping list cells to tuples, which is exactly how
    text_tokenize_ids shipped red in CORRECTNESS_r05. Local green must
    imply driver green: fail loudly here instead.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.floor("us").astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif s.dtype == object:
            bad = s.map(lambda v: isinstance(v, (list, np.ndarray, dict)))
            if bad.any():
                raise TypeError(
                    f"column {c!r} holds unhashable cells "
                    f"(list/ndarray/dict) — the driver canonicalizer "
                    f"cannot sort/hash these; serialize to a scalar "
                    f"(e.g. array_join) in BOTH the Spark query and the "
                    f"oracle")
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(list(df.columns), ignore_index=True) if len(df) else df


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    def _is_na(v) -> bool:
        return v is None or v is pd.NA or v is pd.NaT or \
            (isinstance(v, float) and math.isnan(v))
    if _is_na(a) and _is_na(b):
        return True
    return a == b


def _dtype_class(s: pd.Series) -> str:
    """Broad dtype class. The driver's value hash is TYPE-sensitive: a Spark
    DOUBLE column whose values equal a DuckDB TINYINT column (e.g. signum vs
    sign, both ±1/0) hashes differently even though Python `==` says equal.
    That exact class of red survived rounds 1-3 invisibly; this check makes
    it fail locally. `object` is a wildcard (Decimals, dates, lists land
    there on both engines with engine-specific wrapping)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    for c in sc:
        ca, cb = _dtype_class(spark_pdf[c]), _dtype_class(oracle_pdf[c])
        if "object" not in (ca, cb) and ca != cb:
            problems.append(
                f"col {c}: dtype class spark={ca}({spark_pdf[c].dtype}) "
                f"oracle={cb}({oracle_pdf[c].dtype}) — driver hash is "
                f"type-sensitive; align the types on both sides")
    if problems:
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [i for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)]
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(av)} values differ; first at row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--category", default=None)
    ap.add_argument("--spark-conf", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="runtime Spark conf override (repeatable) — for "
                    "config-variation sweeps: a correct engine must give "
                    "identical answers with AQE off, odd shuffle widths, "
                    "codegen disabled, ...")
    args = ap.parse_args()

    specs = all_queries()
    if args.only:
        specs = {k: v for k, v in specs.items() if k in set(args.only)}
    if args.category:
        specs = {k: v for k, v in specs.items() if v.category == args.category}

    spark = get_session(EngineConfig(app_name="selfcheck"))
    for kv in args.spark_conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
        print(f"spark-conf override: {k}={v}")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')")

    n_pass = n_fail = n_noracle = 0
    failures = {}
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            sdf = spec.spark(spark, args.sf)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures[name] = f"SPARK ERROR: {type(e).__name__}: {e}"
            print(f"FAIL {name}: spark error {e}", flush=True)
            continue
        if spec.oracle is None:
            n_noracle += 1
            print(f"ROWS {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            opdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures[name] = f"ORACLE ERROR: {type(e).__name__}: {e}"
            print(f"FAIL {name}: oracle error {e}", flush=True)
            continue
        problems = compare(spdf, opdf)
        if problems:
            n_fail += 1
            failures[name] = "; ".join(problems)
            print(f"FAIL {name}: {failures[name]}", flush=True)
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spdf)} rows) [{time.time()-t0:.1f}s]", flush=True)

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only, "
          f"{len(specs)} total at {args.sf}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

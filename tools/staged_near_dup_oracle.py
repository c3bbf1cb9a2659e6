"""Staged evaluator for the embedding near-dup oracles at large SF
(VERDICT r11 task #5: the auto lane cut the SPARK side of the sf10
near-dup certification to ~4 min, but the sweep still paid ~26 min for
the registered oracle's own 78M-pair scan — and the r12 re-spec of
sim_embedding_near_dup at the banded production geometry roughly
quadruples that candidate volume).

Why the single statement is slow: the registered oracle computes SIX
64-dim list_dot_products per candidate pair (a.b, a.a, b.b — each
twice, once in the WHERE filter and once in the SELECT projection) and
streams every bucket's quadratic pair set through one pipeline.

What this runner changes — and ONLY this; every expression is the same
text as the registered oracle's CTEs (plans/similarity.py
sim_embedding_near_dup / sim_embedding_near_dup_auto):

1. vector norms precomputed ONCE per vector (sqrt(list_dot_product(v,v))
   is a per-vector scalar; the registered oracle re-derives it per
   PAIR). Same sqrt of the same dot — bit-identical divisor.
2. the pair cosine computed ONCE per pair (the registered oracle's
   WHERE and SELECT each evaluate the full expression; DuckDB does not
   CSE across clauses). Same expression text, same value.
3. candidate generation batched per (band, bucket) with INSERTs into a
   temp table — buckets partition each band, so the union over batches
   is exactly the registered oracle's bucket-join pair set, with
   per-batch memory bounded by one bucket's members. The cross-band
   DISTINCT of the banded lane runs over id-pairs only (integers), so
   vectors never ride the band explosion — the same argument as the
   Spark lane's plan shape.

Equivalence is not argued, it is ASSERTED: --verify runs this staged
evaluator AND the registered single-statement oracle at sf0.001 and
sf0.01 for both lanes and requires identical canonical results before
any large-SF verdict is trusted. At the target SF the staged oracle is
compared against the SPARK lane with the same canonicalizer the driver
uses (tools/selfcheck.compare).

Usage:
    python tools/staged_near_dup_oracle.py --verify
    python tools/staged_near_dup_oracle.py --sf /tmp/spark_graft_sf10 \
        [--only sim_embedding_near_dup sim_embedding_near_dup_auto]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from datastream_processing_demo_spark.catalog import TABLE_NAMES, table_path

THRESHOLD = 0.35

# (lane -> number of OR-amplified bands; B per band is the shared
# integer-exact corpus-sized rule below, mirroring auto_n_planes)
LANES = {
    "sim_embedding_near_dup": 4,
    "sim_embedding_near_dup_auto": 1,
}

# the registered oracles' nb expression, verbatim (integer-exact B —
# ADVICE r11; pinned equal to auto_n_planes in tests/test_llm_ops.py)
B_SQL = """
    SELECT CASE WHEN n <= 1024 THEN 4
           ELSE GREATEST(4, LEAST(48, (
               SELECT MIN(t.b)
               FROM (SELECT unnest(range(54)) AS b) t
               WHERE ((n + 1023) // 1024 - 1) >> t.b = 0))) END
    FROM (SELECT COUNT(*) AS n FROM t_e)"""


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def staged_near_dup(con: duckdb.DuckDBPyConnection, n_bands: int,
                    threshold: float = THRESHOLD,
                    progress: bool = False):
    """Evaluate the near-dup oracle in stages; returns a pandas frame
    with the registered oracle's output schema (doc_a, doc_b, cosine)."""
    t0 = time.time()

    def log(msg):
        if progress:
            print(f"  [{time.time()-t0:7.1f}s] {msg}", flush=True)

    con.execute("""CREATE OR REPLACE TEMP TABLE t_e AS
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings""")
    b = con.execute(B_SQL).fetchone()[0]
    log(f"corpus loaded; B = {b}, bands = {n_bands}")
    # per-vector norms, computed once (stage-split #1): the same
    # sqrt(list_dot_product(v, v)) the registered oracle derives per pair
    con.execute("""CREATE OR REPLACE TEMP TABLE t_en AS
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM t_e""")
    # bucket codes per (vec_id, band): the registered pl/bk CTEs verbatim
    # (global plane index q, band q // B, bit q % B)
    con.execute(f"""CREATE OR REPLACE TEMP TABLE t_bk AS
        WITH pl AS (SELECT q,
                        list_transform(range(64),
                            j -> CAST(((q * 31 + j * 17) % 13) - 6 AS DOUBLE))
                            AS plane
                    FROM (SELECT unnest(range({n_bands} *
                                              CAST({b} AS BIGINT))) AS q))
        SELECT e.vec_id,
               CAST(pl.q // {b} AS INT) AS band,
               SUM(CASE WHEN list_dot_product(e.v, pl.plane) > 0
                        THEN (CAST(1 AS BIGINT) << CAST(pl.q % {b} AS INT))
                        ELSE CAST(0 AS BIGINT) END) AS bucket
        FROM t_e e CROSS JOIN pl
        GROUP BY e.vec_id, CAST(pl.q // {b} AS INT)""")
    log("bucket codes done")

    con.execute("CREATE OR REPLACE TEMP TABLE t_cand "
                "(doc_a BIGINT, doc_b BIGINT)")
    buckets = con.execute("""
        SELECT band, bucket, COUNT(*) AS n FROM t_bk
        GROUP BY band, bucket HAVING COUNT(*) > 1
        ORDER BY n DESC""").fetchall()
    for i, (band, bucket, _n) in enumerate(buckets):
        con.execute(f"""INSERT INTO t_cand
            SELECT x.vec_id, y.vec_id
            FROM (SELECT vec_id FROM t_bk
                  WHERE band = {band} AND bucket = {bucket}) x
            JOIN (SELECT vec_id FROM t_bk
                  WHERE band = {band} AND bucket = {bucket}) y
              ON x.vec_id < y.vec_id""")
        if progress and (i + 1) % max(1, len(buckets) // 10) == 0:
            log(f"candidates: bucket {i+1}/{len(buckets)}")
    # cross-band DISTINCT over id pairs only (stage-split #3)
    con.execute("""CREATE OR REPLACE TEMP TABLE t_cand_d AS
        SELECT DISTINCT doc_a, doc_b FROM t_cand""")
    n_cand = con.execute("SELECT COUNT(*) FROM t_cand_d").fetchone()[0]
    log(f"candidates done: {n_cand} distinct pairs")

    # exact-cosine verify, one evaluation per distinct pair, batched by
    # doc_a residue so each pass stays bounded. Expression text matches
    # the registered oracle's, with the per-vector norm factored out.
    con.execute("CREATE OR REPLACE TEMP TABLE t_out "
                "(doc_a BIGINT, doc_b BIGINT, cosine DOUBLE)")
    n_batches = max(1, min(64, n_cand // 2_000_000 + 1))
    for r in range(n_batches):
        con.execute(f"""INSERT INTO t_out
            SELECT c.doc_a, c.doc_b,
                   ROUND(list_dot_product(ea.v, eb.v)
                         / (ea.nrm * eb.nrm), 6) AS cosine
            FROM (SELECT * FROM t_cand_d
                  WHERE doc_a % {n_batches} = {r}) c
            JOIN t_en ea ON c.doc_a = ea.vec_id
            JOIN t_en eb ON c.doc_b = eb.vec_id
            WHERE ROUND(list_dot_product(ea.v, eb.v)
                        / (ea.nrm * eb.nrm), 6) >= {threshold}""")
        if progress:
            log(f"verify: batch {r+1}/{n_batches}")
    out = con.execute(
        "SELECT doc_a, doc_b, cosine FROM t_out").fetchdf()
    log(f"verify done: {len(out)} pairs")
    return out


def _verify_small(sf_dir: str) -> bool:
    """Staged evaluator must reproduce the registered single-statement
    oracle bit-for-bit at a small SF for BOTH lanes."""
    from datastream_processing_demo_spark.plans.registry import all_queries
    from tools.selfcheck import compare
    ok = True
    specs = all_queries()
    con = _connect(sf_dir)
    for lane, n_bands in LANES.items():
        staged = staged_near_dup(con, n_bands)
        registered = con.execute(specs[lane].oracle).fetchdf()
        problems = compare(staged, registered)
        status = "OK" if not problems else f"MISMATCH: {problems}"
        print(f"verify {lane} at {sf_dir}: {status}", flush=True)
        ok = ok and not problems
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/spark_graft_sf10")
    ap.add_argument("--only", nargs="*", default=list(LANES))
    ap.add_argument("--verify", action="store_true",
                    help="only check staged == registered oracle at "
                         "sf0.001 and sf0.01")
    args = ap.parse_args()

    if args.verify:
        ok = all(_verify_small(sf)
                 for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
        return 0 if ok else 1

    # verify first — a large-SF verdict from an unproven evaluator is
    # worthless
    if not all(_verify_small(sf)
               for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")):
        print("staged evaluator does not match the registered oracle; "
              "refusing the large-SF run")
        return 1

    from datastream_processing_demo_spark.plans.registry import all_queries
    from datastream_processing_demo_spark.session import (
        EngineConfig,
        get_session,
    )
    from tools.selfcheck import compare
    specs = all_queries()
    spark = get_session(EngineConfig(app_name="staged-near-dup-sweep"))
    con = _connect(args.sf)
    n_fail = 0
    for lane in args.only:
        t0 = time.time()
        spdf = specs[lane].spark(spark, args.sf).toPandas()
        t_spark = time.time() - t0
        print(f"{lane}: spark side {len(spdf)} rows [{t_spark:.1f}s]",
              flush=True)
        t0 = time.time()
        opdf = staged_near_dup(con, LANES[lane], progress=True)
        t_oracle = time.time() - t0
        problems = compare(spdf, opdf)
        if problems:
            n_fail += 1
            print(f"FAIL {lane}: {problems}", flush=True)
        else:
            print(f"PASS {lane} ({len(spdf)} rows) "
                  f"[spark {t_spark:.1f}s, staged oracle {t_oracle:.1f}s]",
                  flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

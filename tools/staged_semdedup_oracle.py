"""Staged evaluator for the sim_semdedup / sim_semdedup_auto oracles at
large SF (VERDICT r10 task #1: the sf10 oracle sweep's blocker is
ORACLE-side cost, not engine cost).

Why: the registered single-statement oracle OOMs DuckDB at sf10 — its
two nearest-cell assignments are row_number windows over a
(corpus x n_cells) cross join whose rows carry 64-double lists, and the
within-cell pair join streams ~TB through one pipeline (measured: OOM at
a 32 GiB allocation with 99/100.6 GiB used, after ~70 min).

What this runner changes — and ONLY this; every expression is the same
text as the registered oracle's CTEs (plans/similarity._semdedup_oracle):

1. nearest-cell assignment computed as MIN(struct(l2, cell_id, ...))
   per vec_id instead of a row_number()-over-window pick. Lexicographic
   struct MIN on (l2, cell_id) is the same selection as
   ORDER BY l2, cell_id ... rn = 1 — a streaming hash aggregate of
   |corpus| groups replaces a full materialize-and-sort of the cross
   join.
2. pair generation batched per cell (INSERT ... WHERE cell_id = c, one
   cell at a time). The cells partition the corpus, so the union over
   cells is exactly the registered oracle's within-cell pair set, with
   per-batch memory bounded by one cell's members.
3. the duplicate-component labels (cluster_id = min reachable vec_id
   over the pair graph) computed by a driver-side union-find over the
   materialized pair table instead of the recursive `reach` CTE. The
   fixpoint is identical (min label in each connected component); the
   recursive CTE materializes |component|^2 (node, label) rows, which
   is infeasible if a giant component appears at scale, while
   union-find is linear.

Equivalence is not argued, it is ASSERTED: --verify runs this staged
evaluator AND the registered single-statement oracle at sf0.001 and
sf0.01 for both lanes and requires identical canonical results before
any large-SF verdict is trusted. At the target SF the staged oracle is
compared against the SPARK lane with the same canonicalizer the driver
uses (tools/selfcheck.compare).

Usage:
    python tools/staged_semdedup_oracle.py --verify
    python tools/staged_semdedup_oracle.py --sf /tmp/spark_graft_sf10 \
        [--only sim_semdedup sim_semdedup_auto]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from datastream_processing_demo_spark.catalog import TABLE_NAMES, table_path
from datastream_processing_demo_spark.plans.similarity import _l2_dot_form

THRESHOLD = 0.35


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def _union_find_min_labels(pairs) -> dict:
    """cluster_id = min vec_id reachable in the pair graph — the same
    fixpoint as the registered oracle's recursive `reach` CTE."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def staged_semdedup(con: duckdb.DuckDBPyConnection, n_cells_sql: str,
                    threshold: float = THRESHOLD,
                    progress: bool = False):
    """Evaluate the semdedup oracle in stages; returns a pandas frame
    with the registered oracle's output schema
    (vec_id, cell_id, cluster_id, is_kept)."""
    t0 = time.time()

    def log(msg):
        if progress:
            print(f"  [{time.time()-t0:7.1f}s] {msg}", flush=True)

    con.execute("""CREATE OR REPLACE TEMP TABLE t_e AS
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings""")
    n_cells = con.execute(
        f"SELECT {n_cells_sql} FROM t_e").fetchone()[0]
    log(f"corpus loaded; n_cells = {n_cells}")
    con.execute(f"""CREATE OR REPLACE TEMP TABLE t_seeds AS
        SELECT row_number() OVER (ORDER BY vec_id) AS cell_id, v AS sv
        FROM (SELECT vec_id, v FROM t_e ORDER BY vec_id LIMIT {n_cells})""")
    # Lloyd round 1: assign to nearest seed (MIN-struct == the window's
    # ORDER BY l2, cell_id pick), then integer-grid per-dimension means
    con.execute(f"""CREATE OR REPLACE TEMP TABLE t_a0 AS
        SELECT e.vec_id,
               MIN({{'l2': {_l2_dot_form('e.v', 's.sv')},
                     'cid': s.cell_id}}) AS m
        FROM t_e e CROSS JOIN t_seeds s GROUP BY e.vec_id""")
    log("seed assignment done")
    con.execute("""CREATE OR REPLACE TEMP TABLE t_cvec AS
        WITH elem AS (
            SELECT a.m.cid AS cell_id,
                   generate_subscripts(e.v, 1) - 1 AS pos, unnest(e.v) AS x
            FROM t_a0 a JOIN t_e e USING (vec_id)),
        cmean AS (
            SELECT cell_id, pos,
                   CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m
            FROM elem GROUP BY cell_id, pos)
        SELECT cell_id, list(m ORDER BY pos) AS cm
        FROM cmean GROUP BY cell_id""")
    log("centroids done")
    con.execute(f"""CREATE OR REPLACE TEMP TABLE t_member AS
        SELECT a.vec_id, e.v, a.m.cid AS cell_id, a.m.dr AS dist_r
        FROM (SELECT e.vec_id,
                     MIN({{'l2': {_l2_dot_form('e.v', 'c.cm')},
                           'cid': c.cell_id,
                           'dr': CAST(ROUND(({_l2_dot_form('e.v', 'c.cm')})
                                            * 1000000.0) AS BIGINT)}}) AS m
              FROM t_e e CROSS JOIN t_cvec c GROUP BY e.vec_id) a
        JOIN t_e e USING (vec_id)""")
    log("final assignment done")

    con.execute("CREATE OR REPLACE TEMP TABLE t_pairs "
                "(id_a BIGINT, id_b BIGINT)")
    cells = [r[0] for r in con.execute(
        "SELECT cell_id, COUNT(*) AS n FROM t_member "
        "GROUP BY cell_id ORDER BY n DESC").fetchall()]
    cos = ("ROUND(list_dot_product(x.v, y.v) "
           "/ (sqrt(list_dot_product(x.v, x.v)) "
           "* sqrt(list_dot_product(y.v, y.v))), 6)")
    for i, c in enumerate(cells):
        con.execute(f"""INSERT INTO t_pairs
            SELECT x.vec_id, y.vec_id
            FROM (SELECT vec_id, v FROM t_member WHERE cell_id = {c}) x
            JOIN (SELECT vec_id, v FROM t_member WHERE cell_id = {c}) y
              ON x.vec_id < y.vec_id
            WHERE list_dot_product(x.v, x.v) > 0
              AND list_dot_product(y.v, y.v) > 0
              AND {cos} >= {threshold}""")
        if progress and (i + 1) % max(1, len(cells) // 10) == 0:
            log(f"pairs: cell {i+1}/{len(cells)}")
    n_pairs = con.execute("SELECT COUNT(*) FROM t_pairs").fetchone()[0]
    log(f"pairs done: {n_pairs}")

    labels = _union_find_min_labels(
        con.execute("SELECT id_a, id_b FROM t_pairs").fetchall())
    con.execute("CREATE OR REPLACE TEMP TABLE t_comp "
                "(node BIGINT, cluster_id BIGINT)")
    if labels:
        con.executemany("INSERT INTO t_comp VALUES (?, ?)",
                        list(labels.items()))
    log(f"components done: {len(labels)} labeled nodes")

    out = con.execute("""
        WITH labeled AS (
            SELECT m.vec_id, m.cell_id,
                   COALESCE(c.cluster_id, m.vec_id) AS cluster_id, m.dist_r
            FROM t_member m LEFT JOIN t_comp c ON m.vec_id = c.node),
        ranked AS (
            SELECT vec_id, cell_id, cluster_id,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY dist_r DESC, vec_id) AS rn
            FROM labeled)
        SELECT vec_id, cell_id, cluster_id, rn = 1 AS is_kept
        FROM ranked""").fetchdf()
    log("final ranking done")
    return out


# (lane name -> n_cells scalar SQL evaluated over t_e, mirroring the
# registered oracles' seeds CTEs: fixed 16, and the auto_n_cells rule)
LANES = {
    "sim_semdedup": "16",
    "sim_semdedup_auto": ("GREATEST(4, LEAST(65536, "
                          "CAST(CEIL(COUNT(*) / 256.0) AS BIGINT)))"),
}


def _verify_small(sf_dir: str) -> bool:
    """Staged evaluator must reproduce the registered single-statement
    oracle bit-for-bit at a small SF for BOTH lanes."""
    from datastream_processing_demo_spark.plans.registry import all_queries
    from tools.selfcheck import compare
    ok = True
    specs = all_queries()
    con = _connect(sf_dir)
    for lane, ncs in LANES.items():
        staged = staged_semdedup(con, ncs)
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
    spark = get_session(EngineConfig(app_name="staged-semdedup-sweep"))
    con = _connect(args.sf)
    n_fail = 0
    for lane in args.only:
        t0 = time.time()
        spdf = specs[lane].spark(spark, args.sf).toPandas()
        t_spark = time.time() - t0
        print(f"{lane}: spark side {len(spdf)} rows [{t_spark:.1f}s]",
              flush=True)
        t0 = time.time()
        opdf = staged_semdedup(con, LANES[lane], progress=True)
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

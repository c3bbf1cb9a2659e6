"""Unit tests for the as-of join and connected-components operators
against hand-computed fixtures (no table in the reference exercises
these; semantics defined in the operator docstrings)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from datastream_processing_demo_spark.operators.asof import asof_join
from datastream_processing_demo_spark.operators.components import (
    min_label_components,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00")),   # after both views
         (2, "u1", _ts("2024-01-01T08:30:00")),   # between views
         (3, "u1", _ts("2024-01-01T07:00:00")),   # before any view -> NULL
         (4, "u2", _ts("2024-01-01T09:00:00")),   # exactly-simultaneous view
         (5, "u3", _ts("2024-01-01T09:00:00"))],  # user with no views -> NULL
        "purchase_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T08:00:00"), 100),
         ("u1", _ts("2024-01-01T09:00:00"), 101),
         ("u2", _ts("2024-01-01T09:00:00"), 200),
         ("u2", _ts("2024-01-01T09:00:00"), 201)],  # tie -> max tiebreak
        "user_id string, ts timestamp, view_id long")
    out = asof_join(left, right, on="user_id", ts="ts",
                    payload=["view_id"], tiebreak="view_id")
    got = {r["purchase_id"]: r["view_id"] for r in out.collect()}
    assert got == {1: 101, 2: 100, 3: None, 4: 201, 5: None}


def test_asof_join_matches_sql_lateral(spark, sf_dir, oracle_con):
    """Operator output == the LATERAL-subquery definition on real data."""
    from datastream_processing_demo_spark.plans.registry import get
    spec = get("join_asof_attribution")
    spdf = spec.spark(spark, sf_dir).toPandas()
    oracle = oracle_con.execute(spec.oracle).fetchdf()
    assert len(spdf) == len(oracle)
    assert spdf["view_id"].notna().sum() == oracle["view_id"].notna().sum()


def test_components_chain_and_pair(spark):
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7),      # chain 1-2-3-7 -> cluster 1
         (10, 11),                    # pair -> cluster 10
         (20, 21), (21, 20)],         # duplicate/reversed edges collapse
        "doc_a long, doc_b long")
    out = min_label_components(edges, src="doc_a", dst="doc_b")
    got = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_hash_magnitude_and_string_ids(spark):
    """The convergence probe must survive node ids near 2^62 (a label
    SUM would overflow under ANSI) and non-numeric label types — both
    arise when nodes are xxhash64 buckets or string doc keys."""
    big = 1 << 62
    edges = spark.createDataFrame(
        [(big, big + 1), (big + 1, big + 2), (5, 6)],
        "doc_a long, doc_b long")
    out = min_label_components(edges, src="doc_a", dst="doc_b")
    got = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert got == {big: big, big + 1: big, big + 2: big, 5: 5, 6: 5}

    sedges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string")
    sout = min_label_components(sedges, src="doc_a", dst="doc_b")
    sgot = {r["node"]: r["cluster_id"] for r in sout.collect()}
    assert sgot == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_components_converges_on_long_chain(spark):
    n = 12  # diameter > default few rounds; propagation must iterate
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long")
    out = min_label_components(edges, src="doc_a", dst="doc_b")
    labels = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == n + 1


def test_cluster_canonical_covers_all_paired_docs(spark, sf_dir):
    """Every doc in a >=0.5-Jaccard pair appears exactly once, and each
    cluster has exactly one canonical member = its min doc_id."""
    from datastream_processing_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from datastream_processing_demo_spark.plans.registry import get
    from datastream_processing_demo_spark.plans._util import t
    pairs = ngram_jaccard_pairs(t(spark, sf_dir, "documents"),
                                threshold=0.5, n=3).select("doc_a", "doc_b")
    paired_docs = set(
        r[0] for r in pairs.select(F.explode(F.array("doc_a", "doc_b")))
        .distinct().collect())
    rows = get("dedup_cluster_canonical").spark(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == paired_docs
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        assert sum(m["is_canonical"] for m in members) == 1


def test_interval_overlap_join_width_invariant_and_matches_theta(spark, sf_dir):
    # The bucket rewrite's contract: results are IDENTICAL for any
    # bucket width, and identical to the naive theta join (the
    # semantics), which is only affordable as ground truth at sf0.001.
    from datastream_processing_demo_spark.catalog import load_table
    from datastream_processing_demo_spark.operators.intervals import (
        interval_overlap_join,
    )
    from datastream_processing_demo_spark.streaming.windows import (
        session_windows,
    )

    e = load_table(spark, sf_dir, "events")
    sessions = session_windows(e, gap="30 minutes").select(
        "session_start", "session_end")
    points = (e.filter(F.col("event_type") == "purchase")
              .select("event_id", F.col("ts").alias("purchase_ts")))

    def key(df):
        return sorted(
            (r["event_id"], r["session_start"], r["session_end"])
            for r in df.collect())

    truth = key(points.alias("p").crossJoin(sessions.alias("s")).filter(
        (F.col("purchase_ts") >= F.col("session_start"))
        & (F.col("purchase_ts") < F.col("session_end"))))
    assert truth, "fixture must produce at least one overlap"
    for width_s in (600, 3600, 6 * 3600):
        got = key(interval_overlap_join(
            points, sessions, point_ts="purchase_ts",
            start="session_start", end="session_end", width_s=width_s))
        assert got == truth, f"width_s={width_s} diverged from theta join"


def test_blocked_components_match_iterative(spark):
    """blocked_components (per-block union-find, one shuffle) must
    produce exactly the min-label fixpoint of the iterative propagation
    on any blocked graph — chains, pairs, singdup-free blocks, and a
    block whose chain is long enough to need several iterative rounds."""
    import random

    from datastream_processing_demo_spark.operators.components import (
        blocked_components,
        min_label_components,
    )
    rng = random.Random(11)
    rows = []
    for blk in range(6):
        base = blk * 1000
        # random chain segments + random extra edges, all within block
        nodes = [base + i for i in range(rng.randint(2, 30))]
        for a, b in zip(nodes, nodes[1:]):
            if rng.random() < 0.7:
                rows.append((blk, a, b))
        for _ in range(rng.randint(0, 10)):
            rows.append((blk, rng.choice(nodes), rng.choice(nodes)))
    rows = [(b, s, d) for b, s, d in rows if s != d]
    edges = spark.createDataFrame(rows, "blk long, src long, dst long")
    got = {(r["node"], r["cluster_id"])
           for r in blocked_components(edges, "blk").collect()}
    want = {(r["node"], r["cluster_id"])
            for r in min_label_components(edges, max_iter=100).collect()}
    assert got == want


def test_interval_join_degenerate_interval_matches_nothing(spark):
    """end <= start covers no instant (end-exclusive) — without the
    guard its bucket sequence(lo, hi) is DESCENDING (the r5 fuzzer bug
    class) and emits phantom buckets."""
    import datetime

    from datastream_processing_demo_spark.operators.intervals import (
        interval_overlap_join,
    )
    t0 = datetime.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(1, t0), (2, t0 + datetime.timedelta(hours=1))], "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(10, t0, t0),                                        # zero-length
         (11, t0 + datetime.timedelta(hours=2), t0),          # inverted
         (12, t0, t0 + datetime.timedelta(hours=3))],         # real
        "iid long, s timestamp, e timestamp")
    got = {(r["pid"], r["iid"]) for r in interval_overlap_join(
        points, intervals, point_ts="ts", start="s", end="e",
        width_s=600).collect()}
    assert got == {(1, 12), (2, 12)}


def test_frames_col_empty_payload(spark):
    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.operators.multimodal import frames_col
    rows = (spark.createDataFrame([("",), ("ab",)], "text string")
            .select(F.size(frames_col("text")).alias("n")).collect())
    assert [r["n"] for r in rows] == [0, 1]


def _uf_truth(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_alternating_components_match_union_find(spark):
    """Differential fuzz (r10): large-star/small-star vs a driver-side
    union-find on sparse random graphs — the case class where min-label
    at its default round budget went silently stale (the bug this fuzz
    found; min_label now raises instead)."""
    import random

    from datastream_processing_demo_spark.operators.components import (
        alternating_components,
    )
    rng = random.Random(7)
    for trial in range(3):
        n = 200
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["cluster_id"]
               for r in alternating_components(df).collect()}
        assert got == _uf_truth(edges), f"trial {trial}"


def test_alternating_components_diameter_independent_rounds(spark):
    """A 128-node path needs 127 min-label rounds; the alternating
    rounds must finish it inside a LOG-scale budget — the property that
    makes the lane the planet-scale swap."""
    from datastream_processing_demo_spark.operators.components import (
        alternating_components,
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(127)], "src long, dst long")
    out = alternating_components(edges, max_iter=12)
    labels = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 128


def test_min_label_raises_loudly_past_round_budget(spark):
    """Pre-r10, min-label returned silently-wrong labels when the graph
    diameter exceeded max_iter. It must refuse instead."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(edges, src="src", dst="dst", max_iter=5)


def test_alternating_components_self_loop_singletons(spark):
    """ADVICE r10: nodes appearing ONLY in self-loop edges must come
    back as their own singleton cluster (the min-label contract: one
    row per node appearing in any edge), and self-loops on nodes that
    also have real edges must not add a second row."""
    from datastream_processing_demo_spark.operators.components import (
        alternating_components,
        min_label_components,
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 2), (7, 7), (9, 9)], "src long, dst long")
    got = {r["node"]: r["cluster_id"]
           for r in alternating_components(edges).collect()}
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}
    rows = alternating_components(edges).collect()
    assert len(rows) == 4, "exactly one row per node appearing in any edge"
    # min-label agrees on the same input (self-loops symmetrize to
    # (n, n), so the node enters the label table and keeps itself)
    ml = {r["node"]: r["cluster_id"]
          for r in min_label_components(edges, src="src", dst="dst").collect()}
    assert ml == got


def test_alternating_components_raises_past_round_budget(spark):
    """ADVICE r10: an unstabilized edge set must refuse, not return a
    node with multiple cluster_ids (same fail-loud contract min-label
    got in r10)."""
    import pytest

    from datastream_processing_demo_spark.operators.components import (
        alternating_components,
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(127)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        alternating_components(edges, max_iter=1)

"""Differential fuzzing of the scalar-expression surface: hypothesis
generates random expression trees from a constrained ANSI-common
grammar (integer arithmetic, comparisons, boolean logic, CASE,
coalesce/nullif, string predicates, EXTRACT) and every tree is executed
by BOTH engines — Spark SQL over the engine's catalog and DuckDB over
the same parquet — and compared row-for-row.

This is the test-strategy complement of the per-query oracle gate
(tests/test_oracle_queries.py): the oracle gate proves the ~200
hand-written queries; the fuzzer walks the expression space BETWEEN
those queries, where dialect divergence hides (rounding, NULL
propagation, sign of %, implicit casts). The grammar is deliberately
restricted to constructs with identical documented semantics in Spark
ANSI mode and DuckDB:

- integer + - * with magnitude tracking (no overflow: every node's
  worst-case |value| is bounded during generation and multiplication
  is only emitted while the product bound stays under 2^50 — Spark
  ANSI throws on int64 overflow, DuckDB widens to int128);
- % only by positive literals (both engines: remainder takes the sign
  of the dividend);
- no division (Spark `div` vs DuckDB `//` spell integer division
  differently), no doubles (representation noise), no regex (flavor
  differences);
- NULLs enter only via nullif() and must drain through coalesce() or
  CASE, both three-valued-logic identical.

Failures are real engine-semantics divergences by construction, and
hypothesis shrinks them to a minimal expression. Runs derandomized
(fixed example sequence) so CI is deterministic; crank
SPARK_GRAFT_FUZZ_EXAMPLES up for a deeper local sweep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datastream_processing_demo_spark.catalog import load_table

MAX_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "25"))
# Spark ANSI throws on int64 overflow; DuckDB silently widens to
# int128. Keep every node's provable |value| bound far below 2^63 so
# both engines stay in int64 and agree.
MUL_BOUND = 2 ** 50
ADD_BOUND = 2 ** 55

# integer leaves: (sql, worst-case |value| bound); column refs are
# modded to small ranges so products stay bounded
_INT_LEAVES: list[tuple[str, int]] = [
    # every leaf is pinned to BIGINT: Spark's EXTRACT/length return
    # 32-bit INT and ANSI mode throws on int32 overflow mid-expression,
    # while DuckDB computes the same tree in BIGINT — a genuine dialect
    # trap this harness itself surfaced (shrunk example:
    # YEAR * (2 + YEAR * YEAR) ≈ 8e9 > int32). With BIGINT leaves both
    # engines do 64-bit arithmetic and the MUL_BOUND guard is what
    # keeps that from overflowing.
    ("(l_orderkey % 97)", 97),
    ("(l_partkey % 53)", 53),
    ("(l_suppkey % 29)", 29),
    ("CAST(l_linenumber AS BIGINT)", 7),
    ("CAST(length(l_returnflag || l_linestatus) AS BIGINT)", 2),
    ("CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)", 2000),
    ("CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT)", 12),
    ("CAST(EXTRACT(DAY FROM l_shipdate) AS BIGINT)", 31),
    ("CAST(0 AS BIGINT)", 1), ("CAST(1 AS BIGINT)", 1),
    ("CAST(2 AS BIGINT)", 2), ("CAST(7 AS BIGINT)", 7),
    ("CAST(13 AS BIGINT)", 13),
]

_STR_PREDICATES = [
    "l_returnflag = 'R'",
    "l_returnflag <> 'A'",
    "l_linestatus IN ('O', 'F')",
    "l_returnflag < l_linestatus",
    "substr(l_returnflag, 1, 1) = 'N'",
]

_CMP_OPS = ["=", "<>", "<", "<=", ">", ">="]


@st.composite
def _int_expr(draw, depth: int = 3) -> tuple[str, int]:
    """Returns (sql, bound) where |value| <= bound on every row."""
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(_INT_LEAVES))
    kind = draw(st.sampled_from(
        ["add", "sub", "mul", "mod", "case", "coalesce_nullif"]))
    if kind in ("add", "sub", "mul"):
        a_sql, a_b = draw(_int_expr(depth=depth - 1))
        b_sql, b_b = draw(_int_expr(depth=depth - 1))
        if kind == "mul" and a_b * b_b <= MUL_BOUND:
            return f"({a_sql} * {b_sql})", a_b * b_b
        if a_b + b_b <= ADD_BOUND:
            op = "-" if kind == "sub" else "+"
            return f"({a_sql} {op} {b_sql})", a_b + b_b
        return a_sql, a_b
    if kind == "mod":
        a_sql, a_b = draw(_int_expr(depth=depth - 1))
        k = draw(st.integers(2, 50))
        # both engines: sign of a % k follows the dividend
        return f"({a_sql} % {k})", k
    if kind == "case":
        cond = draw(_bool_expr(depth=depth - 1))
        a_sql, a_b = draw(_int_expr(depth=depth - 1))
        b_sql, b_b = draw(_int_expr(depth=depth - 1))
        return (f"(CASE WHEN {cond} THEN {a_sql} ELSE {b_sql} END)",
                max(a_b, b_b))
    # coalesce_nullif: manufactures NULLs, then drains them — both
    # engines' nullif/coalesce are exactly SQL-standard
    a_sql, a_b = draw(_int_expr(depth=depth - 1))
    b_sql, b_b = draw(_int_expr(depth=depth - 1))
    c_sql, c_b = draw(_int_expr(depth=depth - 1))
    return (f"coalesce(nullif({a_sql}, {b_sql}), {c_sql})",
            max(a_b, c_b))


@st.composite
def _bool_expr(draw, depth: int = 2) -> str:
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        if draw(st.booleans()):
            return draw(st.sampled_from(_STR_PREDICATES))
        a_sql, _ = draw(_int_expr(depth=1))
        b_sql, _ = draw(_int_expr(depth=1))
        op = draw(st.sampled_from(_CMP_OPS))
        return f"({a_sql} {op} {b_sql})"
    kind = draw(st.sampled_from(["and", "or", "not"]))
    a = draw(_bool_expr(depth=depth - 1))
    if kind == "not":
        return f"(NOT {a})"
    b = draw(_bool_expr(depth=depth - 1))
    return f"({a} {'AND' if kind == 'and' else 'OR'} {b})"


@pytest.fixture(scope="module")
def fuzz_ctx(spark, sf_dir, oracle_con):
    # Reuse the conftest oracle connection (its `lineitem` view +
    # TimeZone canonicalization are THE oracle conventions; a private
    # connection here would silently fork them). Spark side registers
    # the same real-named temp view register_views() uses, cached for
    # the duration of the fuzz module. n_rows feeds the SUM-overflow
    # guard so the bound scales with whatever SF the suite runs at.
    li = load_table(spark, sf_dir, "lineitem").cache()
    li.createOrReplaceTempView("lineitem")
    n_rows = li.count()  # also materializes the cache once
    yield spark, oracle_con, n_rows
    li.unpersist()


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_int_expr())
def test_scalar_expressions_agree(fuzz_ctx, expr):
    spark, con, n_rows = fuzz_ctx
    sql_txt, _bound = expr
    # (l_orderkey, l_linenumber) is NOT unique in the driver testdata,
    # so no SQL ORDER BY is total here; sort the full tuples in Python
    # (None-aware) to compare order-independently.
    q = (f"SELECT l_orderkey, l_linenumber, {sql_txt} AS v "
         f"FROM lineitem")
    key = lambda r: (r[0], r[1], r[2] is None, r[2])  # noqa: E731
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=key)
    want = sorted(con.execute(q).fetchall(), key=key)
    assert got == want, f"divergence for expression: {sql_txt}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(cond=_bool_expr(depth=3))
def test_predicate_cardinality_agrees(fuzz_ctx, cond):
    # the filter path: the SAME predicate must select the SAME rows
    # (checked as id-sum + count so the comparison is order-free)
    spark, con, n_rows = fuzz_ctx
    q = (f"SELECT COUNT(*) AS n, "
         f"coalesce(SUM(l_orderkey * 10 + l_linenumber), 0) AS idsum "
         f"FROM lineitem WHERE {cond}")
    g = spark.sql(q).collect()[0]
    w = con.execute(q).fetchone()
    assert (g["n"], g["idsum"]) == (w[0], w[1]), \
        f"divergence for predicate: {cond}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_int_expr(), cond=_bool_expr(depth=2))
def test_grouped_aggregates_agree(fuzz_ctx, expr, cond):
    # the hash-aggregate path: group by a column AND a fuzzed boolean
    # key, aggregate a fuzzed integer expression. SUM over 6k rows
    # must stay under int64 whatever SF the suite runs at, so the
    # per-row bound is derived from the actual row count (DuckDB widens
    # SUM to int128 and would mask a Spark-side ANSI overflow).
    from hypothesis import assume
    spark, con, n_rows = fuzz_ctx
    sql_txt, bound = expr
    assume(bound <= (2 ** 62) // max(n_rows, 1))
    q = (f"SELECT l_returnflag, {cond} AS k2, COUNT(*) AS n, "
         f"SUM({sql_txt}) AS s, MIN({sql_txt}) AS mn, "
         f"MAX({sql_txt}) AS mx, "
         f"COUNT(DISTINCT {sql_txt}) AS nd "
         f"FROM lineitem GROUP BY l_returnflag, {cond}")
    got = sorted(tuple(r) for r in spark.sql(q).collect())
    want = sorted(tuple(r) for r in con.execute(q).fetchall())
    assert got == want, f"divergence for agg of {sql_txt} by {cond}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_int_expr(), cond=_bool_expr(depth=1))
def test_window_partition_aggregates_agree(fuzz_ctx, expr, cond):
    # the Window exec path: partition-only frames (no ORDER BY => the
    # frame is the whole partition) are deterministic per row even with
    # duplicate keys, so they fuzz cleanly. Partition by a fuzzed
    # boolean key to vary partition shapes; same row-count-derived
    # sum bound as the grouped-aggregate lane.
    from hypothesis import assume
    spark, con, n_rows = fuzz_ctx
    sql_txt, bound = expr
    assume(bound <= (2 ** 62) // max(n_rows, 1))
    q = (f"SELECT l_orderkey, l_linenumber, "
         f"SUM({sql_txt}) OVER (PARTITION BY l_returnflag, {cond}) AS ws, "
         f"COUNT(*) OVER (PARTITION BY l_returnflag, {cond}) AS wn, "
         f"MIN({sql_txt}) OVER (PARTITION BY {cond}) AS wmn "
         f"FROM lineitem")
    got = sorted(tuple(r) for r in spark.sql(q).collect())
    want = sorted(tuple(r) for r in con.execute(q).fetchall())
    assert got == want, f"divergence for window agg of {sql_txt} by {cond}"


# string grammar: constructs whose semantics are identical in Spark
# ANSI mode and DuckDB (no collation surprises: ASCII-only inputs, no
# regex, substr with 1-based positive start only)
_STR_LEAVES = [
    "l_returnflag", "l_linestatus",
    "(l_returnflag || l_linestatus)",
    "'x'", "''", "'AB'",
]


@st.composite
def _str_expr(draw, depth: int = 3) -> str:
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(_STR_LEAVES))
    kind = draw(st.sampled_from(
        ["concat", "upper", "lower", "substr", "trim", "replace", "case"]))
    a = draw(_str_expr(depth=depth - 1))
    if kind == "concat":
        b = draw(_str_expr(depth=depth - 1))
        return f"({a} || {b})"
    if kind in ("upper", "lower", "trim"):
        return f"{kind}({a})"
    if kind == "substr":
        start = draw(st.integers(1, 3))
        ln = draw(st.integers(0, 4))
        return f"substr({a}, {start}, {ln})"
    if kind == "replace":
        b = draw(st.sampled_from(["'A'", "'N'", "'x'"]))
        c = draw(st.sampled_from(["'z'", "''", "'yy'"]))
        return f"replace({a}, {b}, {c})"
    cond = draw(_bool_expr(depth=1))
    b = draw(_str_expr(depth=depth - 1))
    return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_str_expr())
def test_string_expressions_agree(fuzz_ctx, expr):
    # the string codegen path, compared as exact values (order-free via
    # the same None-aware full-tuple sort as the scalar lane)
    spark, con, n_rows = fuzz_ctx
    q = (f"SELECT l_orderkey, l_linenumber, {expr} AS v "
         f"FROM lineitem")
    key = lambda r: (r[0], r[1], r[2] is None, r[2])  # noqa: E731
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=key)
    want = sorted(con.execute(q).fetchall(), key=key)
    assert got == want, f"divergence for string expression: {expr}"


# ---- lane 6: ORDERED window functions over events ----
# events.event_id is UNIQUE (unlike lineitem's key pair), so ORDER BY
# event_id is a total order and running/offset window functions are
# fully deterministic — the one place ordered frames CAN be fuzzed.

_EV_INT_LEAVES = [
    "(event_id % 83)", "(user_id % 37)",
    "CAST(length(event_type) AS BIGINT)",
    "CAST(1 AS BIGINT)", "CAST(5 AS BIGINT)",
]

_EV_PREDICATES = [
    "event_type = 'purchase'",
    "event_type IN ('view', 'click')",
    "(user_id % 2) = 0",
    "(event_id % 7) < 3",
]


@st.composite
def _ev_window_expr(draw) -> str:
    part = draw(st.sampled_from(_EV_PREDICATES))
    order = "ORDER BY event_id"
    ie = draw(st.sampled_from(_EV_INT_LEAVES))
    kind = draw(st.sampled_from(
        ["running_sum", "framed_sum", "running_min", "lag", "lead",
         "row_number"]))
    over = f"OVER (PARTITION BY {part} {order}"
    if kind == "running_sum":
        return (f"SUM({ie}) {over} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    if kind == "framed_sum":
        lo = draw(st.integers(0, 3))
        return (f"SUM({ie}) {over} "
                f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW)")
    if kind == "running_min":
        return (f"MIN({ie}) {over} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    if kind == "lag":
        off = draw(st.integers(1, 3))
        return f"LAG({ie}, {off}) {over})"
    if kind == "lead":
        off = draw(st.integers(1, 3))
        return f"LEAD({ie}, {off}) {over})"
    return f"ROW_NUMBER() {over})"


@pytest.fixture(scope="module")
def fuzz_events_ctx(spark, sf_dir, oracle_con):
    ev = load_table(spark, sf_dir, "events").cache()
    ev.createOrReplaceTempView("events")
    ev.count()
    yield spark, oracle_con
    ev.unpersist()


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(wexpr=_ev_window_expr())
def test_ordered_window_functions_agree(fuzz_events_ctx, wexpr):
    spark, con = fuzz_events_ctx
    q = f"SELECT event_id, {wexpr} AS v FROM events"
    key = lambda r: r[0]  # noqa: E731  (event_id unique => total order)
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=key)
    want = sorted(con.execute(q).fetchall(), key=key)
    assert got == want, f"divergence for window expression: {wexpr}"


# ---- lane 7: the JOIN path ----
# equi-join lineitem x orders with fuzzed predicates on BOTH sides,
# compared through order-free aggregates (inner + left join: the left
# join additionally pins NULL-extension behavior via a null-count).

_ORD_PREDICATES = [
    "o_orderstatus = 'F'",
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "(o_custkey % 3) = 1",
    "EXTRACT(YEAR FROM o_orderdate) >= 1995",
    "(o_orderkey % 5) < 2",
]


@pytest.fixture(scope="module")
def fuzz_join_ctx(spark, sf_dir, oracle_con):
    li = load_table(spark, sf_dir, "lineitem").cache()
    li.createOrReplaceTempView("lineitem")
    o = load_table(spark, sf_dir, "orders").cache()
    o.createOrReplaceTempView("orders")
    li.count(), o.count()
    yield spark, oracle_con
    li.unpersist()
    o.unpersist()


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(lcond=_bool_expr(depth=2), ocond=st.sampled_from(_ORD_PREDICATES),
       how=st.sampled_from(["JOIN", "LEFT JOIN"]))
def test_join_path_agrees(fuzz_join_ctx, lcond, ocond, how):
    spark, con = fuzz_join_ctx
    # left join: the right-side predicate must live in the ON clause
    # (WHERE would silently turn it back into an inner join)
    q = (f"SELECT COUNT(*) AS n, "
         f"COUNT(o.o_orderkey) AS n_matched, "
         f"coalesce(SUM(l.l_orderkey % 1000), 0) AS lsum, "
         f"coalesce(SUM(o.o_custkey % 1000), 0) AS osum "
         f"FROM lineitem l {how} orders o "
         f"ON l.l_orderkey = o.o_orderkey AND ({ocond}) "
         f"WHERE {lcond}")
    g = tuple(spark.sql(q).collect()[0])
    w = tuple(con.execute(q).fetchone())
    assert g == w, f"divergence for {how} with ON ({ocond}) WHERE {lcond}"


# ---- lane 8: SET OPERATIONS ----
# two fuzzed projections over lineitem slices combined with every ANSI
# set operator; values are folded modulo a small prime so INTERSECT /
# EXCEPT actually collide. Compared through order-free aggregates
# (count + per-column sums), so no engine ordering is assumed.

_SET_OPS = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
            "EXCEPT", "EXCEPT ALL"]


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(e1=_int_expr(depth=2), e2=_int_expr(depth=2),
       c1=_bool_expr(depth=1), c2=_bool_expr(depth=1),
       op=st.sampled_from(_SET_OPS))
def test_set_operations_agree(fuzz_ctx, e1, e2, c1, c2, op):
    spark, con, _ = fuzz_ctx
    s1, _ = e1
    s2, _ = e2
    q = (f"SELECT COUNT(*) AS n, coalesce(SUM(a), 0) AS sa, "
         f"coalesce(SUM(b), 0) AS sb FROM ("
         f"SELECT ({s1}) % 13 AS a, ({s2}) % 7 AS b "
         f"FROM lineitem WHERE {c1} "
         f"{op} "
         f"SELECT ({s2}) % 13 AS a, ({s1}) % 7 AS b "
         f"FROM lineitem WHERE {c2}) t")
    got = tuple(spark.sql(q).collect()[0])
    want = tuple(con.execute(q).fetchone())
    assert got == want, f"divergence for {op}: {q}"


# ---- lane 9: ROLLUP / CUBE grouping ----
# multi-level grouping pins the NULL-as-subtotal-marker semantics and
# GROUPING() flags across engines; rows sorted None-aware.

def _none_key(row):
    return tuple((v is None, v) for v in row)


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_int_expr(depth=2), cond=_bool_expr(depth=1),
       form=st.sampled_from(["ROLLUP", "CUBE"]))
def test_rollup_cube_grouping_agrees(fuzz_ctx, expr, cond, form):
    from hypothesis import assume
    spark, con, n_rows = fuzz_ctx
    sql_txt, bound = expr
    assume(bound <= (2 ** 62) // max(n_rows, 1))
    q = (f"SELECT l_returnflag, {cond} AS k2, "
         f"GROUPING(l_returnflag) AS g1, COUNT(*) AS n, "
         f"SUM({sql_txt}) AS s, MIN({sql_txt}) AS mn, "
         f"MAX({sql_txt}) AS mx "
         f"FROM lineitem GROUP BY {form}(l_returnflag, ({cond}))")
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=_none_key)
    want = sorted((tuple(r) for r in con.execute(q).fetchall()),
                  key=_none_key)
    assert got == want, f"divergence for {form} of {sql_txt} by {cond}"


# ---- lane 9b: explicit GROUPING SETS (VERDICT r6 task #8) ----
# ROLLUP/CUBE above walk the two fixed expansions; this lane fuzzes the
# general form — a random nonempty FAMILY of subsets of the grouping
# keys, including the empty set and repeated sets (both engines must
# emit one result row-group PER LISTED SET, duplicates included).

_GS_KEYS = ["l_returnflag", "l_linestatus", "(l_suppkey % 3)"]


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_int_expr(depth=2),
       sets=st.lists(st.lists(st.integers(0, 2), min_size=0, max_size=3,
                               unique=True),
                     min_size=1, max_size=4))
def test_grouping_sets_agree(fuzz_ctx, expr, sets):
    from hypothesis import assume
    spark, con, n_rows = fuzz_ctx
    sql_txt, bound = expr
    assume(bound <= (2 ** 62) // max(n_rows, 1))
    rendered = ", ".join(
        "(" + ", ".join(_GS_KEYS[i] for i in s) + ")" for s in sets)
    # only keys that appear in SOME set are grouping columns — selecting
    # (or GROUPING()-flagging) any other key is an analysis error in
    # both engines
    used = sorted({i for s in sets for i in s})
    head = "".join(f"{_GS_KEYS[i]} AS k{i}, GROUPING({_GS_KEYS[i]}) "
                   f"AS g{i}, " for i in used)
    q = (f"SELECT {head}COUNT(*) AS n, SUM({sql_txt}) AS s "
         f"FROM lineitem GROUP BY GROUPING SETS ({rendered})")
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=_none_key)
    want = sorted((tuple(r) for r in con.execute(q).fetchall()),
                  key=_none_key)
    assert got == want, f"divergence for GROUPING SETS ({rendered})"


# ---- lane 10: SUBQUERY path (EXISTS / IN and their negations) ----
# correlated EXISTS and (NOT) IN against orders with fuzzed predicates
# on both sides — the decorrelation path and the three-valued NOT IN
# trap, compared through order-free aggregates.

_SUBQ_FORMS = [
    "EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND ({oc}))",
    "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND ({oc}))",
    "l.l_orderkey IN (SELECT o.o_orderkey FROM orders o WHERE {oc})",
    "l.l_orderkey NOT IN (SELECT o.o_orderkey FROM orders o WHERE {oc})",
]


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(lcond=_bool_expr(depth=2), ocond=st.sampled_from(_ORD_PREDICATES),
       form=st.sampled_from(_SUBQ_FORMS))
def test_subquery_path_agrees(fuzz_join_ctx, lcond, ocond, form):
    spark, con = fuzz_join_ctx
    sub = form.format(oc=ocond)
    q = (f"SELECT COUNT(*) AS n, "
         f"coalesce(SUM(l.l_orderkey % 1000), 0) AS lsum "
         f"FROM lineitem l WHERE ({lcond}) AND {sub}")
    got = tuple(spark.sql(q).collect()[0])
    want = tuple(con.execute(q).fetchone())
    assert got == want, f"divergence for subquery form: {q}"


# ---- lane 11: HIGHER-ORDER ARRAY functions (paired rendering) ----
# The one surface a single SQL text can't reach: Spark spells the
# higher-order family transform/filter/aggregate/size, DuckDB spells
# it list_transform/list_filter/list_reduce/len. The generator builds
# ONE expression tree and renders it per-dialect; semantics of every
# emitted node were verified identical by hand (lambda arithmetic,
# empty-array behavior, NULL from array_max of empty, slice bounds:
# Spark slice(A, s, n) == DuckDB list_slice(A, s, s+n-1)). Lambda
# bodies use integer literals only (both engines agree); element
# magnitudes stay far inside int64.


@st.composite
def _array_expr(draw, depth: int = 3) -> tuple[str, str]:
    """Returns (spark_sql, duck_sql) for an integer-array expression."""
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        leaf = draw(st.integers(0, 2))
        if leaf == 0:
            cols = ["(l_orderkey % 7)", "(l_partkey % 5)", "(l_suppkey % 3)",
                    "CAST(l_linenumber AS BIGINT)"]
            picks = draw(st.lists(st.sampled_from(cols), min_size=1,
                                  max_size=3))
            inner = ", ".join(picks)
            return f"array({inner})", f"[{inner}]"
        if leaf == 1:
            # 1..K, K in 1..4 — sequence vs generate_series, both
            # end-inclusive BIGINT
            k = draw(st.integers(1, 4))
            hi = f"CAST((l_linenumber % {k}) + 1 AS BIGINT)"
            return (f"sequence(CAST(1 AS BIGINT), {hi})",
                    f"generate_series(CAST(1 AS BIGINT), {hi})")
        return "array(CAST(2 AS BIGINT))", "[CAST(2 AS BIGINT)]"
    kind = draw(st.sampled_from(
        ["transform", "filter", "sort", "reverse", "concat", "slice"]))
    a_s, a_d = draw(_array_expr(depth=depth - 1))
    if kind == "transform":
        k = draw(st.integers(0, 9))
        op = draw(st.sampled_from(["+", "*"]))
        return (f"transform({a_s}, x -> x {op} {k})",
                f"list_transform({a_d}, x -> x {op} {k})")
    if kind == "filter":
        k = draw(st.integers(0, 6))
        op = draw(st.sampled_from([">", "<=", "<>"]))
        return (f"filter({a_s}, x -> x {op} {k})",
                f"list_filter({a_d}, x -> x {op} {k})")
    if kind == "sort":
        return f"array_sort({a_s})", f"list_sort({a_d})"
    if kind == "reverse":
        return f"reverse({a_s})", f"list_reverse({a_d})"
    if kind == "slice":
        s = draw(st.integers(1, 3))
        n = draw(st.integers(1, 3))
        return (f"slice({a_s}, {s}, {n})",
                f"list_slice({a_d}, {s}, {s + n - 1})")
    b_s, b_d = draw(_array_expr(depth=depth - 1))
    return f"concat({a_s}, {b_s})", f"list_concat({a_d}, {b_d})"


@st.composite
def _array_scalar_expr(draw) -> tuple[str, str]:
    """Array expression reduced to a comparable scalar, per-dialect."""
    a_s, a_d = draw(_array_expr())
    fin = draw(st.sampled_from(["sum", "size", "max", "contains"]))
    if fin == "sum":
        return (f"aggregate({a_s}, CAST(0 AS BIGINT), (acc, x) -> acc + x)",
                f"list_reduce(list_prepend(CAST(0 AS BIGINT), {a_d}), "
                f"(acc, x) -> acc + x)")
    if fin == "size":
        return (f"CAST(size({a_s}) AS BIGINT)", f"CAST(len({a_d}) AS BIGINT)")
    if fin == "max":
        return (f"CAST(array_max({a_s}) AS BIGINT)",
                f"CAST(list_max({a_d}) AS BIGINT)")
    k = draw(st.integers(0, 6))
    return (f"array_contains({a_s}, CAST({k} AS BIGINT))",
            f"list_contains({a_d}, CAST({k} AS BIGINT))")


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_array_scalar_expr())
def test_array_higher_order_agree(fuzz_ctx, expr):
    spark, con, _n = fuzz_ctx
    spark_sql, duck_sql = expr
    qs = (f"SELECT l_orderkey, l_linenumber, {spark_sql} AS v "
          f"FROM lineitem")
    qd = (f"SELECT l_orderkey, l_linenumber, {duck_sql} AS v "
          f"FROM lineitem")
    key = lambda r: (r[0], r[1], r[2] is None, r[2])  # noqa: E731
    got = sorted((tuple(r) for r in spark.sql(qs).collect()), key=key)
    want = sorted(con.execute(qd).fetchall(), key=key)
    assert got == want, (f"divergence:\n  spark: {spark_sql}\n"
                         f"  duck:  {duck_sql}")


# ---- lane 12: DATE/TIMESTAMP arithmetic ----
# interval add/subtract chains, date_trunc at every grain, EXTRACT
# finishers — classic divergence territory (calendar vs fixed-width
# units, week anchors, return types). Constraints that make the lane
# sound: date_trunc at day-or-coarser returns DATE in DuckDB but
# TIMESTAMP in Spark, so every trunc is wrapped CAST(.. AS TIMESTAMP);
# EXTRACT(DOW) is EXCLUDED (Spark Sunday=1, DuckDB Sunday=0 — a real
# dialect trap this lane documents by omission; the engine's fn_date
# query pins the mapping); both sessions run UTC so no DST ambiguity.

_TRUNC_UNITS = ["minute", "hour", "day", "week", "month", "quarter", "year"]
_EXTRACT_UNITS = ["YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "DOY", "QUARTER"]
_IVL_UNITS = ["DAY", "HOUR", "MINUTE"]


@st.composite
def _ts_expr(draw, depth: int = 3) -> str:
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return "l_shipdate"
    kind = draw(st.sampled_from(["ivl", "ivl", "trunc"]))
    inner = draw(_ts_expr(depth=depth - 1))
    if kind == "ivl":
        k = draw(st.integers(1, 90))
        unit = draw(st.sampled_from(_IVL_UNITS))
        op = draw(st.sampled_from(["+", "-"]))
        return f"({inner} {op} INTERVAL {k} {unit})"
    unit = draw(st.sampled_from(_TRUNC_UNITS))
    return f"CAST(date_trunc('{unit}', {inner}) AS TIMESTAMP)"


@st.composite
def _ts_scalar_expr(draw) -> str:
    a = draw(_ts_expr())
    fin = draw(st.sampled_from(["extract", "raw", "cmp", "minmax"]))
    if fin == "extract":
        unit = draw(st.sampled_from(_EXTRACT_UNITS))
        return f"CAST(EXTRACT({unit} FROM {a}) AS BIGINT)"
    if fin == "raw":
        return a
    b = draw(_ts_expr())
    if fin == "cmp":
        op = draw(st.sampled_from(_CMP_OPS))
        return f"({a} {op} {b})"
    f = draw(st.sampled_from(["greatest", "least"]))
    return f"{f}({a}, {b})"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_ts_scalar_expr())
def test_datetime_arithmetic_agrees(fuzz_ctx, expr):
    spark, con, _n = fuzz_ctx
    q = (f"SELECT l_orderkey, l_linenumber, {expr} AS v "
         f"FROM lineitem")
    key = lambda r: (r[0], r[1], r[2] is None, str(r[2]))  # noqa: E731
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=key)
    want = sorted(con.execute(q).fetchall(), key=key)
    assert got == want, f"divergence for datetime expression: {expr}"


# ---------------------------------------------------------------------------
# Corpus fuzz lanes (VERDICT r4 item 5): the text/dedup operators were
# only fixture-tested — the sf* documents are well-formed multi-word
# ASCII. These lanes drive hypothesis-generated corpora (empty strings,
# single-word docs, docs shorter than the shingle width, unicode,
# all-duplicate corpora) through the SAME Spark operators the registry
# lanes use and the SAME DuckDB SQL shapes the oracles use. Boundary
# logic like greatest(len - 2, 0) breaks on exactly these shapes first.
# ---------------------------------------------------------------------------

_FUZZ_WORDS = st.sampled_from([
    "a", "b", "the", "dog", "x1", "0",        # plain ASCII + digits
    "é", "naïve", "ß", "漢字", "миру", "😀",   # multi-byte / astral
])
# docs of 0..8 words; "" (empty string) and 1–2 word docs are shorter
# than the 3-gram shingle width on purpose
_FUZZ_DOC = st.lists(_FUZZ_WORDS, min_size=0, max_size=8).map(" ".join)


@st.composite
def _fuzz_corpus(draw) -> list[str]:
    docs = draw(st.lists(_FUZZ_DOC, min_size=1, max_size=10))
    # force the all-duplicate / near-duplicate regime often: replicate a
    # random subset so dedup actually fires
    if draw(st.booleans()) and docs:
        src = draw(st.sampled_from(docs))
        docs = docs + [src] * draw(st.integers(1, 3))
    return docs


_SHINGLE_SQL = """
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> array_to_string(
                   list_slice(string_split(text, ' '), i, i + 2), ' '))))
               AS shingle
    FROM fuzz_docs
"""


@pytest.fixture(scope="module")
def corpus_con():
    import duckdb
    con = duckdb.connect()
    yield con
    con.close()


def _load_corpus(spark, con, docs: list[str]):
    import pandas as pd
    pdf = pd.DataFrame({"doc_id": list(range(len(docs))), "text": docs})
    sdf = spark.createDataFrame(pdf)
    con.register("fuzz_docs", pdf)
    return sdf


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=_fuzz_corpus())
def test_corpus_shingles_agree(spark, corpus_con, docs):
    # the inverted-index builder every dedup lane sits on: per-doc
    # DISTINCT 3-gram shingles must agree string-for-string
    from datastream_processing_demo_spark.operators.dedup import doc_shingles
    sdf = _load_corpus(spark, corpus_con, docs)
    got = {(r["doc_id"], r["shingle"])
           for r in doc_shingles(sdf, hash_keys=False).collect()}
    want = set(map(tuple, corpus_con.execute(_SHINGLE_SQL).fetchall()))
    assert got == want, f"shingle divergence on corpus {docs!r}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=_fuzz_corpus(), thr=st.sampled_from([0.25, 0.5, 0.9]))
def test_corpus_jaccard_pairs_agree(spark, corpus_con, docs, thr):
    # exact n-gram Jaccard near-dup pairs: zero-shingle docs must drop
    # out (no 0/0), duplicate docs must pair at jaccard 1.0
    from datastream_processing_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    sdf = _load_corpus(spark, corpus_con, docs)
    got = {(r["doc_a"], r["doc_b"], r["common"], r["size_a"], r["size_b"])
           for r in ngram_jaccard_pairs(sdf, threshold=thr).collect()}
    want = set(map(tuple, corpus_con.execute(f"""
        WITH sh AS ({_SHINGLE_SQL}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, common, sa.n, sb.n
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= {thr}
    """).fetchall()))
    assert got == want, f"jaccard divergence on corpus {docs!r} thr={thr}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=_fuzz_corpus())
def test_corpus_vocab_rank_agrees(spark, corpus_con, docs):
    # the text_vocab_build shape on hostile vocab: word counts + the
    # two-phase (freq DESC, word) rank must reproduce ANSI row_number
    # byte-for-byte even for multi-byte/astral words and empty-token
    # filtering (also fuzzes global_rank's composite desc key path)
    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.operators.ranking import global_rank
    sdf = _load_corpus(spark, corpus_con, docs)
    counts = (sdf.select(F.explode(F.split("text", " ")).alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
    ranked = global_rank(counts, [F.col("n").desc(), F.col("word")],
                         rank_col="_rk")
    got = {(r["word"], r["n"], r["_rk"] - 1) for r in ranked.collect()}
    want = set(map(tuple, corpus_con.execute("""
        SELECT word, n, row_number() OVER (ORDER BY n DESC, word) - 1
        FROM (
            SELECT word, COUNT(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM fuzz_docs) w
            WHERE word <> ''
            GROUP BY word) c
    """).fetchall()))
    assert got == want, f"vocab-rank divergence on corpus {docs!r}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=_fuzz_corpus(), geom=st.sampled_from([(8, 6), (4, 4), (5, 2)]))
def test_corpus_chunk_overlap_agrees(spark, corpus_con, docs, geom):
    # context-window chunking boundary logic (tail chunks, empty docs,
    # docs shorter than the window) across window/stride geometries
    from pyspark.sql import functions as F
    window, stride = geom
    sdf = _load_corpus(spark, corpus_con, docs)
    toks = sdf.select(
        "doc_id", F.filter(F.split("text", " "), lambda w: w != "").alias("tk"))
    t2 = toks.withColumn("n", F.size("tk")).filter(F.col("n") > 0)
    ch = t2.select("doc_id", "tk", "n", F.explode(
        F.sequence(F.lit(1), F.col("n"), F.lit(stride))).alias("s"))
    out = ch.select(
        "doc_id", ((F.col("s") - 1) / stride).cast("long").alias("chunk_id"),
        F.array_join(F.slice("tk", F.col("s"), F.lit(window)), " ")
            .alias("chunk_text"))
    got = {(r["doc_id"], r["chunk_id"], r["chunk_text"])
           for r in out.collect()}
    want = set(map(tuple, corpus_con.execute(f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> w <> '') AS tk
            FROM fuzz_docs),
        t2 AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0)
        SELECT doc_id, CAST((u.s - 1) // {stride} AS BIGINT),
               array_to_string(list_slice(tk, u.s, least(u.s + {window} - 1, n)), ' ')
        FROM t2, unnest(generate_series(1, n, {stride})) AS u(s)
    """).fetchall()))
    assert got == want, f"chunk divergence on corpus {docs!r} geom={geom}"


@st.composite
def _fuzz_events(draw) -> list[tuple]:
    # (event_id, user_id, offset_seconds): offsets drawn from multiples
    # of HALF the session gap so exact-gap distances (the end-exclusive
    # merge boundary) occur constantly, plus ties on the same instant
    n = draw(st.integers(2, 24))
    rows = []
    for i in range(n):
        rows.append((i,
                     draw(st.integers(0, 2)),
                     30 * draw(st.integers(0, 20))))
    return rows


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=_fuzz_events())
def test_sessionization_agrees(spark, corpus_con, rows):
    # session_window (60s gap) vs the gaps-and-islands SQL the
    # streaming lanes' oracles use. Spark MERGES boundary-touching
    # sessions (an event at exactly last_ts + gap joins the session
    # — this lane's first sweep proved it and fixed four oracles
    # that split there), so: new session iff distance > gap,
    # session_end = last_ts + gap.
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F
    base = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "ts": [base + datetime.timedelta(seconds=r[2]) for r in rows]})
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sdf = spark.createDataFrame(pdf)
    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["first_event_id"])
           for r in (sdf.groupBy("user_id",
                                 F.session_window("ts", "60 seconds"))
                     .agg(F.count(F.lit(1)).alias("n_events"),
                          F.min("event_id").alias("first_event_id"))
                     .select("user_id",
                             F.col("session_window.start")
                             .alias("session_start"),
                             F.col("session_window.end")
                             .alias("session_end"),
                             "n_events", "first_event_id")
                     .collect())}
    corpus_con.register("fuzz_events", pdf)
    want = set(map(tuple, corpus_con.execute("""
        WITH ordered AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 60 SECOND
                        THEN 1 ELSE 0 END AS is_new
            FROM fuzz_events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        islands AS (
            SELECT *, SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sess_no
            FROM ordered)
        SELECT user_id, MIN(ts), MAX(ts) + INTERVAL 60 SECOND,
               COUNT(*), MIN(event_id)
        FROM islands GROUP BY user_id, sess_no
    """).fetchall()))
    assert got == want, f"sessionization divergence on {rows!r}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 2),      # user
                               st.integers(0, 6),      # ts grid (forces ties)
                               st.integers(-5, 5)),    # value
                     min_size=1, max_size=20),
       width=st.sampled_from([0, 1, 2]),
       agg=st.sampled_from(["SUM", "COUNT", "MIN", "MAX"]))
def test_range_frame_ties_agree(spark, corpus_con, rows, width, agg):
    # RANGE frames with DUPLICATE order keys: ANSI peer-row semantics
    # (all ties enter the frame together) are the classic dialect trap;
    # the narrow grid guarantees ties in nearly every example
    import pandas as pd
    pdf = pd.DataFrame({"rid": range(len(rows)),
                        "u": [r[0] for r in rows],
                        "k": [r[1] for r in rows],
                        "v": [r[2] for r in rows]})
    spark.createDataFrame(pdf).createOrReplaceTempView("fuzz_rf")
    corpus_con.register("fuzz_rf", pdf)
    q = (f"SELECT rid, {agg}(v) OVER ("
         f"PARTITION BY u ORDER BY k "
         f"RANGE BETWEEN {width} PRECEDING AND CURRENT ROW) AS a "
         f"FROM fuzz_rf")
    got = sorted(tuple(r) for r in spark.sql(q).collect())
    want = sorted(map(tuple, corpus_con.execute(q).fetchall()))
    assert got == want, f"range-frame divergence: {q} on {rows!r}"


def test_tumbling_window_exact_boundary(spark, corpus_con):
    """Companion to the sessionization catch: an event at EXACTLY a
    tumbling-window boundary must open the next window (start-inclusive,
    end-exclusive) and the floor-arithmetic oracle spelling must agree —
    the fixtures' microsecond-random timestamps never test this."""
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F
    base = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame({"ts": pd.Series(
        [base,
         base + datetime.timedelta(seconds=59),
         base + datetime.timedelta(seconds=60),    # exact boundary
         base + datetime.timedelta(seconds=120)],  # exact boundary
        dtype="datetime64[us]")})
    sdf = spark.createDataFrame(pdf)
    got = sorted((r["start"], r["n"]) for r in
                 (sdf.groupBy(F.window("ts", "60 seconds").alias("w"))
                  .agg(F.count(F.lit(1)).alias("n"))
                  .select(F.col("w.start").alias("start"), "n").collect()))
    corpus_con.register("fuzz_tb", pdf)
    want = sorted(map(tuple, corpus_con.execute("""
        SELECT make_timestamp(CAST(floor(epoch(ts) / 60) * 60 AS BIGINT)
                              * 1000000) AS start, COUNT(*)
        FROM fuzz_tb GROUP BY 1
    """).fetchall()))
    assert got == want
    assert [n for _, n in got] == [2, 1, 1]


# ---- lane 20: as-of join vs DuckDB's native ASOF JOIN ----
# operators/asof.py implements backward as-of via the union+window
# idiom; DuckDB has a first-class ASOF JOIN. Random event tables on a
# narrow integer time grid force the boundary cases constantly: exact
# ts equality (must match — right sorts before left at equal ts),
# left rows before any right row (NULL payload), keys absent from the
# right side entirely, and an empty right table. Right-side (k, ts)
# pairs are deduplicated because at duplicate timestamps DuckDB's pick
# is unspecified while ours is tiebreak-deterministic — that
# determinism is pinned separately by the engine's join_asof tests.

_ASOF_RIGHT = st.lists(
    st.tuples(st.integers(0, 2),      # key
              st.integers(0, 12),     # ts grid (forces equal-ts hits)
              st.integers(-99, 99)),  # payload
    min_size=0, max_size=15)


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(left=st.lists(st.tuples(st.integers(0, 3),   # key (3 never in right)
                               st.integers(0, 12)),  # ts
                     min_size=1, max_size=20),
       right=_ASOF_RIGHT)
def test_asof_join_agrees_with_duckdb(spark, corpus_con, left, right):
    import pandas as pd

    from datastream_processing_demo_spark.operators.asof import asof_join
    # dedup right (k, ts): keep the first payload drawn for each pair
    seen: dict = {}
    for k, ts, val in right:
        seen.setdefault((k, ts), val)
    lpdf = pd.DataFrame({"rid": range(len(left)),
                         "k": [r[0] for r in left],
                         "ts": [r[1] for r in left]})
    rpdf = pd.DataFrame({"k": [k for k, _ in seen],
                         "ts": [t for _, t in seen],
                         "val": list(seen.values())},
                        dtype="int64")
    lsdf = spark.createDataFrame(lpdf)
    rsdf = spark.createDataFrame(
        rpdf, schema="k bigint, ts bigint, val bigint")
    got = sorted(
        (r["rid"], r["val"]) for r in
        asof_join(lsdf, rsdf, on="k", ts="ts", payload=["val"]).collect())
    corpus_con.register("fuzz_asof_l", lpdf)
    corpus_con.register("fuzz_asof_r", rpdf)
    want = sorted(map(tuple, corpus_con.execute("""
        SELECT l.rid, r.val
        FROM fuzz_asof_l l ASOF LEFT JOIN fuzz_asof_r r
          ON l.k = r.k AND l.ts >= r.ts
    """).fetchall()))
    assert got == want, (
        f"asof divergence: left={left!r} right={sorted(seen.items())!r}")


# ---- lane 21: JSON path extraction ----
# get_json_object vs DuckDB json_extract_string over hypothesis-built
# JSON documents: nested objects/arrays to depth 3, unicode + escaped
# strings (quotes, backslashes, newlines), negative/large ints, bools,
# JSON nulls, empty strings/objects/arrays. A fixed path pool mixes
# hits, type mismatches (indexing into a scalar), out-of-range array
# indices, and misses. Floats are limited to exact halves so neither
# engine re-renders the literal. Probed conventions both engines
# share: scalars unquoted, objects/arrays re-serialized compactly,
# JSON null and missing paths both -> SQL NULL... with TWO exceptions
# this lane's first 300-example sweeps shrank, both real dialect
# divergences: (1) an explicit JSON null as an ARRAY ELEMENT ($.a[0]
# on {"a":[null]}) comes back as the STRING 'null' from
# get_json_object but SQL NULL from DuckDB — Spark only maps
# object-member nulls to SQL NULL (pinned in
# test_json_null_array_element_divergence); (2) re-serialized
# CONTAINERS escape non-BMP characters as surrogate pairs in Spark
# ('["\\uD83D\\uDE00"]') but raw UTF-8 in DuckDB ('["😀"]') — scalar
# extraction of the same character agrees. The compare therefore
# canonicalizes every value that parses as JSON (sorted-key compact
# re-dump), which normalizes both divergences while still comparing
# structure and values exactly; non-JSON scalars compare raw.

_JSON_KEYS = ["a", "b", "c", "d"]
_JSON_STRINGS = st.sampled_from(
    ["", "x", "héllo", "漢字", 'has "quotes"', "back\\slash",
     "line\nbreak", "tab\there", "😀"])
_JSON_SCALARS = st.one_of(
    st.integers(-10**15, 10**15),
    st.sampled_from([0.5, -2.5, 4.0]),
    st.booleans(), st.none(), _JSON_STRINGS)


def _json_values(depth: int):
    if depth == 0:
        return _JSON_SCALARS
    sub = _json_values(depth - 1)
    return st.one_of(
        _JSON_SCALARS,
        st.lists(sub, max_size=3),
        st.dictionaries(st.sampled_from(_JSON_KEYS), sub, max_size=3))


_JSON_DOC = st.dictionaries(st.sampled_from(_JSON_KEYS),
                            _json_values(2), max_size=4)
_JSON_PATHS = ["$.a", "$.b", "$.a.b", "$.a.c", "$.b.c.d", "$.a[0]",
               "$.a[2]", "$.a[0].b", "$.b[1]", "$.d", "$.a.b[0]", "$.c.a"]


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=st.lists(_JSON_DOC, min_size=1, max_size=6))
def test_json_path_extraction_agrees(spark, corpus_con, docs):
    import json as _json

    import pandas as pd
    pdf = pd.DataFrame({"doc_id": range(len(docs)),
                        "js": [_json.dumps(d, ensure_ascii=False)
                               for d in docs]})
    spark.createDataFrame(pdf).createOrReplaceTempView("fuzz_json")
    corpus_con.register("fuzz_json", pdf)
    qs = ("SELECT doc_id, " + ", ".join(
        f"get_json_object(js, '{p}') AS p{i}"
        for i, p in enumerate(_JSON_PATHS)) + " FROM fuzz_json")
    qd = ("SELECT doc_id, " + ", ".join(
        f"json_extract_string(js, '{p}') AS p{i}"
        for i, p in enumerate(_JSON_PATHS)) + " FROM fuzz_json")
    def canon(v):
        if not isinstance(v, str):
            return v
        try:
            parsed = _json.loads(v)
        except ValueError:
            return "S:" + v
        if parsed is None:  # Spark's in-array 'null' string == SQL NULL
            return None
        return "J:" + _json.dumps(parsed, sort_keys=True,
                                  ensure_ascii=False,
                                  separators=(",", ":"))

    got = sorted(tuple(canon(v) for v in r)
                 for r in spark.sql(qs).collect())
    want = sorted(tuple(canon(v) for v in r)
                  for r in corpus_con.execute(qd).fetchall())
    assert got == want, f"json-path divergence on docs {docs!r}"


def test_json_null_array_element_divergence(spark, corpus_con):
    """Deterministic pin of the dialect trap lane 21 shrank: a JSON
    null OBJECT MEMBER extracts as SQL NULL in both engines, but a
    JSON null ARRAY ELEMENT is the string 'null' from Spark's
    get_json_object and SQL NULL from DuckDB's json_extract_string.
    The engine's registry queries must therefore never ship an
    un-normalized get_json_object over a path that can land on an
    in-array null."""
    import pandas as pd
    pdf = pd.DataFrame({"js": ['{"a": [null], "b": null}']})
    spark.createDataFrame(pdf).createOrReplaceTempView("json_null_pin")
    corpus_con.register("json_null_pin", pdf)
    s = spark.sql("SELECT get_json_object(js, '$.a[0]') AS elem, "
                  "get_json_object(js, '$.b') AS member "
                  "FROM json_null_pin").collect()[0]
    d = corpus_con.execute(
        "SELECT json_extract_string(js, '$.a[0]'), "
        "json_extract_string(js, '$.b') FROM json_null_pin").fetchone()
    assert s["elem"] == "null" and d[0] is None  # the divergence
    assert s["member"] is None and d[1] is None  # the agreement


# ---- lane 22: corpus segment dedup (keep-first + reassembly) ----
# operators/dedup.segment_dedup at width 3 over the hostile corpus
# strategy: empty docs (split('') is [''] in BOTH engines — one empty
# segment), docs shorter than one segment, exact-width docs, unicode,
# and replicated docs (whole-doc segment collisions, where keep-first
# ownership and in-order reassembly interact). Differential against
# the same SQL shape the registry oracle uses, reparameterized.

_SEGDEDUP_SQL = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM fuzz_docs),
    seg AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, CAST(ceil(len(words) / 3.0) AS BIGINT) + 1),
                   i -> struct_pack(
                       idx := i,
                       seg := array_to_string(
                           list_slice(words, (i - 1) * 3 + 1, i * 3), ' '))),
                   recursive := true)
        FROM w),
    enc AS (SELECT doc_id, idx, seg,
                   doc_id * 1000000 + idx AS encoded FROM seg),
    own AS (SELECT seg, MIN(encoded) AS own_enc FROM enc GROUP BY seg)
    SELECT e.doc_id,
           COUNT(*) AS n_segments,
           COUNT(*) FILTER (WHERE e.encoded = o.own_enc) AS n_kept,
           coalesce(string_agg(e.seg, ' ' ORDER BY e.idx)
                        FILTER (WHERE e.encoded = o.own_enc), '')
               AS kept_text
    FROM enc e JOIN own o ON e.seg = o.seg
    GROUP BY e.doc_id
"""


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=_fuzz_corpus())
def test_corpus_segment_dedup_agrees(spark, corpus_con, docs):
    from datastream_processing_demo_spark.operators.dedup import (
        segment_dedup,
    )
    sdf = _load_corpus(spark, corpus_con, docs)
    got = {(r["doc_id"], r["n_segments"], r["n_kept"], r["kept_text"])
           for r in segment_dedup(sdf, width=3).collect()}
    want = set(map(tuple, corpus_con.execute(_SEGDEDUP_SQL).fetchall()))
    assert got == want, f"segment-dedup divergence on corpus {docs!r}"


def test_segment_dedup_int_id_no_int32_wrap(spark):
    """With an IntegerType id column, the first-occurrence key
    id * 1e6 + idx must be computed in BIGINT: the int32 product wraps
    negative past id ~2147 (non-ANSI), making the wrapped HIGHER doc
    win the MIN-based keep-first and corrupting ownership (ADVICE r5).
    Duplicate text across ids 10 and 3000: doc 10 must own every
    segment."""
    from pyspark.sql import types as T

    from datastream_processing_demo_spark.operators.dedup import (
        segment_dedup,
    )
    schema = T.StructType([
        T.StructField("doc_id", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    txt = "a b c d e f"
    sdf = spark.createDataFrame([(10, txt), (3000, txt)], schema)
    out = {r["doc_id"]: r for r in segment_dedup(sdf, width=3).collect()}
    assert out[10]["n_kept"] == 2 and out[10]["kept_text"] == txt
    assert out[3000]["n_kept"] == 0 and out[3000]["kept_text"] == ""


# ---- lane 23: CSV write->read dialect round-trip ----
# The engine materializes CSV with Spark's writer and must get the
# SAME bytes back through (a) its own reader and (b) any other
# RFC-style reader (DuckDB read_csv with the matching quote/escape).
# Hostile single-line fields: embedded commas and quotes (forcing the
# writer's quoting+escaping path), leading/trailing spaces (this
# lane's probe caught the writer's default ignore*WhiteSpace=true
# silently TRIMMING them — fixed in sources/files.py), backslashes,
# unicode, and empty strings (written as "" and read back NULL by
# both engines — the pinned convention). Embedded NEWLINES are
# excluded here and pinned separately: Spark's default splittable
# reader truncates a quoted multi-line field its own writer produced,
# and only multiLine=true agrees with DuckDB.

_CSV_FIELD = st.sampled_from([
    "plain", "comma,inside", 'quote"inside', '"fully quoted"',
    " leading", "trailing ", "  both  ", "back\\slash", "mix\\\"all, x",
    "é漢字😀", "", "=formula", "null", "123", "-7.5", "tab\there",
])


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(fields=st.lists(_CSV_FIELD, min_size=1, max_size=8))
def test_csv_roundtrip_dialect_agrees(spark, corpus_con, fields):
    import glob
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="csv_fuzz_")
    try:
        rows = [(i, f) for i, f in enumerate(fields)]
        (spark.createDataFrame(rows, "id int, txt string")
         .coalesce(1).write.mode("overwrite")
         .option("header", "true")
         .option("ignoreLeadingWhiteSpace", "false")
         .option("ignoreTrailingWhiteSpace", "false").csv(d))
        got_spark = {r["id"]: r["txt"] for r in
                     (spark.read.option("header", "true")
                      .schema("id int, txt string").csv(d).collect())}
        part = glob.glob(os.path.join(d, "*.csv"))[0]
        got_duck = dict(corpus_con.execute(
            f"SELECT id, txt FROM read_csv('{part}', header=true, "
            "delim=',', quote='\"', escape='\\', "
            "columns={'id': 'INT', 'txt': 'VARCHAR'})").fetchall())
        for i, f in rows:
            want = f if f != "" else None  # ""->NULL: pinned convention
            assert got_spark[i] == want, (
                f"spark round-trip mangled {f!r} -> {got_spark[i]!r}")
            assert got_duck[i] == want, (
                f"duckdb read diverged on {f!r} -> {got_duck[i]!r}")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_embedded_newline_needs_multiline(spark, corpus_con):
    """Pin the newline trap the csv-dialect probe found: the writer
    quotes an embedded newline (RFC-correct), but Spark's DEFAULT
    splittable reader truncates the field at the line break — only
    multiLine=true reproduces the written value, which DuckDB reads
    correctly either way. The engine's CSV sources stay on the
    splittable default (100 TB scans shard by line), so embedded
    newlines are a documented no-go for the CSV interchange path."""
    import glob
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="csv_nl_")
    try:
        (spark.createDataFrame([(0, "new\nline")], "id int, txt string")
         .coalesce(1).write.mode("overwrite").option("header", "true").csv(d))
        default_read = (spark.read.option("header", "true")
                        .schema("id int, txt string").csv(d).collect())
        multiline = (spark.read.option("header", "true")
                     .option("multiLine", "true")
                     .schema("id int, txt string").csv(d).collect()[0])
        part = glob.glob(os.path.join(d, "*.csv"))[0]
        duck = corpus_con.execute(
            f"SELECT txt FROM read_csv('{part}', header=true)").fetchone()
        assert multiline["txt"] == "new\nline" == duck[0]
        assert [r["txt"] for r in default_read] != ["new\nline"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- lane 24: incremental near-dup ingest (shard vs corpus LSH index) ----
# The r6 dedup_minhash_incremental operator over hostile corpora: random
# corpus/shard splits of the duplicate-heavy fuzz corpus, small LSH
# geometry (8 hashes / 2 bands) and a low verify threshold so every
# stage fires constantly. The SQL mirror is generated from the SAME
# permutation coefficients as the operator — banding included, so a
# pair the banding misses is missed identically on both sides.

def _inc_ingest_sql(num_hashes: int, bands: int, threshold: float) -> str:
    from datastream_processing_demo_spark.operators.dedup import (
        MINHASH_P,
        minhash_perm_coeffs,
    )
    rows = num_hashes // bands
    min_exprs = ", ".join(
        f"min((x * {minhash_perm_coeffs(i)[0]} + {minhash_perm_coeffs(i)[1]})"
        f" % {MINHASH_P}) AS h{i}"
        for i in range(num_hashes))
    sig_list = ", ".join(f"h{i}" for i in range(num_hashes))
    return f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' '))))
                   AS shingle
        FROM fuzz_inc_docs),
    hx AS (SELECT doc_id,
                  CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
                      % {MINHASH_P} AS x
           FROM sh),
    sig AS (SELECT doc_id, {min_exprs} FROM hx GROUP BY doc_id),
    arr AS (SELECT doc_id, [{sig_list}] AS s FROM sig),
    banded AS (
        SELECT doc_id, bt.b AS band,
               array_to_string(
                   list_slice(s, bt.b * {rows} + 1, (bt.b + 1) * {rows}), ',')
                   AS key
        FROM arr CROSS JOIN (SELECT unnest(range({bands})) AS b) bt),
    bn AS (SELECT banded.*, d.is_new
           FROM banded JOIN fuzz_inc_docs d USING (doc_id)),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CASE WHEN a.is_new THEN 'i' ELSE 'x' END AS kind
        FROM bn a JOIN bn b ON a.band = b.band AND a.key = b.key
        WHERE b.is_new AND (NOT a.is_new OR a.doc_id < b.doc_id)
        GROUP BY 1, 2, 3),
    sizes AS (SELECT doc_id, COUNT(*) AS sn FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.doc_a, c.doc_b, c.kind, COUNT(*) AS cm
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
        GROUP BY 1, 2, 3),
    ver AS (
        SELECT doc_a, doc_b, kind
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(cm AS DOUBLE) / (sa.sn + sb.sn - cm) >= {threshold}),
    nc AS (SELECT doc_b AS doc_id, COUNT(*) AS n FROM ver
           WHERE kind = 'x' GROUP BY 1),
    ns AS (SELECT doc_id, COUNT(*) AS n FROM (
               SELECT doc_a AS doc_id FROM ver WHERE kind = 'i'
               UNION ALL
               SELECT doc_b FROM ver WHERE kind = 'i') GROUP BY 1),
    sm AS (SELECT doc_b AS doc_id, COUNT(*) AS n FROM ver
           WHERE kind = 'i' GROUP BY 1)
    SELECT s.doc_id,
           CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_corpus_dups,
           CAST(COALESCE(ns.n, 0) AS BIGINT) AS n_shard_dups,
           COALESCE(nc.n, 0) = 0 AND COALESCE(sm.n, 0) = 0 AS is_kept
    FROM fuzz_inc_docs s
    LEFT JOIN nc ON s.doc_id = nc.doc_id
    LEFT JOIN ns ON s.doc_id = ns.doc_id
    LEFT JOIN sm ON s.doc_id = sm.doc_id
    WHERE s.is_new
    """


@settings(max_examples=min(MAX_EXAMPLES, 20), deadline=None,
          derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=_fuzz_corpus(), data=st.data())
def test_corpus_incremental_ingest_agrees(spark, corpus_con, docs, data):
    import pandas as pd

    from datastream_processing_demo_spark.operators.dedup import (
        minhash_incremental_delta,
    )
    is_new = [data.draw(st.booleans(), label=f"is_new[{i}]")
              for i in range(len(docs))]
    pdf = pd.DataFrame({"doc_id": list(range(len(docs))), "text": docs,
                        "is_new": is_new})
    sdf = spark.createDataFrame(pdf)
    corpus_con.register("fuzz_inc_docs", pdf)
    out = minhash_incremental_delta(
        sdf.filter("NOT is_new").select("doc_id", "text"),
        sdf.filter("is_new").select("doc_id", "text"),
        threshold=0.5, num_hashes=8, bands=2)
    got = sorted((r["doc_id"], r["n_corpus_dups"], r["n_shard_dups"],
                  r["is_kept"]) for r in out.collect())
    want = sorted(map(tuple, corpus_con.execute(
        _inc_ingest_sql(8, 2, 0.5)).fetchall()))
    assert got == want, (
        f"incremental-ingest divergence on docs={docs!r} "
        f"is_new={is_new!r}\n  spark {got}\n  oracle {want}")


# ---- lane 14: PIVOT / UNPIVOT paired rendering (VERDICT r6 task #8) ----
# Spark executes the real PIVOT/UNPIVOT clauses; DuckDB executes their
# SEMANTIC DEFINITION (conditional aggregation / UNION ALL) — the same
# paired-rendering discipline as the higher-order array lane, because
# the two engines spell pivot syntactically incompatibly (Spark:
# `PIVOT (agg FOR col IN (v AS alias, ...))`; DuckDB: a PIVOT
# *statement* with engine-generated column names). A divergence means
# Spark's pivot path disagrees with its ANSI ground truth.


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(expr=_int_expr(depth=2), cond=_bool_expr(depth=1))
def test_pivot_agrees(fuzz_ctx, expr, cond):
    from hypothesis import assume
    spark, con, n_rows = fuzz_ctx
    sql_txt, bound = expr
    assume(bound <= (2 ** 62) // max(n_rows, 1))
    base = (f"SELECT l_linestatus, l_returnflag, {sql_txt} AS x "
            f"FROM lineitem WHERE {cond}")
    spark_q = (f"SELECT * FROM ({base}) "
               f"PIVOT (SUM(x) FOR l_returnflag "
               f"IN ('A' AS a, 'N' AS n, 'R' AS r))")
    duck_q = (f"SELECT l_linestatus, "
              f"SUM(CASE WHEN l_returnflag = 'A' THEN x END) AS a, "
              f"SUM(CASE WHEN l_returnflag = 'N' THEN x END) AS n, "
              f"SUM(CASE WHEN l_returnflag = 'R' THEN x END) AS r "
              f"FROM ({base}) GROUP BY l_linestatus")
    got = sorted((tuple(r) for r in spark.sql(spark_q).collect()),
                 key=_none_key)
    want = sorted((tuple(r) for r in con.execute(duck_q).fetchall()),
                  key=_none_key)
    assert got == want, f"PIVOT divergence for x={sql_txt} where {cond}"


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(e1=_int_expr(depth=2), e2=_int_expr(depth=2), cond=_bool_expr(depth=1),
       include_nulls=st.booleans())
def test_unpivot_agrees(fuzz_ctx, e1, e2, cond, include_nulls):
    from hypothesis import assume
    spark, con, n_rows = fuzz_ctx
    s1, b1 = e1
    s2, b2 = e2
    assume(max(b1, b2) <= (2 ** 62) // max(n_rows, 1))
    # pre-aggregate to a small wide frame with genuine NULLs (empty
    # conditional-agg groups), then unpivot it: NULL handling is the
    # trap — Spark UNPIVOT drops NULL measure rows unless INCLUDE NULLS
    base = (f"SELECT l_linestatus, "
            f"SUM(CASE WHEN ({cond}) THEN {s1} END) AS c1, "
            f"SUM(CASE WHEN NOT ({cond}) THEN {s2} END) AS c2 "
            f"FROM lineitem GROUP BY l_linestatus")
    nulls = "INCLUDE NULLS" if include_nulls else ""
    spark_q = (f"SELECT * FROM ({base}) "
               f"UNPIVOT {nulls} (v FOR k IN (c1, c2))")
    null_filter = "" if include_nulls else "WHERE v IS NOT NULL"
    duck_q = (f"WITH w AS ({base}) "
              f"SELECT * FROM ("
              f"  SELECT l_linestatus, 'c1' AS k, c1 AS v FROM w "
              f"  UNION ALL "
              f"  SELECT l_linestatus, 'c2' AS k, c2 AS v FROM w) "
              f"{null_filter}")
    got = sorted((tuple(r) for r in spark.sql(spark_q).collect()),
                 key=_none_key)
    want = sorted((tuple(r) for r in con.execute(duck_q).fetchall()),
                  key=_none_key)
    assert got == want, f"UNPIVOT divergence ({nulls or 'drop nulls'})"

"""Guards on the driver-facing query ordering (registry.ordered_queries).

The driver checks a fixed-size prefix (50 in rounds 1-2) of the ordering
that __spark_entry__.queries() exposes. These tests lock in the rotation
contract so prefix starvation (round 1: window burned on three
categories; round 2: window re-checked already-green queries) cannot
recur:

- first-time verdicts (red + never-checked) always come before ANY
  already-green query — a green may enter the window only once every
  red/never query fits inside it;
- once the first-time backlog fits the window, any 50-prefix samples
  every category (one stalest-green representative per category
  directly follows the backlog);
- exactly-oracled queries all come before rows-only ones;
- queries whose latest official verdict is red lead the window.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.plans.registry import (
    all_queries,
    ordered_queries,
)

_LEDGER_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "DRIVER_LEDGER.json")

WINDOW = 50


def _ledger() -> dict:
    with open(_LEDGER_PATH) as f:
        return json.load(f)


def _first_time(spec, ledger) -> bool:
    rec = ledger.get(spec.name)
    return rec is None or rec["verdict"] == "red" or (
        rec["verdict"] == "rows_only" and spec.oracle is not None)


def test_every_category_in_any_window_prefix():
    """Category sampling holds whenever the first-time backlog fits the
    window; with a larger backlog the window is spent entirely on
    first-time verdicts instead (each worth more than a re-sample)."""
    ledger = _ledger()
    ordered = list(ordered_queries().values())
    backlog = sum(1 for s in ordered if s.oracle is not None
                  and _first_time(s, ledger))
    prefix = ordered[:WINDOW]
    if backlog >= WINDOW:
        assert all(_first_time(s, ledger) for s in prefix), (
            "green query inside the window while first-time backlog "
            f"({backlog}) exceeds it")
    else:
        prefix_cats = {s.category for s in prefix}
        all_cats = {s.category for s in ordered}
        assert prefix_cats == all_cats, (
            f"missing from first {WINDOW}: {sorted(all_cats - prefix_cats)}")


def test_rows_only_queries_sit_after_all_oracled():
    ordered = list(ordered_queries().values())
    n_oracled = sum(1 for s in ordered if s.oracle is not None)
    for pos, spec in enumerate(ordered):
        if spec.oracle is None:
            assert pos >= n_oracled, (
                f"rows-only {spec.name} at position {pos} < {n_oracled}")


def test_red_queries_lead_the_window():
    ledger = _ledger()
    reds = {n for n, rec in ledger.items()
            if rec["verdict"] == "red" and n in all_queries()
            and all_queries()[n].oracle is not None}
    prefix = set(list(ordered_queries())[:WINDOW])
    assert reds <= prefix, f"red queries outside window: {sorted(reds - prefix)}"


def test_window_prefers_unverified_over_green():
    """A green-ledger query may appear in the window only when every
    red/never-checked oracled query is already inside it."""
    ledger = _ledger()
    ordered = list(ordered_queries().values())
    prefix = ordered[:WINDOW]
    greens_in_window = [
        s.name for s in prefix
        if ledger.get(s.name, {}).get("verdict") == "green"]
    first_time_outside = [
        s.name for s in ordered[WINDOW:]
        if s.oracle is not None and _first_time(s, ledger)]
    if first_time_outside:
        assert not greens_in_window, (
            f"greens {greens_in_window} in window while first-time "
            f"queries wait outside: {first_time_outside}")


def test_ledger_names_match_registry():
    """Every ledger entry refers to a live registered query (catches
    renames that would silently break rotation)."""
    unknown = set(_ledger()) - set(all_queries())
    assert not unknown, f"ledger entries not in registry: {sorted(unknown)}"


def test_every_query_ships_an_oracle():
    """OPERATORS.md claims '228 oracle-checked, 0 rows-only'. Guard the
    invariant: a new @query registration without a DuckDB oracle would
    silently reintroduce the weaker rows-only driver check (VERDICT r4
    item 7). Genuinely non-SQL-expressible ops must be added to the
    explicit allowlist here, with a justification."""
    allowed_rows_only: set[str] = set()
    missing = {name for name, spec in all_queries().items()
               if spec.oracle is None} - allowed_rows_only
    assert not missing, (
        f"queries registered without an oracle: {sorted(missing)} — "
        "add a DuckDB oracle or allowlist with justification")

"""Generate OPERATORS.md — the queryable operator inventory — from the
plan registry. Run after adding queries:  python tools/gen_operators_md.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.plans.registry import all_queries

HEADER = """# OPERATORS — declared inventory (generated; do not edit)

One row per registered query: the engine's concrete coverage of
`SURVEY.md` §2.2. Every query is runnable via
`__spark_entry__.queries()[name](spark, sf_dir)`; "oracle" marks the
correctness gate class (`exact` = DuckDB hash-match; `rows-only` =
driver's weaker check, property-tested in tests/ instead).

Regenerate with `python tools/gen_operators_md.py`.
"""

CATEGORY_NOTES = {
    "relational": "projection / filter / scalar function families (reference P1-P7 generalized)",
    "joins": "all join types — absent from the reference (SURVEY.md §2.1.1), engine capability",
    "aggregates": "groupBy/global/rollup/cube/grouping-sets/distinct/approx (reference A2 generalized)",
    "windows": "ranking / analytic / frame window functions",
    "setops": "set operations + global sort/limit",
    "dedup": "exact + near-duplicate detection (LLM-pipeline)",
    "json_array": "JSON / array / map functions incl. higher-order",
    "udfs": "Python UDF surface: scalar, pandas, UDAF, UDTF",
    "pipeline": "reference-topology parity: fixed-width parse/route/delay (P2-P7, R1, A2, K1)",
    "streaming": "event-time windows in batch-checkable form (streaming proper in tests/)",
    "sql_surface": "SQL-text API, CSV/JSON sources, RANGE frames",
    "subqueries": "scalar / IN / correlated subqueries, HAVING, NULL semantics",
    "text": "text analysis (LLM-pipeline)",
    "similarity": "embedding similarity search (LLM-pipeline)",
    "multimodal": "binary payload columns + decode plumbing (LLM-pipeline)",
}


def main() -> None:
    specs = all_queries()
    by_cat: dict[str, list] = defaultdict(list)
    for spec in specs.values():
        by_cat[spec.category].append(spec)

    lines = [HEADER]
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    lines.append(f"**{len(specs)} queries; {n_oracle} oracle-checked, "
                 f"{len(specs) - n_oracle} rows-only+property-tested.**\n")
    for cat in CATEGORY_NOTES:
        items = sorted(by_cat.get(cat, []), key=lambda s: s.name)
        if not items:
            continue
        lines.append(f"\n## {cat} — {CATEGORY_NOTES[cat]}\n")
        lines.append("| query | oracle | description |")
        lines.append("|---|---|---|")
        for s in items:
            o = "exact" if s.oracle else "rows-only"
            lines.append(f"| `{s.name}` | {o} | {s.description} |")
    leftovers = set(by_cat) - set(CATEGORY_NOTES)
    assert not leftovers, f"add category notes for {leftovers}"

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "OPERATORS.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(specs)} queries in {len(by_cat)} categories")


if __name__ == "__main__":
    main()

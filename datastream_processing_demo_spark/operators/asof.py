"""As-of (backward-looking point-in-time) join.

The reference has no joins at all (SURVEY.md §2.1.1); this implements
the time-series as-of join named in the project charter as a custom
operator Spark lacks natively. Semantics: for every left row, attach
the payload of the single right row with the same key and the greatest
`(ts, tiebreak)` such that `right.ts <= left.ts` (NULL payload when no
such row).

Implementation is the scale-correct union+window idiom rather than a
per-key loop or a range join:

1. union the two inputs by name (missing columns become NULL), tagging
   right rows `_side=0`, left rows `_side=1`;
2. one window per key ordered by `(ts, _side, tiebreak)` — right rows
   sort before left rows at equal ts, so an exactly-simultaneous right
   row IS matched;
3. `last(payload, ignorenulls=True)` over the unbounded-preceding frame
   carries the most recent right payload forward;
4. keep only left rows.

Cost at 100 TB: ONE shuffle of both inputs on the key (same as any
equi-join) + a per-partition sort — no state bigger than a row, no
skew beyond what the key distribution already has. A per-key
`applyInPandas` merge-join would load whole keys into memory; the
window form streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              payload: Sequence[str], tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join; `right` must contain `on`, `ts`, `payload`
    (+ `tiebreak`) and no other columns that collide with `left`."""
    extra = [tiebreak] if tiebreak and tiebreak not in payload else []
    r = right.select(on, ts, *extra, *payload)
    lhs = left.withColumn("_side", F.lit(1))
    rhs = r.withColumn("_side", F.lit(0))
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.col(ts), F.col("_side")]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = (W.partitionBy(on).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    for c in payload:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")

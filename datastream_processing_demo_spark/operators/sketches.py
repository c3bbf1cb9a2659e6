"""Two-pass exact heavy hitters: Misra–Gries candidates + exact recount.

The 100 TB problem: "which tokens appear in >= phi of the corpus" via a
plain groupBy shuffles EVERY distinct token — billions of keys of
one-off typos and hashes shuffled to answer a question about a few
hundred frequent items. The classic fix (Misra & Gries 1982; the
"frequent"/space-saving family) is a bounded-memory summary per
partition, then an exact recount of only the surviving candidates:

- Pass 1 (map-only, no shuffle): each partition keeps at most k
  counters. An item with GLOBAL frequency > N/k cannot be absent from
  every partition summary — if it were, its count deficit in partition
  p is at most N_p/k, and summing over partitions gives freq <= N/k, a
  contradiction. So the union of per-partition summaries is a COMPLETE
  candidate set for any threshold T > N/k (no false negatives, ever).
  The same pass also emits one summary row per partition carrying the
  partition's row and NULL counts, so the total N (and the exact NULL
  frequency) costs no extra scan.
- Pass 2: exact counts of the candidates only — a broadcast semi-join
  against the (tiny) candidate set, then a groupBy whose key space is
  bounded by partitions x k, not by distinct items. False positives
  from pass 1 die here.

Exactly two scans of the corpus (pass 1 is localCheckpoint'd so its
tiny output feeds both the candidate set and the totals), and the
result is EXACT — identical to the full groupBy, including the NULL
group (nulls are counted exactly in pass 1 and emitted through a
dedicated branch, since an equi-semi-join would drop them) — which is
why this operator carries a plain GROUP BY / HAVING oracle rather than
an error contract. The reference has no aggregation at all
(SURVEY.md §2.1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# simpleString -> Python-scalar converter: with NULLs present, Arrow
# hands integer columns to pandas as float64, so counter keys must be
# normalized back to the declared Spark type before they cross Arrow
# again as output
_CASTERS = {"bigint": int, "int": int, "smallint": int, "tinyint": int,
            "double": float, "float": float}


def _misra_gries_partition(col: str, k: int, caster):
    """mapInPandas body: one bounded dict of <= k counters per PARTITION
    (state carried across the partition's Arrow batches), plus one
    NULL-keyed summary row with the partition's row/null totals."""

    def body(batches):
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        n_nulls = 0
        for pdf in batches:
            n_rows += len(pdf)
            for item in pdf[col]:
                if pd.isna(item):
                    # NULL needs no sketch slot: its exact count rides
                    # in the summary row
                    n_nulls += 1
                    continue
                if caster is not None:
                    item = caster(item)
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step: charge one count of every
                    # counter against the unmatched item; zeros vacate
                    # their slot. Amortized O(1) per input item (each
                    # decrement pass removes k counts that k prior
                    # insertions paid for).
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({
            "item": pd.Series(list(counters.keys()) + [None], dtype=object),
            "_pn": [0] * len(counters) + [n_rows],
            "_pnull": [0] * len(counters) + [n_nulls],
        })

    return body


def heavy_hitters(items: DataFrame, col: str, phi: float = 0.005,
                  slack: int = 1) -> DataFrame:
    """Items whose frequency is >= ceil(phi * N), computed without ever
    shuffling the full distinct-key space. Generic over the item type
    (the sketch schema is derived from the input column) and exact for
    the NULL group too.

    k is derived from phi alone: the completeness argument needs
    T > N/k, and T = ceil(phi*N) >= phi*N, so k = ceil(1/phi) + slack
    counters per partition suffice for any N. Returns (item, cnt),
    exact — bit-identical to GROUP BY item HAVING cnt >= ceil(phi*N).

    The threshold itself is EXACT integer arithmetic: phi is read as the
    decimal the caller wrote (Fraction(str(phi)) -> num/den), and
    cnt >= ceil(phi*N) is evaluated as cnt*den >= num*N in BIGINT. A
    double-precision ceil(phi*N) can land one above the exact-DECIMAL
    threshold an ANSI engine computes when the binary product rounds
    just past an integer boundary; the rational form can't.
    """
    from fractions import Fraction

    frac = Fraction(str(phi))
    num, den = frac.numerator, frac.denominator
    k = -(-den // num) + slack  # ceil(1/phi), exact
    item_type = items.schema[col].dataType
    ts = item_type.simpleString()
    src = items.select(F.col(col).alias("item"))
    # localCheckpoint: pass-1 output (<= partitions x k candidate rows +
    # one summary row each) feeds BOTH the candidate set and the totals;
    # materializing it keeps the corpus at exactly two scans
    p1 = src.mapInPandas(
        _misra_gries_partition("item", k, _CASTERS.get(ts)),
        f"item {ts}, _pn long, _pnull long").localCheckpoint()
    cand = (p1.filter(F.col("item").isNotNull()).select("item").distinct())
    tot = p1.agg(F.sum("_pn").alias("n"), F.sum("_pnull").alias("null_cnt"))

    # cnt >= ceil(phi*N) for integer cnt <=> cnt >= phi*N
    # <=> cnt*den >= num*N, all in BIGINT — no double-precision ceil
    def passes(cnt_col: str):
        return (F.col(cnt_col).cast("long") * F.lit(den).cast("long")
                >= F.lit(num).cast("long") * F.col("n").cast("long"))

    counted = (src.filter(F.col("item").isNotNull())
               .join(F.broadcast(cand), "item", "left_semi")
               .groupBy("item").agg(F.count(F.lit(1)).alias("cnt")))
    non_null = (counted.crossJoin(F.broadcast(tot))
                .filter(passes("cnt"))
                .select("item", "cnt"))
    # NULL branch: an equi-semi-join never matches NULL, so the NULL
    # group's exact count comes from the pass-1 summaries instead
    null_row = (tot.filter((F.col("null_cnt") > 0) & passes("null_cnt"))
                .select(F.lit(None).cast(item_type).alias("item"),
                        F.col("null_cnt").alias("cnt")))
    return non_null.unionByName(null_row)

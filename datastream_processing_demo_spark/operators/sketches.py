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
- Pass 2: exact counts of the candidates only — a broadcast semi-join
  against the (tiny) candidate set, then a groupBy whose key space is
  bounded by partitions x k, not by distinct items. False positives
  from pass 1 die here.

End result is EXACT (identical to the full groupBy), which is why this
operator carries a plain GROUP BY / HAVING oracle rather than an error
contract. The reference has no aggregation at all (SURVEY.md §2.1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(col: str, k: int):
    """mapInPandas body: one bounded dict of <= k counters per PARTITION
    (state carried across the partition's Arrow batches)."""

    def body(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
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
        yield pd.DataFrame({"item": list(counters.keys())})

    return body


def heavy_hitters(items: DataFrame, col: str, phi: float = 0.005,
                  slack: int = 1) -> DataFrame:
    """Items whose frequency is >= ceil(phi * N), computed without ever
    shuffling the full distinct-key space.

    k is derived from phi alone: the completeness argument needs
    T > N/k, and T = ceil(phi*N) >= phi*N, so k = ceil(1/phi) + slack
    counters per partition suffice for any N. Returns (item, cnt),
    exact.
    """
    import math

    k = int(math.ceil(1.0 / phi)) + slack
    src = items.select(F.col(col).alias("item"))
    cand = (src.mapInPandas(_misra_gries_partition("item", k),
                            "item string")
            .distinct())
    counted = (src.join(F.broadcast(cand), "item", "left_semi")
               .groupBy("item").agg(F.count(F.lit(1)).alias("cnt")))
    total = src.agg(F.count(F.lit(1)).alias("n"))
    return (counted.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("n")))
            .select("item", "cnt"))

"""Skew mitigation: salted equi-join (SURVEY.md §4.2; SCALE.md Joins).

AQE's skew-join splitting handles most skew at runtime; explicit
salting is the deterministic fallback for keys with KNOWN pathological
skew (one user_id owning 1% of a 100 TB fact table), or for
aggregations where AQE can't split a single hash bucket.

Mechanics: the fact side gets a salt in [0, n_salt) derived by hashing
a high-cardinality discriminator column (deterministic — no rand(), so
retries/replays produce identical plans); the dim side is replicated
n_salt times. The join key becomes (key, salt): one hot key now hashes
to n_salt different shuffle buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                discriminator: str, n_salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join `fact` ⋈ `dim` on `key`, salted n_salt ways.

    `discriminator` is any HIGH-CARDINALITY fact column (an event id, a
    part key — its distinct count must be >> n_salt or some salt
    buckets stay empty) — it only spreads rows, it never affects which
    rows match. Result is row-identical to the plain join (asserted in
    tests/test_skew.py)."""
    salt = F.pmod(F.xxhash64(F.col(discriminator)), F.lit(n_salt))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"),
                                      F.lit(n_salt - 1).cast("long"))))
    out = fact_s.join(dim_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")

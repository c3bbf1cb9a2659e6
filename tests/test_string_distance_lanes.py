"""fn_string_distance scale lanes (VERDICT r8 task #3).

The matrix lane is quadratic in distinct names; the PassJoin lane
(segment-pigeonhole equi-join candidates + shared bounded-DP verify)
is the documented-then-implemented scale swap. These tests pin:

- lane equality on the real tables (bit-identical rows);
- PassJoin exactness against a pure-Python brute force on an
  adversarial mutated-name corpus (short names that force empty
  segments, unicode, clustered near-duplicates at every distance
  0..BOUND+2 so both the keep and reject sides of the threshold are
  exercised);
- the executable dispatch rule flipping at the cardinality cap.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datastream_processing_demo_spark.plans.relational import (
    _SD_BOUND,
    _sd_passjoin_name_pairs,
    fn_string_distance,
    fn_string_distance_auto,
    fn_string_distance_passjoin,
    string_distance_lane_decision,
)


def _pdf(df):
    return (df.toPandas()
            .sort_values(["a_key", "b_key"]).reset_index(drop=True))


def test_lanes_bit_identical_on_part(spark, sf_dir):
    m = _pdf(fn_string_distance(spark, sf_dir))
    pj = _pdf(fn_string_distance_passjoin(spark, sf_dir))
    auto = _pdf(fn_string_distance_auto(spark, sf_dir))
    assert len(m) > 0
    assert m.equals(pj)
    assert m.equals(auto)


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    alpha = "abcdefghijklmnopqrstuvwxyzé"
    for _ in range(n_edits):
        op = rng.choice("ids")
        i = rng.randrange(max(1, len(s)))
        if op == "i":
            s = s[:i] + rng.choice(alpha) + s[i:]
        elif op == "d" and len(s) > 1:
            s = s[:i] + s[i + 1:]
        else:
            s = s[:i] + rng.choice(alpha) + s[i + 1:]
    return s


def test_passjoin_exact_vs_bruteforce_adversarial(spark):
    rng = random.Random(0xC0FFEE)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    names: set[str] = set()
    # clustered near-duplicates: mutation distances straddle the bound
    for _ in range(60):
        base = "".join(rng.choice(alpha)
                       for _ in range(rng.randrange(6, 40)))
        names.add(base)
        for _ in range(rng.randrange(1, 4)):
            names.add(_mutate(rng, base, rng.randrange(0, _SD_BOUND + 3)))
    # degenerate shapes: shorter than the segment count (empty segments),
    # unicode, shared prefixes
    names |= {"a", "ab", "abc", "abcd", "ab", "x", "é", "éé", "banana",
              "bananas", "bananaz", "bnana", "nanaba"}
    names = sorted(names)

    want = {(a, b, _levenshtein(a, b))
            for i, a in enumerate(names) for b in names[i + 1:]
            if _levenshtein(a, b) <= _SD_BOUND}
    # both orders + self pairs: the name_pairs contract
    want = ({(a, b, d) for a, b, d in want}
            | {(b, a, d) for a, b, d in want}
            | {(n, n, 0) for n in names})

    dn = spark.createDataFrame([(n,) for n in names], ["p_name"])
    got = {(r.name_a, r.name_b, r.edit_dist)
           for r in _sd_passjoin_name_pairs(dn).collect()}
    assert got == want


def test_dispatch_rule_flips_at_cap(spark, sf_dir):
    d = string_distance_lane_decision(spark, sf_dir)
    assert d["lane"] == "matrix"  # 64 distinct part names << 10k cap
    assert 0 < d["n_distinct_names"] <= 100
    flipped = string_distance_lane_decision(
        spark, sf_dir, matrix_cap=d["n_distinct_names"] - 1)
    assert flipped["lane"] == "passjoin"


def test_passjoin_candidate_volume_is_linear(spark):
    """The scale claim itself: candidate-generation volume must grow
    ~linearly in distinct names (vs the matrix lane's N²). 400 RANDOM
    12-char names (no planted duplicates) -> probe keys ~ 112/name and
    verified candidates << N²/2."""
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    names = {"".join(rng.choice(alpha) for _ in range(12))
             for _ in range(400)}
    dn = spark.createDataFrame([(n,) for n in names], ["p_name"])
    out = _sd_passjoin_name_pairs(dn)
    n_pairs = out.filter(F.col("name_a") != F.col("name_b")).count()
    # random 12-char names over 36 symbols are almost surely > 3 apart
    assert n_pairs < len(names)  # nowhere near the 79,800 matrix pairs

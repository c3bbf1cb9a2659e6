"""SimHash width auto-sizing (VERDICT r8 task #4).

Pins: the corpus-size -> words rule, the multi-word pigeonhole's exact
recall guarantee vs a brute force, and the recall-margin story itself —
a REAL true pair (sf0.01, word-seeded hash) sits at 1-word hamming 11
and escapes the radius-10 pigeonhole; the auto 2-word radius-20 lane
recovers it while the final output still matches the exact-Jaccard
truth.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from datastream_processing_demo_spark.operators.dedup import (
    SIMHASH_BASE_RADIUS,
    auto_simhash_words,
    simhash_multiword_df,
    simhash_multiword_near_pairs,
)
from datastream_processing_demo_spark.plans.dedup import (
    dedup_simhash,
    dedup_simhash_auto,
)


def test_auto_words_rule():
    # floor 4 (2 for recall — the 1-word lane is measured seed-lucky —
    # raised to 4 for candidate precision on low-entropy corpora),
    # +1 word per 15 doublings, capped at 6
    assert auto_simhash_words(0) == 4
    assert auto_simhash_words(500) == 4
    assert auto_simhash_words(50_000) == 4
    assert auto_simhash_words(2**60) == 4
    assert auto_simhash_words(2**61) == 5
    assert auto_simhash_words(2**75) == 5
    assert auto_simhash_words(2**76) == 6
    assert auto_simhash_words(2**200) == 6  # cap


def _brute_pairs(rows, radius, words):
    out = set()
    for i, (ida, ha) in enumerate(rows):
        for idb, hb in rows[i + 1:]:
            d = sum(bin(ha[j] ^ hb[j]).count("1") for j in range(words))
            if d <= radius:
                a, b = sorted((ida, idb))
                out.add((a, b, d))
    return out


def test_multiword_pigeonhole_exact_vs_bruteforce(spark):
    """Random 2-word hashes + planted neighbors straddling the radius:
    the blocked join must return EXACTLY the brute-force <=radius set
    (pigeonhole recall is guaranteed, not probabilistic)."""
    rng = random.Random(2024)
    words, radius = 2, 2 * SIMHASH_BASE_RADIUS
    rows = []
    for i in range(120):
        rows.append((i, [rng.getrandbits(63), rng.getrandbits(63)]))
    # plant neighbors at hamming d for d around the radius: flip d bits
    # spread across both words (worst case for per-word blocking)
    next_id = 1000
    for d in (0, 1, radius - 1, radius, radius + 1, radius + 7, 40):
        base = rows[d % 120][1]
        flipped = list(base)
        positions = rng.sample(range(2 * 63), d)
        for p in positions:
            flipped[p // 63] ^= 1 << (p % 63)
        rows.append((next_id, flipped))
        next_id += 1
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", ArrayType(LongType()))])
    df = spark.createDataFrame(rows, schema)
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in simhash_multiword_near_pairs(df, radius=radius,
                                                 words=words).collect()}
    assert got == _brute_pairs(rows, radius, words)


def test_multiword_radius_smaller_than_words_rejected(spark):
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", ArrayType(LongType()))])
    df = spark.createDataFrame([(1, [0, 0, 0])], schema)
    try:
        simhash_multiword_near_pairs(df, radius=1, words=3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_auto_lane_matches_base_lane_output(spark, sf_dir):
    base = {(r.doc_a, r.doc_b) for r in dedup_simhash(spark, sf_dir)
            .collect()}
    auto = {(r.doc_a, r.doc_b) for r in dedup_simhash_auto(spark, sf_dir)
            .collect()}
    assert len(auto) > 0
    assert auto == base  # both equal the exact truth at this sf


def test_width_recovers_radius_boundary_pair(spark):
    """The recall-margin regression (the r7 sf1 finding reproduced at
    driver scale): under the word-seeded hash, ONE true Jaccard>=0.9
    pair at sf0.01 sits at 1-word hamming 11 — outside the radius-10
    pigeonhole — while the 2-word hash puts it at <= 20 (hamming
    fraction concentrates with width). The 1-word candidates must MISS
    at least one pair that the auto lane FINDS, and the auto output must
    still equal dedup_simhash's exact-oracled output."""
    sf_dir = "/root/testdata/sf0.01"
    from datastream_processing_demo_spark.catalog import load_table
    docs = load_table(spark, sf_dir, "documents")

    truth = {(r.doc_a, r.doc_b)
             for r in dedup_simhash(spark, sf_dir).collect()}

    one_word = (simhash_multiword_near_pairs(
        simhash_multiword_df(docs, words=1),
        radius=SIMHASH_BASE_RADIUS, words=1)
        .select("doc_a", "doc_b").collect())
    one_word_pairs = {(r.doc_a, r.doc_b) for r in one_word}
    escaped = truth - one_word_pairs
    assert escaped, ("expected >=1 true pair beyond radius 10 at 63 bits "
                     "(measured: hamming 11) — fixture changed?")

    auto = {(r.doc_a, r.doc_b)
            for r in dedup_simhash_auto(spark, sf_dir).collect()}
    assert escaped <= auto
    assert auto == truth


def test_auto_minhash_bands_rule():
    # floor 16 (the production dedup_minhash_lsh geometry), 4/3 * log2(n)
    # past ~2^12 docs, capped at 64 — the banding twin of the width rule
    from datastream_processing_demo_spark.operators.dedup import (
        auto_minhash_bands,
    )
    assert auto_minhash_bands(0) == 16
    assert auto_minhash_bands(500) == 16
    assert auto_minhash_bands(5_000) == 17
    assert auto_minhash_bands(500_000) == 26   # the sf10 corpus
    assert auto_minhash_bands(2**60) == 64     # cap

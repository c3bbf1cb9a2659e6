"""Deduplication operators (SURVEY.md §2.2 dedup row + the LLM-pipeline
dedup family): exact row dedup, key dedup keep-first-by-order, and — in
the llm section below — content-hash dedup over documents.

Near-dup detection (MinHash/SimHash/n-gram Jaccard) lives in text.py /
similarity.py companions; this module is exact-match semantics.

Scale notes: exact dedup is a hash aggregate (map-side combinable);
keep-first is a window over the dedup key — both shuffle once on the
key, no driver-side state. dropDuplicates() picks an ARBITRARY survivor
(nondeterministic across runs/cluster layouts), so the engine's
deterministic idiom is row_number()==1 with a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "dedup_exact_rows", "dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    description="exact row dedup (DISTINCT / dropDuplicates over projection)",
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates()


@query(
    "dedup_keep_first", "dedup",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) x
    WHERE rn = 1
    """,
    description="key dedup keeping the first row by a deterministic order",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@query(
    "dedup_ngram_jaccard", "dedup",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' '))))
                   AS shingle
        FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b, common,
           sa.n AS size_a, sb.n AS size_b,
           CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
    """,
    description="exact 3-gram Jaccard near-dups via inverted-index join",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.5, n=3)


@query(
    "dedup_minhash_lsh", "dedup",
    oracle=None,  # xxhash64 signatures are engine-specific; property-tested
    description="MinHash(32) + LSH(8 bands) candidate pairs (the scale path)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures
    sigs = minhash_signatures(t(spark, sf_dir, "documents"), num_hashes=32, n=3)
    return lsh_candidate_pairs(sigs, bands=8)


@query(
    "dedup_simhash", "dedup",
    oracle=None,  # xxhash64-based; property-tested (hamming vs jaccard)
    description="63-bit SimHash near-dup pairs (hamming <= 8), block-joined",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_col_df, simhash_near_pairs
    return simhash_near_pairs(simhash_col_df(t(spark, sf_dir, "documents")),
                              max_hamming=8)


@query(
    "dedup_content_hash", "dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    description="exact content dedup via hash-groupBy (keeper = min id)",
)
def dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "dedup_cluster_canonical", "dedup",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' '))))
                   AS shingle
        FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT doc_a, doc_b
        FROM common
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, lab) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.lab FROM edges e JOIN reach r ON r.node = e.d)
    SELECT node AS doc_id, MIN(lab) AS cluster_id,
           node = MIN(lab) AS is_canonical
    FROM reach GROUP BY node
    """,
    description="near-dup cluster assignment: connected components over Jaccard pairs",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Transitive closure of the >=0.5-Jaccard relation: each document in
    # any near-dup pair gets cluster_id = min reachable doc_id (the
    # canonical survivor). Spark side runs min-label propagation
    # (operators/components.py); the oracle computes the same fixpoint
    # with a recursive CTE.
    from ..operators.components import min_label_components
    from ..operators.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(t(spark, sf_dir, "documents"),
                                threshold=0.5, n=3)
    comp = min_label_components(pairs.select("doc_a", "doc_b"),
                                src="doc_a", dst="doc_b")
    return comp.select(
        F.col("node").alias("doc_id"), "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"))

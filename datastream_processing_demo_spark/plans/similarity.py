"""Similarity-search queries over `embeddings` (SURVEY.md §2.2 LLM-ext).

Every query here is oracle-checked EXACTLY — including the approximate
ones: cosine scores are rounded to 1e-6 before ranking on both engines
(raw values agree to ~1e-15, so the rounded grid is stable), the
sign-LSH bucket codes and probe sets are mirrored in SQL from the same
integer hyperplanes, and the IVF oracle trains the same centroids in
SQL. `sim_ann_recall` turns the approximation quality itself into a
driver-gated exact number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _hyperplane,
    bruteforce_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
    semdedup,
)
from ._util import t
from .registry import query

_COS = ("ROUND(list_dot_product(qv, cv) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)")


def _bucket_sql(n_planes: int, dim: int = 64) -> str:
    """DuckDB expression for the sign-LSH bucket of a DOUBLE list `v` —
    generated from the SAME `_hyperplane` coefficients the Spark operator
    uses, so the two sides cannot drift. Plane coefficients are small
    integers, so each product is exact in double and both engines fold
    the sum left-to-right: the sign decisions are bit-identical."""
    terms = []
    for p in range(n_planes):
        coefs = ", ".join(f"{c:.1f}" for c in _hyperplane(p, dim))
        terms.append(f"(CASE WHEN list_dot_product(v, [{coefs}]) > 0 "
                     f"THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "sim_bruteforce_topk", "similarity",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
               FROM embeddings),
         scored AS (
             SELECT query_id, neighbor_id, {_COS} AS score
             FROM q, c WHERE query_id != neighbor_id),
         ranked AS (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id) AS rank
             FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
    """,
    description="exact brute-force cosine top-5 for 10 query vectors",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return bruteforce_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "sim_bruteforce_pandas", "similarity",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
               FROM embeddings),
         scored AS (
             SELECT query_id, neighbor_id, {_COS} AS score
             FROM q, c WHERE query_id != neighbor_id),
         ranked AS (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id) AS rank
             FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
    """,
    description="brute-force top-5 via Arrow-batched pandas-UDF cosine (same oracle as the expression form)",
)
def sim_bruteforce_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import bruteforce_topk_pandas
    emb = t(spark, sf_dir, "embeddings")
    return bruteforce_topk_pandas(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "sim_lsh_topk", "similarity",
    # The bucketing is deterministic (integer hyperplanes), so even the
    # approximate result has an EXACT oracle: mirror the bucket codes and
    # the Hamming-1 multiprobe in SQL.
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         b AS (SELECT vec_id, v, {_bucket_sql(8)} AS bucket FROM e),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM b WHERE vec_id < 10),
         probes AS (
             SELECT query_id, qv,
                    unnest(list_concat(
                        [bucket],
                        list_transform(range(8), p -> xor(bucket, 1 << p))))
                        AS bucket
             FROM q),
         c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b),
         scored AS (
             SELECT DISTINCT query_id, neighbor_id, {_COS} AS score
             FROM probes JOIN c USING (bucket)
             WHERE query_id != neighbor_id),
         ranked AS (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id)
                       AS rank
             FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
    """,
    description="sign-LSH bucketed approximate top-k (the 100 TB path)",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_planes=8)


# Squared L2 in dot-product form — the exact IEEE op sequence the Spark
# operator uses (operators/similarity._nearest_cells_expr), so the SQL
# mirror reproduces every cell assignment bit-for-bit. {v}/{c} are
# DOUBLE-list column names.
def _l2_dot_form(v: str, c: str) -> str:
    return (f"list_dot_product({v}, {v}) "
            f"- 2.0 * list_dot_product({v}, {c}) "
            f"+ list_dot_product({c}, {c})")


@query(
    "sim_ivf_topk", "similarity",
    # The whole IVF pipeline is deterministic — seeds are the 16
    # lowest-id vectors, one Lloyd round with EXACT integer-scaled means
    # (order-independent), dot-form L2 with (l2, cell_id) tiebreaks —
    # so even this approximate index has an exact ANSI mirror: train the
    # same centroids in SQL, assign, probe 4 cells per query, rank.
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
    seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell_id, v AS sv
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
    assign0 AS (
        SELECT e.vec_id, e.v, s.cell_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_l2_dot_form('e.v', 's.sv')}, s.cell_id) AS rn
        FROM e CROSS JOIN seeds s),
    elem AS (
        SELECT cell_id, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x
        FROM assign0 WHERE rn = 1),
    cmean AS (
        SELECT cell_id, pos,
               CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m
        FROM elem GROUP BY cell_id, pos),
    cvec AS (
        SELECT cell_id, list(m ORDER BY pos) AS cm
        FROM cmean GROUP BY cell_id),
    cassign AS (
        SELECT e.vec_id, e.v, c.cell_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_l2_dot_form('e.v', 'c.cm')}, c.cell_id) AS rn
        FROM e CROSS JOIN cvec c),
    corpus AS (
        SELECT vec_id AS neighbor_id, v AS cv, cell_id
        FROM cassign WHERE rn = 1),
    probes AS (
        SELECT vec_id AS query_id, v AS qv, cell_id
        FROM cassign WHERE vec_id < 10 AND rn <= 4),
    scored AS (
        SELECT query_id, neighbor_id, {_COS} AS score
        FROM probes JOIN corpus USING (cell_id)
        WHERE query_id != neighbor_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
    """,
    description="IVF cell-probed approximate top-k (FAISS-style coarse quantizer), exact SQL-mirrored training",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10),
                    k=5, n_cells=16, n_probe=4)


@query(
    "sim_embedding_near_dup", "similarity",
    # Re-specced at the PRODUCTION geometry (VERDICT r12 / r11 task
    # list: "no registered lane with a data-melting fixed geometry").
    # The original fixed 4-plane blocking measurably melted at the sf10
    # sweep — 16 buckets x ~12.5k members ran a ~65-minute single-task
    # hot-bucket straggler (BASELINE.md r11). The contract now ships
    # with BOTH production dials: B = auto_n_planes(COUNT(*)) planes
    # per band (corpus-sized — per-bucket quadratic work stays bounded
    # at any scale) and 4 independent bands OR-amplifying recall
    # (collide in ANY band => candidate; 1-(1-p^B)^4 vs p^B single-
    # band). The old 4-plane boundary stays regression-pinned in
    # tests/test_llm_ops.py. The oracle derives the same integer B from
    # the same COUNT(*), builds the same formula hyperplanes (global
    # plane index q, band q // B, bit q % B), and verifies the same
    # rounded cosine — bit-exact at every sf.
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    nb AS (SELECT CASE WHEN n <= 1024 THEN 4
                  ELSE GREATEST(4, LEAST(48, (
                      SELECT MIN(t.b)
                      FROM (SELECT unnest(range(54)) AS b) t
                      WHERE ((n + 1023) // 1024 - 1) >> t.b = 0))) END AS b
           FROM (SELECT COUNT(*) AS n FROM e)),
    pl AS (SELECT q,
                  list_transform(range(64),
                      j -> CAST(((q * 31 + j * 17) % 13) - 6 AS DOUBLE))
                      AS plane
           FROM (SELECT unnest(range(4 * CAST((SELECT b FROM nb) AS BIGINT)))
                 AS q)),
    bk AS (SELECT e.vec_id,
                  CAST(pl.q // (SELECT b FROM nb) AS INT) AS band,
                  SUM(CASE WHEN list_dot_product(e.v, pl.plane) > 0
                           THEN (CAST(1 AS BIGINT)
                                 << CAST(pl.q % (SELECT b FROM nb) AS INT))
                           ELSE CAST(0 AS BIGINT) END) AS bucket
           FROM e CROSS JOIN pl
           GROUP BY e.vec_id, CAST(pl.q // (SELECT b FROM nb) AS INT)),
    cand AS (SELECT DISTINCT a.vec_id AS doc_a, c.vec_id AS doc_b
             FROM bk a JOIN bk c ON a.band = c.band AND a.bucket = c.bucket
                                AND a.vec_id < c.vec_id)
    SELECT cand.doc_a, cand.doc_b,
           ROUND(list_dot_product(ea.v, eb.v)
                 / (sqrt(list_dot_product(ea.v, ea.v))
                    * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
    FROM cand JOIN e ea ON cand.doc_a = ea.vec_id
              JOIN e eb ON cand.doc_b = eb.vec_id
    WHERE ROUND(list_dot_product(ea.v, eb.v)
                / (sqrt(list_dot_product(ea.v, ea.v))
                   * sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.35
    """,
    description="embedding-cosine near-dup pairs: corpus-sized sign-LSH blocking OR-amplified across 4 independent bands (production geometry)",
)
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_pairs_banded
    return embedding_near_dup_pairs_banded(t(spark, sf_dir, "embeddings"),
                                           threshold=0.35, n_bands=4)


@query(
    "sim_centroid_rollup", "similarity",
    oracle="""
    WITH elem AS (
        SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS v
        FROM embeddings),
    per AS (
        SELECT label, pos,
               CAST(ROUND(AVG(CAST(v AS DOUBLE)) * 1000000) AS BIGINT) AS v
        FROM elem GROUP BY label, pos),
    cent AS (
        SELECT label,
               array_to_string(list(v ORDER BY pos), ',') AS centroid_e6
        FROM per GROUP BY label)
    SELECT c.label, c.centroid_e6, n.n_vectors
    FROM cent c
    JOIN (SELECT label, COUNT(*) AS n_vectors
          FROM embeddings GROUP BY label) n ON c.label = n.label
    """,
    description="per-label centroid: element-wise mean of embedding vectors",
)
def sim_centroid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The vector-aggregate behind IVF training / cluster summaries:
    # posexplode -> (label, pos) mean -> reassemble ordered array. Two
    # shuffles on compact keys; element means scaled to 1e-6-grid BIGINTs
    # (absorbs float-sum order noise between engines) and the vector
    # joined to a CSV string (driver hasher can't hash array cells).
    emb = t(spark, sf_dir, "embeddings")
    elem = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    per = (elem.groupBy("label", "pos")
           .agg(F.round(F.avg(F.col("v").cast("double")) * 1e6, 0)
                .cast("long").alias("v")))
    cent = (per.groupBy("label")
            .agg(F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s.v.cast("string")), ",").alias("centroid_e6")))
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    return cent.join(counts, "label")


@query(
    "sim_quantize_int8", "similarity",
    oracle="""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings)
    SELECT vec_id,
           ROUND(list_max(list_transform(e, x -> abs(x))), 6) AS scale,
           array_to_string(list_transform(e, x -> CAST(ROUND(
               x / list_max(list_transform(e, y -> abs(y))) * 127)
               AS INTEGER)), ',') AS q
    FROM v
    """,
    description="per-vector int8 symmetric quantization of embeddings (4x compression)",
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Vector compression for the 100 TB corpus: symmetric absmax int8 —
    # q_i = round(x_i / absmax * 127) — shrinks a float32 embedding
    # column 4x before it ever hits a shuffle or an ANN index. Pure
    # per-row higher-order expressions, no UDF, no shuffle; both engines
    # run the identical IEEE sequence (cast-to-double first, one
    # divide, one multiply) so even the rounded codes match exactly.
    # absmax is materialized as a projection column BEFORE the quantize
    # lambda — inlining it would re-reduce the vector per element
    # (no CSE inside array lambdas; O(d^2) per row). The int8 codes are
    # joined to a CSV string (driver hasher can't hash array cells).
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"))
    s = v.select("vec_id", "e",
                 F.expr("array_max(transform(e, x -> abs(x)))").alias("m"))
    return s.select(
        "vec_id",
        F.round("m", 6).alias("scale"),
        F.expr("array_join(transform(e, "
               "x -> CAST(CAST(ROUND(x / m * 127) AS INT) AS STRING)), ',')")
            .alias("q"))


@query(
    "sim_lsh_topk_probe2", "similarity",
    # Same deterministic bucketing as sim_lsh_topk, probing every code
    # within Hamming 2 of the query's (1 + 8 + 28 = 37 of 256 buckets):
    # the recall dial sim_ann_recall measures, exact-mirrored in SQL.
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         b AS (SELECT vec_id, v, {_bucket_sql(8)} AS bucket FROM e),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM b WHERE vec_id < 10),
         probes AS (
             SELECT query_id, qv,
                    unnest(list_concat(
                        list_concat(
                            [CAST(bucket AS BIGINT)],
                            list_transform(range(8),
                                p -> CAST(xor(bucket, 1 << p) AS BIGINT))),
                        flatten(list_transform(range(8), p ->
                            list_transform(range(p), r ->
                                CAST(xor(bucket, (1 << p) + (1 << r))
                                     AS BIGINT))))))
                        AS bucket
             FROM q),
         c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b),
         scored AS (
             SELECT DISTINCT query_id, neighbor_id, {_COS} AS score
             FROM probes JOIN c USING (bucket)
             WHERE query_id != neighbor_id),
         ranked AS (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id)
                       AS rank
             FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
    """,
    description="sign-LSH top-k with Hamming-2 multiprobe (the measured recall dial)",
)
def sim_lsh_topk_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5,
                    n_planes=8, probe_hamming=2)


# sim_ann_recall lives at the END of this module (after the PQ lanes):
# its oracle composes the REGISTERED oracles of every ANN path, so all
# of them must be in the registry before it decorates.


def _semdedup_oracle(seeds_sql: str) -> str:
    """The full SemDeDup ANSI mirror with a caller-supplied seeds CTE —
    shared by the fixed-16-cell lane and the auto-sized lane (whose
    seed count derives from COUNT(*) inside the SQL itself)."""
    return f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
    {seeds_sql},
    assign0 AS (
        SELECT e.vec_id, e.v, s.cell_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_l2_dot_form('e.v', 's.sv')}, s.cell_id) AS rn
        FROM e CROSS JOIN seeds s),
    elem AS (
        SELECT cell_id, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x
        FROM assign0 WHERE rn = 1),
    cmean AS (
        SELECT cell_id, pos,
               CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m
        FROM elem GROUP BY cell_id, pos),
    cvec AS (
        SELECT cell_id, list(m ORDER BY pos) AS cm
        FROM cmean GROUP BY cell_id),
    cassign AS (
        SELECT e.vec_id, e.v, c.cell_id,
               CAST(ROUND(({_l2_dot_form('e.v', 'c.cm')}) * 1000000.0)
                    AS BIGINT) AS dist_r,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_l2_dot_form('e.v', 'c.cm')}, c.cell_id) AS rn
        FROM e CROSS JOIN cvec c),
    member AS (
        SELECT vec_id, v, cell_id, dist_r FROM cassign WHERE rn = 1),
    pairs AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b
        FROM member x JOIN member y
          ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
        WHERE list_dot_product(x.v, x.v) > 0
          AND list_dot_product(y.v, y.v) > 0
          AND ROUND(list_dot_product(x.v, y.v)
                    / (sqrt(list_dot_product(x.v, x.v))
                       * sqrt(list_dot_product(y.v, y.v))), 6) >= 0.35),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, lab) AS (
        SELECT s, s FROM edges
        UNION
        SELECT ed.s, r.lab FROM edges ed JOIN reach r ON r.node = ed.d),
    comp AS (SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node),
    labeled AS (
        SELECT m.vec_id, m.cell_id,
               COALESCE(c.cluster_id, m.vec_id) AS cluster_id, m.dist_r
        FROM member m LEFT JOIN comp c ON m.vec_id = c.node),
    ranked AS (
        SELECT vec_id, cell_id, cluster_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY dist_r DESC, vec_id) AS rn
        FROM labeled)
    SELECT vec_id, cell_id, cluster_id, rn = 1 AS is_kept FROM ranked
    """


@query(
    "sim_semdedup", "similarity",
    # SemDeDup end-to-end has an EXACT oracle because every stage is
    # deterministic: the centroid training CTEs are the same as
    # sim_ivf_topk's (integer-grid means, dot-form L2, cell_id
    # tiebreaks), within-cell cosines are compared on the 1e-6 rounded
    # grid, the duplicate components are a recursive-CTE transitive
    # closure, and the keep rule ranks on the 1e-6 integer distance
    # grid with vec_id tiebreak. Since r6 the registered lane runs the
    # ARROW path (operators/similarity.semdedup_fast) against this
    # unchanged oracle: every float decision in the numpy lane is
    # either provably outside the matmul's summation-order error band
    # or recomputed with the exact sequential fold, so the fold
    # spelling's bit-compatibility carries over (VERDICT r5 task #4 —
    # this drops the sf1 line item from ~22.6 s to ~5 s and frees
    # n_cells to scale with the corpus). Zero-norm vectors are excluded
    # from pair generation in lane and oracle alike (ADVICE r5).
    oracle=_semdedup_oracle("""seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell_id, v AS sv
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16))"""),
    description="SemDeDup: k-means-cell semantic dedup, one most-atypical survivor per near-dup component",
)
def sim_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup_fast
    return semdedup_fast(t(spark, sf_dir, "embeddings"),
                         threshold=0.35, n_cells=16)


@query(
    "sim_tfidf_cosine_topk", "similarity",
    # Sparse-vector document similarity — the inverted-index (posting
    # list) counterpart of the dense-embedding ANN lanes: each document
    # is its TF-IDF term vector, similarity is exact cosine, and
    # candidate pairs come from joining posting lists per term instead
    # of any all-pairs product. Blocking key = (source, term): the
    # quadratic pair space is bounded per source block (the same
    # bound-the-block discipline as semdedup's k-means cells; at 100 TB
    # the block is domain/shard and hot stopword postings get df-capped
    # — documented knob, off here to stay exact at test scale).
    # Portability: idf = ln((N+1)/(df+1)) rides a 1e-3 integer grid, so
    # weights/dots/norms are exact BIGINTs (order-independent sums) and
    # the final cosine is one identical IEEE sqrt/divide per pair.
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
    tf AS (SELECT doc_id, source, w, COUNT(*) AS tf
           FROM tok WHERE w <> '' GROUP BY doc_id, source, w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    wv AS (
        SELECT tf.doc_id, tf.source, tf.w,
               tf.tf * CAST(ROUND(ln((CAST(n_docs AS DOUBLE) + 1.0)
                                     / (CAST(df AS DOUBLE) + 1.0))
                                  * 1000.0, 0) AS BIGINT) AS wt
        FROM tf JOIN dfreq USING (w), n),
    norms AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM wv GROUP BY doc_id
              HAVING SUM(wt * wt) > 0),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.wt * b.wt) AS dot
        FROM wv a JOIN wv b ON a.source = b.source AND a.w = b.w
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
    scored AS (
        SELECT doc_a, doc_b,
               ROUND(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(na.n2 AS DOUBLE))
                        * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b),
    sym AS (
        SELECT doc_a AS doc_id, doc_b AS neighbor_id, cosine FROM scored
        UNION ALL
        SELECT doc_b, doc_a, cosine FROM scored),
    ranked AS (
        SELECT doc_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM sym)
    SELECT doc_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= 3
    """,
    description="sparse TF-IDF cosine top-3 per document via source-blocked posting-list join (inverted-index similarity)",
)
def sim_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    wv = _tfidf_weights(spark, sf_dir)
    # zero-norm docs (every word's idf grid value is 0 — near-ubiquitous
    # tokens) have no defined cosine: drop them, matching the oracle's
    # HAVING. Without the guard the ANSI divide would throw.
    norms = (wv.groupBy("doc_id").agg(F.sum(F.col("wt") * F.col("wt"))
                                      .alias("n2"))
             .filter(F.col("n2") > 0))
    a = wv.select(F.col("doc_id").alias("doc_a"), "source", "w",
                  F.col("wt").alias("wa"))
    b = wv.select(F.col("doc_id").alias("doc_b"), "source", "w",
                  F.col("wt").alias("wb"))
    dots = (a.join(b, ["source", "w"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("n2").alias("n2b"))
    scored = (dots.join(na, "doc_a").join(nb, "doc_b")
              .select("doc_a", "doc_b",
                      F.round(F.col("dot").cast("double")
                              / (F.sqrt(F.col("n2a").cast("double"))
                                 * F.sqrt(F.col("n2b").cast("double"))), 6)
                      .alias("cosine")))
    sym = (scored.select(F.col("doc_a").alias("doc_id"),
                         F.col("doc_b").alias("neighbor_id"), "cosine")
           .unionAll(scored.select(F.col("doc_b").alias("doc_id"),
                                   F.col("doc_a").alias("neighbor_id"),
                                   "cosine")))
    w = W.partitionBy("doc_id").orderBy(F.col("cosine").desc(),
                                        "neighbor_id")
    return (sym.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "neighbor_id", "cosine", "rank"))


def _tfidf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared TF-IDF weight build for the sparse and dense cosine
    lanes: (doc_id, source, w, wt) with wt = tf * idf on the exact
    1e-3 integer grid."""
    d = t(spark, sf_dir, "documents")
    # No spread() here: measured r12-opt (interleaved A/B at sf0.1) —
    # widening the tokenize cost sim_hybrid_rrf 1.8x and the dense lane
    # 1.5x, because the TF partial-agg is map-combinable and cheap (the
    # 31-word vocab collapses it) while the repartition pays a full
    # text shuffle. The token lanes that DO spread (text.py) carry
    # per-row work heavy enough to amortize it; this one does not.
    tok = (d.select("doc_id", "source",
                    F.explode(F.split(F.lower("text"), " ")).alias("w"))
           .filter(F.col("w") != ""))
    tf = tok.groupBy("doc_id", "source", "w").agg(
        F.count(F.lit(1)).alias("tf"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(F.log((F.col("n_docs").cast("double") + 1.0)
                        / (F.col("df").cast("double") + 1.0)) * 1000.0, 0) \
           .cast("long")
    return (tf.join(F.broadcast(dfreq), "w")
            .crossJoin(F.broadcast(n))
            .select("doc_id", "source", "w",
                    (F.col("tf") * idf).alias("wt")))


@query(
    "sim_tfidf_cosine_topk_dense", "similarity",
    # Same output as sim_tfidf_cosine_topk, computed the OTHER
    # scale-correct way: instead of exploding posting lists through a
    # shuffle (19M intermediate rows here, because the synthetic
    # corpus's 31-word vocab makes every posting maximally hot), each
    # source block becomes ONE dense numpy gram matrix inside
    # applyInPandas — docs × terms matmul, O(block² · vocab) flops with
    # zero shuffle rows beyond the block regroup. The "block fits an
    # executor" contract is the same one FAISS-style ANN sharding uses;
    # at 100 TB you pick per-block dense math vs posting joins by
    # vocab shape (Zipf-sparse → postings, dense/hot → this lane).
    # EXACTNESS survives the float path: integer-grid weights ≤ 5e5,
    # dots ≤ 7e12 < 2^53, so float64 matmul is exact integer
    # arithmetic; sqrt/divide/half-away-round replicate the oracle's
    # IEEE sequence bit-for-bit. Oracle = the sparse lane's oracle.
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
    tf AS (SELECT doc_id, source, w, COUNT(*) AS tf
           FROM tok WHERE w <> '' GROUP BY doc_id, source, w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    wv AS (
        SELECT tf.doc_id, tf.source, tf.w,
               tf.tf * CAST(ROUND(ln((CAST(n_docs AS DOUBLE) + 1.0)
                                     / (CAST(df AS DOUBLE) + 1.0))
                                  * 1000.0, 0) AS BIGINT) AS wt
        FROM tf JOIN dfreq USING (w), n),
    norms AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM wv GROUP BY doc_id
              HAVING SUM(wt * wt) > 0),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.wt * b.wt) AS dot
        FROM wv a JOIN wv b ON a.source = b.source AND a.w = b.w
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
    scored AS (
        SELECT doc_a, doc_b,
               ROUND(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(na.n2 AS DOUBLE))
                        * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b),
    sym AS (
        SELECT doc_a AS doc_id, doc_b AS neighbor_id, cosine FROM scored
        UNION ALL
        SELECT doc_b, doc_a, cosine FROM scored),
    ranked AS (
        SELECT doc_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM sym)
    SELECT doc_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= 3
    """,
    description="TF-IDF cosine top-3 via per-source dense gram matrix in applyInPandas (block-local numpy matmul, zero posting shuffle)",
)
def sim_tfidf_cosine_topk_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import pandas as pd

    wv = _tfidf_weights(spark, sf_dir)
    # driver-side read, closed over by the UDF: lets tests shrink the
    # tile to force multi-tile merges on tiny corpora (the fuzz lane)
    tile = int(os.environ.get("SPARK_GRAFT_GRAM_TILE", "1024"))

    def gram(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # factorize + scatter, NOT pivot_table: pandas' pivot spent 40 s
        # on a 25k×3100 group (sf10) where the direct scatter takes
        # ~0.5 s — (doc_id, w) is unique after the tf aggregation, so
        # plain assignment builds the exact same dense matrix.
        di, dvals = pd.factorize(pdf["doc_id"], sort=True)
        wi, _ = pd.factorize(pdf["w"], sort=True)
        ids = np.asarray(dvals)
        m = np.zeros((len(ids), wi.max() + 1), dtype=np.float64)
        m[di, wi] = pdf["wt"].to_numpy(np.float64)
        # zero-norm docs (all idf-grid weights 0) have no defined
        # cosine — drop them, matching both lanes' oracle HAVING.
        # Row self-dots (exact: wt² ≤ 2.5e11, ≤vocab terms → < 2^53)
        # replace the full-gram diagonal the untiled spelling used.
        norm2 = (m * m).sum(axis=1)
        keep = norm2 > 0
        ids, m, norm2 = ids[keep], m[keep], norm2[keep]
        n = len(ids)
        if n == 0:
            return pd.DataFrame(columns=["doc_id", "neighbor_id",
                                         "cosine", "rank"])
        norm = np.sqrt(norm2)
        # token-PRESENCE matrix (not wt != 0: the idf grid rounds
        # corpus-saturating terms to weight 0, and a pair sharing only
        # such a term is still a (dot=0, cosine 0.0) oracle row).
        # uint8 storage; tiles cast to float32 for the matmul — shared
        # counts ≤ vocab < 2^24, exact in float32.
        present = np.zeros(
            (len(keep), m.shape[1]), dtype=np.uint8)
        present[di, wi] = 1
        present = present[keep]

        # TILED gram: the one-shot n×n spelling allocated O(n²) for the
        # gram + cosine + shared-mask matrices — at sf10 (25k docs per
        # source) that is ~5 GB EACH across 20 concurrent workers and
        # the kernel OOM-killed the JVM. Tiles of T keep peak memory
        # O(docs×vocab + T²); per-row running top-3 merges tile results.
        # BLOCK-SPARSE SKIP: rows are clustered by their first present
        # token column, tiles carry a vocab mask, and a tile pair with
        # disjoint vocab is skipped — provably output-identical (every
        # pair in it shares no token, so `shared` masks it to the
        # sentinel anyway). On a corpus of vocab-disjoint segments
        # (sf10's salted replicas: 100 segments/source) the work drops
        # from O(n²·vocab) to the diagonal band; on a genuinely dense
        # corpus the masks all intersect and the only cost is the
        # mask test. Composite int64 key: units*2^33 - orig_rank is
        # exact (units ∈ [0,1e6], rank < 2^33, weights ≥ 0 so
        # cosine ≥ 0). The tie-break rank must be the doc's position in
        # the PRE-clustering (doc_id-ascending) order — after the
        # clustering permutation, matrix position no longer tracks
        # doc_id, and a rounded-cosine tie between two neighbors from
        # different clusters would otherwise rank by cluster position
        # instead of the oracle's neighbor_id ASC.
        order0 = np.argsort(present.argmax(axis=1), kind="stable")
        ids, m, norm = ids[order0], m[order0], norm[order0]
        present = present[order0]
        # orig_rank[p] = doc_id-ascending rank of the row now at
        # (reordered) position p
        orig_rank = order0.astype(np.int64)
        T = tile
        SENT = np.iinfo(np.int64).min
        best_key = np.full((n, 3), SENT, dtype=np.int64)
        best_col = np.zeros((n, 3), dtype=np.int64)
        starts = list(range(0, n, T))
        tile_mask = [present[t:min(t + T, n)].any(axis=0) for t in starts]
        for jt, j0 in enumerate(starts):
            j1 = min(j0 + T, n)
            for it, i0 in enumerate(starts):
                # COLUMN PRUNING: only columns active in BOTH tiles can
                # contribute to a dot product or a shared-token flag
                # (elsewhere one factor is zero) — slicing to the
                # intersection keeps the math exact and cuts the flops
                # to the tile pair's true vocabulary overlap.
                cols = np.flatnonzero(tile_mask[it] & tile_mask[jt])
                if not len(cols):
                    continue
                i1 = min(i0 + T, n)
                # ROW PRUNING: a row inactive in the tile pair's shared
                # vocabulary shares no token with ANY row of the other
                # tile (its dot and shared flag are identically zero),
                # so it can produce no candidate — drop it before the
                # O(rows_i × rows_j) elementwise stages, which otherwise
                # dominate once the matmul is column-pruned.
                pi = present[i0:i1][:, cols]
                pj = present[j0:j1][:, cols]
                ri = np.flatnonzero(pi.any(axis=1))
                rj = np.flatnonzero(pj.any(axis=1))
                if not len(ri) or not len(rj):
                    continue
                gi = i0 + ri                 # global row ids, tile i
                gj = (j0 + rj).astype(np.int64)
                mi = m[i0:i1][np.ix_(ri, cols)]
                mj = m[j0:j1][np.ix_(rj, cols)]
                g = mi @ mj.T               # exact: integer dots < 2^53
                cosb = g / np.outer(norm[gi], norm[gj])
                # half-away ROUND(,6): reproduces DuckDB's round on
                # these exact dyadic-free inputs (the multimodal
                # _round_half_away argument); Spark's F.round in the
                # sparse lane uses the BigDecimal shortest-decimal path
                # — all three agree away from the measure-zero
                # .5-boundary doubles.
                units = np.floor(cosb * 1e6 + 0.5).astype(np.int64)
                shared = (pi[ri].astype(np.float32)
                          @ pj[rj].T.astype(np.float32)) > 0
                if i0 == j0:
                    # same tile, same row subset: the diagonal is the
                    # self-pair
                    np.fill_diagonal(shared, False)
                key = np.where(shared,
                               units * (1 << 33) - orig_rank[gj], SENT)
                k = min(3, len(gj))
                sel = np.argpartition(key, key.shape[1] - k,
                                      axis=1)[:, -k:]
                rows = np.arange(len(gi))[:, None]
                cand_key = key[rows, sel]
                cand_col = gj[sel]
                # merge tile top-k into the running top-3 per row.
                # Ascending argsort reversed — negating the key would
                # wrap the int64-min sentinel onto itself and rank it
                # first. Keys are unique per (units, col) (col tiles are
                # disjoint), so no stability requirement.
                all_key = np.concatenate([best_key[gi], cand_key], axis=1)
                all_col = np.concatenate([best_col[gi], cand_col], axis=1)
                order = np.argsort(all_key, axis=1)[:, ::-1][:, :3]
                best_key[gi] = all_key[rows, order]
                best_col[gi] = all_col[rows, order]
        out_doc, out_nb, out_cos, out_rank = [], [], [], []
        valid = best_key > SENT
        n_valid = valid.sum(axis=1)
        for i in np.flatnonzero(n_valid):
            k = int(n_valid[i])
            cols = best_col[i, :k]
            # units back out of the composite key exactly
            u = (best_key[i, :k] + orig_rank[cols]) >> 33
            out_doc.append(np.full(k, ids[i]))
            out_nb.append(ids[cols])
            out_cos.append(u / 1e6)
            out_rank.append(np.arange(1, k + 1, dtype=np.int32))
        if not out_doc:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64"),
                                 "rank": pd.Series([], dtype="int32")})
        return pd.DataFrame({"doc_id": np.concatenate(out_doc),
                             "neighbor_id": np.concatenate(out_nb),
                             "cosine": np.concatenate(out_cos),
                             "rank": np.concatenate(out_rank)})

    return (wv.groupBy("source").applyInPandas(
        gram, schema="doc_id long, neighbor_id long, cosine double, rank int")
        .orderBy("doc_id", "rank"))


@query(
    "sim_hybrid_rrf", "similarity",
    # Hybrid retrieval fusion — the missing composition over the two
    # retrieval stacks this module already ships: LEXICAL ranks from
    # TF-IDF cosine (posting join restricted to the query docs) and
    # VECTOR ranks from exact embedding cosine, fused per query with
    # Reciprocal Rank Fusion: rrf = 1/(60+rank_lex) + 1/(60+rank_vec)
    # (Cormack et al.'s k=60), missing-list contributions = 0. The
    # fixture's vec_id and doc_id share a key space, so the two lists
    # rank the same ids. Exactness: each reciprocal is one IEEE divide
    # of exact integers and the fusion is ONE two-term sum — identical
    # bits cross-engine; list ranks come from the same integer-grid
    # cosine arguments both lanes already drive under the driver gate.
    # SCALE: the lexical side joins postings ONLY for the 10 query
    # docs (candidate space = docs sharing a term with a query, never
    # all-pairs); the vector side is the brute-force k-NN baseline the
    # IVF/LSH lanes swap in for at corpus scale; the fusion itself is a
    # (query, neighbor)-keyed outer join of two top-k lists — tiny by
    # construction.
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf
           FROM tok WHERE w <> '' GROUP BY doc_id, w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    wv AS (
        SELECT tf.doc_id, tf.w,
               tf.tf * CAST(ROUND(ln((CAST(n_docs AS DOUBLE) + 1.0)
                                     / (CAST(df AS DOUBLE) + 1.0))
                                  * 1000.0, 0) AS BIGINT) AS wt
        FROM tf JOIN dfreq USING (w), n),
    norms AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM wv GROUP BY doc_id
              HAVING SUM(wt * wt) > 0),
    dots AS (
        SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
               SUM(a.wt * b.wt) AS dot
        FROM wv a JOIN wv b ON a.w = b.w AND a.doc_id <> b.doc_id
        WHERE a.doc_id < 10
        GROUP BY 1, 2),
    lex AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(CAST(dot AS DOUBLE)
                                  / (sqrt(CAST(na.n2 AS DOUBLE))
                                     * sqrt(CAST(nb.n2 AS DOUBLE))), 6) DESC,
                            neighbor_id) AS rank_lex
        FROM dots
        JOIN norms na ON na.doc_id = query_id
        JOIN norms nb ON nb.doc_id = neighbor_id),
    lex5 AS (SELECT * FROM lex WHERE rank_lex <= 5),
    q AS (SELECT vec_id AS query_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
          FROM embeddings),
    vec AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(list_dot_product(qv, cv)
                                  / (sqrt(list_dot_product(qv, qv))
                                     * sqrt(list_dot_product(cv, cv))), 6)
                            DESC, neighbor_id) AS rank_vec
        FROM q, c WHERE query_id != neighbor_id),
    vec5 AS (SELECT * FROM vec WHERE rank_vec <= 5),
    fused AS (
        SELECT coalesce(l.query_id, v.query_id) AS query_id,
               coalesce(l.neighbor_id, v.neighbor_id) AS neighbor_id,
               coalesce(1.0 / (60.0 + l.rank_lex), 0.0)
                   + coalesce(1.0 / (60.0 + v.rank_vec), 0.0) AS rrf,
               CAST(l.rank_lex IS NOT NULL AS BIGINT) AS in_lex,
               CAST(v.rank_vec IS NOT NULL AS BIGINT) AS in_vec
        FROM lex5 l
        FULL OUTER JOIN vec5 v
          ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id)
    SELECT query_id, neighbor_id, rrf, in_lex, in_vec, fused_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf DESC, neighbor_id)
                        AS fused_rank
          FROM fused)
    WHERE fused_rank <= 3
    """,
    description="hybrid retrieval: TF-IDF lexical ranks + embedding cosine ranks fused per query via Reciprocal Rank Fusion (k=60), top-3",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings")
    vec5 = (bruteforce_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
            .select("query_id", "neighbor_id",
                    F.col("rank").alias("rank_vec")))
    wv = _tfidf_weights(spark, sf_dir).select("doc_id", "w", "wt")
    norms = (wv.groupBy("doc_id").agg(F.sum(F.col("wt") * F.col("wt"))
                                      .alias("n2"))
             .filter(F.col("n2") > 0))
    qs = wv.filter(F.col("doc_id") < 10) \
        .select(F.col("doc_id").alias("query_id"), "w",
                F.col("wt").alias("wt_q"))
    dots = (qs.join(wv.select(F.col("doc_id").alias("neighbor_id"), "w",
                              F.col("wt").alias("wt_c")), "w")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("wt_q") * F.col("wt_c")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("query_id"),
                      F.col("n2").alias("n2_q"))
    nb = norms.select(F.col("doc_id").alias("neighbor_id"),
                      F.col("n2").alias("n2_c"))
    cos = F.round(F.col("dot").cast("double")
                  / (F.sqrt(F.col("n2_q").cast("double"))
                     * F.sqrt(F.col("n2_c").cast("double"))), 6)
    wl = W.partitionBy("query_id").orderBy(F.desc("_cos"), "neighbor_id")
    lex5 = (dots.join(na, "query_id").join(nb, "neighbor_id")
            .withColumn("_cos", cos)
            .withColumn("rank_lex", F.row_number().over(wl))
            .filter(F.col("rank_lex") <= 5)
            .select("query_id", "neighbor_id", "rank_lex"))
    fused = (lex5.join(vec5, ["query_id", "neighbor_id"], "full_outer")
             .select("query_id", "neighbor_id",
                     (F.coalesce(1.0 / (F.col("rank_lex") + 60.0), F.lit(0.0))
                      + F.coalesce(1.0 / (F.col("rank_vec") + 60.0),
                                   F.lit(0.0))).alias("rrf"),
                     F.col("rank_lex").isNotNull().cast("long")
                     .alias("in_lex"),
                     F.col("rank_vec").isNotNull().cast("long")
                     .alias("in_vec")))
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf"), "neighbor_id")
    return (fused.withColumn("fused_rank", F.row_number().over(wf))
            .filter(F.col("fused_rank") <= 3))


# The sparse/dense TF-IDF twins share one output contract; this is the
# oracle both already carry, factored for the auto lane below.
_TFIDF_TOPK_ORACLE = """
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
    tf AS (SELECT doc_id, source, w, COUNT(*) AS tf
           FROM tok WHERE w <> '' GROUP BY doc_id, source, w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    wv AS (
        SELECT tf.doc_id, tf.source, tf.w,
               tf.tf * CAST(ROUND(ln((CAST(n_docs AS DOUBLE) + 1.0)
                                     / (CAST(df AS DOUBLE) + 1.0))
                                  * 1000.0, 0) AS BIGINT) AS wt
        FROM tf JOIN dfreq USING (w), n),
    norms AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM wv GROUP BY doc_id
              HAVING SUM(wt * wt) > 0),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.wt * b.wt) AS dot
        FROM wv a JOIN wv b ON a.source = b.source AND a.w = b.w
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
    scored AS (
        SELECT doc_a, doc_b,
               ROUND(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(na.n2 AS DOUBLE))
                        * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b),
    sym AS (
        SELECT doc_a AS doc_id, doc_b AS neighbor_id, cosine FROM scored
        UNION ALL
        SELECT doc_b, doc_a, cosine FROM scored),
    ranked AS (
        SELECT doc_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM sym)
    SELECT doc_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= 3
"""

# A block's gram matrix is docs² doubles: 4096² ≈ 128 MB — past that a
# single executor task can't hold the dense path regardless of flops.
DENSE_BLOCK_DOC_CAP = 4096
# One shuffled candidate-pair row (serialize + hash-exchange + hash-agg
# in the posting join) costs ~2 orders of magnitude more than one numpy
# matmul flop; 64 is the calibrated midpoint that reproduces the
# measured ranking on this corpus (dense 2.6 s vs sparse 12.2 s at
# sf0.1) while still sending genuinely Zipf-sparse corpora (df² tail
# << flops) to the posting join.
DENSE_FLOP_DISCOUNT = 64


def tfidf_lane_decision(spark: SparkSession, sf_dir: str,
                        dense_block_doc_cap: int = DENSE_BLOCK_DOC_CAP) -> dict:
    """The pick-by-vocab-shape rule as EXECUTABLE code (VERDICT r4
    item 4 — previously prose). Two metadata-scale aggregates over the
    shared weight table decide the lane:

    - dense flops  ~= sum over source blocks of docs² x |vocab|
      (the per-block gram matmul), gated by the hard per-block doc cap;
    - sparse work  ~= sum over (source, term) postings of df²
      (the candidate pairs the posting self-join generates).

    Zipf-sparse vocab => postings win (df² tail is tiny); hot/dense
    vocab (this synthetic corpus: 31 words, every posting maximally
    hot) => the gram matmul wins. Both estimates are exact counts, not
    samples, and cost two scalar collects."""
    wv = _tfidf_weights(spark, sf_dir)
    b = (wv.groupBy("source").agg(F.countDistinct("doc_id").alias("docs"))
         .agg(F.max("docs").alias("max_block"),
              F.sum(F.col("docs") * F.col("docs")).alias("sum_block2"))
         .collect()[0])
    v = (wv.groupBy("source", "w").agg(F.count(F.lit(1)).alias("df"))
         .agg(F.countDistinct("w").alias("n_vocab"),
              F.sum(F.col("df") * F.col("df")).alias("sum_df2"))
         .collect()[0])
    dense_flops = (b["sum_block2"] or 0) * (v["n_vocab"] or 0)
    sparse_pairs = v["sum_df2"] or 0
    lane = ("dense"
            if (b["max_block"] or 0) <= dense_block_doc_cap
            and dense_flops <= DENSE_FLOP_DISCOUNT * sparse_pairs
            else "sparse")
    return {"max_block": b["max_block"], "sum_block2": b["sum_block2"],
            "n_vocab": v["n_vocab"], "sum_df2": sparse_pairs,
            "dense_flops": dense_flops, "lane": lane}


@query(
    "sim_tfidf_auto_lane", "similarity",
    # The twins under ONE entry point: the decision rule above picks
    # gram-matmul vs posting-join per corpus shape, so a pipeline author
    # gets the scale-correct plan without knowing the rule. Output (and
    # oracle) identical to both twins by construction — the driver gate
    # therefore also proves the dispatch doesn't perturb results.
    oracle=_TFIDF_TOPK_ORACLE,
    description="TF-IDF cosine top-3 with executable lane pick: per-corpus dense-gram vs posting-join dispatch",
)
def sim_tfidf_auto_lane(spark: SparkSession, sf_dir: str) -> DataFrame:
    lane = tfidf_lane_decision(spark, sf_dir)["lane"]
    if lane == "dense":
        return sim_tfidf_cosine_topk_dense(spark, sf_dir)
    return sim_tfidf_cosine_topk(spark, sf_dir)


@query(
    "sim_semdedup_auto", "similarity",
    # The cells-proportional-to-corpus rule (SemDeDup paper: 11k cells
    # for LAION-440M; operators/similarity.auto_n_cells) made
    # driver-verdictable END-TO-END: the Spark lane sizes n_cells =
    # max(4, min(65536, ceil(n/256))) from one metadata-scale count and
    # runs the Arrow path; the oracle derives the SAME seed count from
    # COUNT(*) inside the SQL itself, so both engines train k(corpus)
    # centroids and the whole pipeline stays exactly mirrored at ANY sf
    # (sf0.001 clamps to the 4-cell floor, sf0.01 likewise, sf0.1 hits
    # ceil(2000/256)=8). This closes the loop on r5's executable sizing
    # rules: the dispatch is no longer a tested-but-unregistered code
    # path, it carries its own oracle verdict.
    oracle=_semdedup_oracle("""seeds AS (
        SELECT rn AS cell_id, v AS sv
        FROM (SELECT vec_id, v,
                     row_number() OVER (ORDER BY vec_id) AS rn FROM e)
        WHERE rn <= (SELECT GREATEST(4, LEAST(65536,
                         CAST(CEIL(COUNT(*) / 256.0) AS BIGINT)))
                     FROM e))"""),
    description="SemDeDup with corpus-sized cell count: auto_n_cells rule executed on both engines, Arrow lane vs recursive-CTE oracle",
)
def sim_semdedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import auto_n_cells, semdedup_fast
    emb = t(spark, sf_dir, "embeddings")
    return semdedup_fast(emb, threshold=0.35,
                         n_cells=auto_n_cells(emb.count()))


def _pq_oracle(m_sub: int = 4, k_codes: int = 16, sub_len: int = 16,
               n_queries: int = 10, k: int = 5) -> str:
    """ANSI mirror of the full PQ pipeline (operators/similarity.py
    pq_codebooks/pq_codes/pq_topk): per-subspace seeds = lowest-id
    subvectors, one Lloyd round on the 1e-6 integer grid, dot-form L2
    assignment with code-id tiebreaks, per-query LUTs, and the SAME
    left-to-right l0+l1+l2+l3 score fold — so even the compressed-code
    approximation carries an exact driver verdict."""
    c_cols = ", ".join(
        f"MAX(CASE WHEN s = {s} THEN code_id END) AS c{s}"
        for s in range(m_sub))
    lut_joins = "\n           ".join(
        f"JOIN lut l{s} ON l{s}.s = {s} AND l{s}.code_id = cd.c{s}"
        + (f" AND l{s}.query_id = l0.query_id" if s else "")
        for s in range(m_sub))
    score_chain = " + ".join(f"l{s}.ip" for s in range(m_sub))
    return f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
    subs AS (
        SELECT vec_id, t.s,
               list_slice(v, t.s * {sub_len} + 1, (t.s + 1) * {sub_len}) AS sv
        FROM e CROSS JOIN (SELECT unnest(range({m_sub})) AS s) t),
    seed_ids AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS code_id
        FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT {k_codes})),
    seeds AS (
        SELECT su.s, si.code_id, su.sv
        FROM subs su JOIN seed_ids si USING (vec_id)),
    assign0 AS (
        SELECT su.vec_id, su.s, su.sv, sd.code_id,
               row_number() OVER (
                   PARTITION BY su.vec_id, su.s
                   ORDER BY {_l2_dot_form('su.sv', 'sd.sv')}, sd.code_id) AS rn
        FROM subs su JOIN seeds sd ON su.s = sd.s),
    elem AS (
        SELECT s, code_id, generate_subscripts(sv, 1) - 1 AS pos,
               unnest(sv) AS x
        FROM assign0 WHERE rn = 1),
    cmean AS (
        SELECT s, code_id, pos,
               CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m
        FROM elem GROUP BY s, code_id, pos),
    cvec AS (
        SELECT s, code_id, list(m ORDER BY pos) AS cm
        FROM cmean GROUP BY s, code_id),
    enc AS (
        SELECT su.vec_id, su.s, c.code_id,
               row_number() OVER (
                   PARTITION BY su.vec_id, su.s
                   ORDER BY {_l2_dot_form('su.sv', 'c.cm')}, c.code_id) AS rn
        FROM subs su JOIN cvec c ON su.s = c.s),
    codes AS (
        SELECT vec_id, {c_cols}
        FROM enc WHERE rn = 1 GROUP BY vec_id),
    lut AS (
        SELECT su.vec_id AS query_id, su.s, c.code_id,
               list_dot_product(su.sv, c.cm) AS ip
        FROM subs su JOIN cvec c ON su.s = c.s
        WHERE su.vec_id < {n_queries}),
    scored AS (
        SELECT l0.query_id, cd.vec_id AS neighbor_id,
               ROUND({score_chain}, 6) AS score
        FROM codes cd
           {lut_joins}
        WHERE l0.query_id != cd.vec_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_ann_pq", "similarity",
    # Product quantization (Jégou et al. 2011) — the memory-compression
    # half of the FAISS-style ANN stack next to sim_ivf_topk's pruning
    # half: 64-dim float vectors become 4 one-byte codes (64x), serving
    # pays 4 LUT lookups + adds per corpus row instead of 64 multiplies.
    # Training/encoding/ADC are deterministic by the same discipline as
    # the IVF lane (lowest-id seeds, integer-grid Lloyd means, dot-form
    # L2, 1e-6 score grid, id tiebreaks), so the whole approximate
    # pipeline has an exact ANSI mirror.
    oracle=_pq_oracle(),
    description="product-quantization ANN (4x16-code ADC inner-product top-5), exact SQL-mirrored training + encoding + serving",
)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_codebooks, pq_topk
    emb = t(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb)
    return pq_topk(emb, emb.filter(F.col("vec_id") < 10), books, k=5)


def _ivf_pq_oracle(n_cells: int = 16, n_probe: int = 4, m_sub: int = 4,
                   k_codes: int = 16, sub_len: int = 16,
                   n_queries: int = 10, k: int = 5) -> str:
    """ANSI mirror of the composed IVF-PQ stack (operators/similarity.py
    ivf_pq_topk): the sim_ivf_topk oracle's coarse-quantizer CTEs
    (seeds -> integer-grid Lloyd means -> dot-form L2 cell assignment)
    joined by vec_id with the sim_ann_pq oracle's code/LUT CTEs — the
    probe set prunes which codes each query scores, ADC ranks within.
    Both halves are already exact per-lane; the composition is one
    equi-join, so it stays exact."""
    c_cols = ", ".join(
        f"MAX(CASE WHEN s = {s} THEN code_id END) AS c{s}"
        for s in range(m_sub))
    lut_joins = "\n           ".join(
        f"JOIN lut l{s} ON l{s}.s = {s} AND l{s}.code_id = cd.c{s}"
        + (" AND l{0}.query_id = l0.query_id".format(s) if s
           else " AND l0.query_id = p.query_id")
        for s in range(m_sub))
    score_chain = " + ".join(f"l{s}.ip" for s in range(m_sub))
    return f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
    ivf_seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) AS cell_id, v AS sv
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {n_cells})),
    ivf_assign0 AS (
        SELECT e.vec_id, e.v, s.cell_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_l2_dot_form('e.v', 's.sv')}, s.cell_id) AS rn
        FROM e CROSS JOIN ivf_seeds s),
    ivf_elem AS (
        SELECT cell_id, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x
        FROM ivf_assign0 WHERE rn = 1),
    ivf_cmean AS (
        SELECT cell_id, pos,
               CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m
        FROM ivf_elem GROUP BY cell_id, pos),
    ivf_cvec AS (
        SELECT cell_id, list(m ORDER BY pos) AS cm
        FROM ivf_cmean GROUP BY cell_id),
    ivf_cassign AS (
        SELECT e.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_l2_dot_form('e.v', 'c.cm')}, c.cell_id) AS rn
        FROM e CROSS JOIN ivf_cvec c),
    cells AS (
        SELECT vec_id, cell_id FROM ivf_cassign WHERE rn = 1),
    probes AS (
        SELECT vec_id AS query_id, cell_id
        FROM ivf_cassign WHERE vec_id < {n_queries} AND rn <= {n_probe}),
    subs AS (
        SELECT vec_id, t.s,
               list_slice(v, t.s * {sub_len} + 1, (t.s + 1) * {sub_len}) AS sv
        FROM e CROSS JOIN (SELECT unnest(range({m_sub})) AS s) t),
    seed_ids AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS code_id
        FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT {k_codes})),
    pq_seeds AS (
        SELECT su.s, si.code_id, su.sv
        FROM subs su JOIN seed_ids si USING (vec_id)),
    pq_assign0 AS (
        SELECT su.vec_id, su.s, su.sv, sd.code_id,
               row_number() OVER (
                   PARTITION BY su.vec_id, su.s
                   ORDER BY {_l2_dot_form('su.sv', 'sd.sv')}, sd.code_id) AS rn
        FROM subs su JOIN pq_seeds sd ON su.s = sd.s),
    pq_elem AS (
        SELECT s, code_id, generate_subscripts(sv, 1) - 1 AS pos,
               unnest(sv) AS x
        FROM pq_assign0 WHERE rn = 1),
    pq_cmean AS (
        SELECT s, code_id, pos,
               CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m
        FROM pq_elem GROUP BY s, code_id, pos),
    pq_cvec AS (
        SELECT s, code_id, list(m ORDER BY pos) AS cm
        FROM pq_cmean GROUP BY s, code_id),
    enc AS (
        SELECT su.vec_id, su.s, c.code_id,
               row_number() OVER (
                   PARTITION BY su.vec_id, su.s
                   ORDER BY {_l2_dot_form('su.sv', 'c.cm')}, c.code_id) AS rn
        FROM subs su JOIN pq_cvec c ON su.s = c.s),
    codes AS (
        SELECT vec_id, {c_cols}
        FROM enc WHERE rn = 1 GROUP BY vec_id),
    lut AS (
        SELECT su.vec_id AS query_id, su.s, c.code_id,
               list_dot_product(su.sv, c.cm) AS ip
        FROM subs su JOIN pq_cvec c ON su.s = c.s
        WHERE su.vec_id < {n_queries}),
    scored AS (
        SELECT p.query_id, cd.vec_id AS neighbor_id,
               ROUND({score_chain}, 6) AS score
        FROM codes cd
           JOIN cells cl ON cl.vec_id = cd.vec_id
           JOIN probes p ON p.cell_id = cl.cell_id
           {lut_joins}
        WHERE p.query_id != cd.vec_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {k}
    """


@query(
    "sim_ann_ivf_pq", "similarity",
    # The composed FAISS-style stack (VERDICT r10 task #3): IVF pruning
    # x PQ compression in ONE serving plan — each query scores only its
    # 4 probed cells' members, and each candidate costs 4 LUT lookups
    # over 1-byte codes instead of 64 float multiplies. At 100 TB this
    # is the only ANN shape that works: the code table is 64x smaller
    # than the corpus AND the cell filter prunes ~3/4 of it per query
    # before the scan. Exact ANSI mirror = the two per-lane oracles
    # joined by vec_id (both halves already driver-proven exact).
    oracle=_ivf_pq_oracle(),
    description="composed IVF-PQ ANN: coarse-quantizer cell pruning then 4x16-code ADC top-5, exact SQL-mirrored end to end",
)
def sim_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_pq_topk
    emb = t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10),
                       k=5, n_cells=16, n_probe=4)


@query(
    "sim_ann_pq_prod", "similarity",
    # The PRODUCTION PQ geometry made executable (VERDICT r11 task #4):
    # 8 subspaces x 256 codes = 64-bit codes, the standard FAISS
    # deployment shape (Jégou et al. 2011 use m=8, k*=256 throughout) —
    # vs the deliberately coarse 4x16 = 16-bit contract demo of
    # sim_ann_pq. Same train/encode/serve plan; the 4x the code size
    # buys back most of the ADC ranking precision the 16-bit geometry
    # gives up (priced as an executable recall row in sim_ann_recall).
    # Serving-side expressions are STRING-BUILT (_pq_lut_expr /
    # _nearest_cells_expr text path): the Column spelling of a 256-code
    # LUT costs ~80 s of py4j driver time; the JVM parses the text form
    # in milliseconds, bit-identically.
    oracle=_pq_oracle(m_sub=8, k_codes=256, sub_len=8),
    description="production-geometry PQ ANN (8x256 codebooks, 64-bit ADC top-5), exact SQL-mirrored training + encoding + serving",
)
def sim_ann_pq_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_codebooks, pq_topk
    emb = t(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m_sub=8, k_codes=256)
    return pq_topk(emb, emb.filter(F.col("vec_id") < 10), books, k=5)


@query(
    "sim_ann_ivf_pq_prod", "similarity",
    # The actual 100 TB serving shape: IVF pruning x PRODUCTION-geometry
    # PQ compression (8x256 = 64-bit codes). Same composed plan as
    # sim_ann_ivf_pq with the PQ half riding the broadcast data-join
    # forms (the literal 2048-entry trees OOM a vanilla driver — see
    # sim_ann_pq_prod); the oracle is the same parameterized mirror at
    # the production geometry.
    oracle=_ivf_pq_oracle(m_sub=8, k_codes=256, sub_len=8),
    description="composed IVF-PQ ANN at the production PQ geometry (cell pruning + 8x256-code ADC top-5), exact SQL-mirrored end to end",
)
def sim_ann_ivf_pq_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_pq_topk
    emb = t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10),
                       k=5, n_cells=16, n_probe=4, m_sub=8, k_codes=256)


# Recall contract for EVERY approximate ANN path, composed from the
# REGISTERED oracles of the exact and approximate queries themselves —
# every component is deterministic, so recall@5 is a single exact
# number, not a statistical bound. This is the acceptance metric an
# engineer reads before trusting a bucketed/compressed path at 100 TB.
# (Registered after all the ANN lanes: the oracle reads theirs from the
# registry at decoration time.)
def _ann_recall_oracle() -> str:
    from .registry import _REGISTRY
    parts = {m: _REGISTRY[q].oracle for m, q in [
        ("bf", "sim_bruteforce_topk"),
        ("lsh", "sim_lsh_topk"),
        ("lsh2", "sim_lsh_topk_probe2"),
        ("ivf", "sim_ivf_topk"),
        ("pq", "sim_ann_pq"),
        ("ivf_pq", "sim_ann_ivf_pq"),
        ("pq_prod", "sim_ann_pq_prod"),
        ("ivf_pq_prod", "sim_ann_ivf_pq_prod"),
    ]}
    withs = ",\n         ".join(f"{m} AS ({sql})" for m, sql in parts.items())
    unions = "\n        UNION ALL\n".join(f"""
        SELECT '{m}' AS method,
               (SELECT COUNT(*) FROM bf) AS n_true,
               (SELECT COUNT(*) FROM bf
                JOIN {m} USING (query_id, neighbor_id)) AS n_hits"""
                                          for m in parts if m != "bf")
    return f"""
    WITH {withs}
    SELECT method, n_true, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall
    FROM ({unions})
    """


@query(
    "sim_ann_recall", "similarity",
    oracle=_ann_recall_oracle(),
    description="exact recall@5 of the sign-LSH, IVF, PQ (demo + production geometry), and IVF-PQ approximate paths vs brute force",
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured at sf0.01: IVF (4/16 probes) recall@5 = 0.92; sign-LSH
    8-plane recall@5 = 0.18 at Hamming-1 probes and 0.38 at Hamming-2
    (37 of 256 buckets probed); PQ (4x16 codes, full scan) = 0.30;
    composed IVF-PQ = 0.34 (r11); production-geometry PQ (8x256 codes)
    = 0.60 and composed IVF x production-PQ = 0.58 (r12; 0.42 / 0.40
    at sf0.1). The numbers say what the designs imply: IVF probes
    ~1/4 of the corpus and keeps most true neighbors; LSH shatters
    1000 vectors across 256 buckets — great for near-dup candidate
    pairs (high-cosine vectors collide), thin for general top-k. The
    demo PQ geometry is DELIBERATELY coarse — 16 bits per 64-dim
    vector (4 subspaces x 4-bit codebooks, 128x compression) — so ADC
    ranking is blunt at the top-5 grain; the production FAISS geometry
    (8x256 = 64 bits, Jégou et al.'s standard m=8/k*=256) is now an
    EXECUTABLE row (sim_ann_pq_prod) and measures exactly the claimed
    trade: 4x the code size buys recall back at every rehearsed scale
    — 0.60 vs 0.30 at sf0.01, 0.42 vs 0.18 at sf0.1 (2000 vectors,
    where the 256-code books stop being corpus-sized), same plan
    shape. Composing the IVF filter ON TOP of PQ is recall-positive
    here (0.34 > 0.30): pruning far cells removes high-ADC-score false
    positives that crowd the top-5, while most true neighbors sit in
    the probed quarter of the corpus — pruning and compression errors
    partially cancel, which is why IVF-PQ is the default 100 TB
    serving shape, not just the cheap one. At the PRODUCTION geometry
    the composition is recall-NEUTRAL instead (0.58 vs 0.60): with
    64-bit codes there are few ADC false positives left for the cell
    filter to remove, so pruning only costs the stray out-of-probe
    true neighbor — you pay ~2 recall points for scoring a quarter of
    the corpus. Raise n_probe / k_codes to buy recall with the same
    plan."""
    from ..operators.similarity import ivf_pq_topk, pq_codebooks, pq_topk
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # persist: bf feeds each method's semi-join AND each n_true agg —
    # many evaluations of the broadcast-scan-window lineage without it.
    # The eager localCheckpoint at the end lets us unpersist before
    # returning, so repeated invocations don't accumulate cache entries.
    bf = (bruteforce_topk(emb, queries, k=5)
          .select("query_id", "neighbor_id").persist())
    books = pq_codebooks(emb)
    books_prod = pq_codebooks(emb, m_sub=8, k_codes=256)
    approx = {
        "lsh": lsh_topk(emb, queries, k=5, n_planes=8),
        "lsh2": lsh_topk(emb, queries, k=5, n_planes=8, probe_hamming=2),
        "ivf": ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4),
        "pq": pq_topk(emb, queries, books, k=5),
        "ivf_pq": ivf_pq_topk(emb, queries, k=5, n_cells=16, n_probe=4,
                              books=books),
        "pq_prod": pq_topk(emb, queries, books_prod, k=5),
        "ivf_pq_prod": ivf_pq_topk(emb, queries, k=5, n_cells=16,
                                   n_probe=4, books=books_prod),
    }
    outs = []
    for method, df in approx.items():
        hits = bf.join(df.select("query_id", "neighbor_id"),
                       ["query_id", "neighbor_id"], "left_semi")
        stat = (bf.agg(F.count(F.lit(1)).alias("n_true"))
                .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
                .select(F.lit(method).alias("method"), "n_true", "n_hits"))
        outs.append(stat)
    out = outs[0]
    for s in outs[1:]:
        out = out.unionByName(s)
    out = out.select(
        "method", "n_true", "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_true"), 6)
            .alias("recall"))
    # materialize the 5-row result now, then release the cached truth
    # set — the caller gets a lineage-free frame, and nothing leaks.
    out = out.localCheckpoint(eager=True)
    bf.unpersist()
    return out


@query(
    "sim_embedding_near_dup_auto", "similarity",
    # The fixed 4-plane near-dup lane's blocking made corpus-sized and
    # EXECUTABLE (r11; the dedup_minhash_recall_auto / auto_simhash
    # playbook). Motivation is a measurement, not theory: at the sf10
    # oracle sweep (200k vectors) the fixed lane's 16 buckets hold
    # ~12.5k members each — ~78M candidate pairs per bucket and only 16
    # join keys, so a 32-core box runs ~12 tasks for tens of minutes on
    # BOTH engines. auto_n_planes (operators/similarity.py) sizes
    # B = ceil(log2(n/1024)) from one COUNT(*) so per-bucket quadratic
    # work stays ~1024^2 at any corpus; the ORACLE derives the same B
    # from the same COUNT(*) and builds the same integer hyperplanes
    # from the same ((p*31+j*17)%13)-6 formula (mirror equality of the
    # B formula, the plane lists, and the resulting buckets is pinned by
    # tests), so the two engines cannot disagree at any rehearsed scale.
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    nb AS (SELECT CASE WHEN n <= 1024 THEN 4
                  ELSE GREATEST(4, LEAST(48, (
                      SELECT MIN(t.b)
                      FROM (SELECT unnest(range(54)) AS b) t
                      WHERE ((n + 1023) // 1024 - 1) >> t.b = 0))) END AS b
           FROM (SELECT COUNT(*) AS n FROM e)),
    pl AS (SELECT p,
                  list_transform(range(64),
                      j -> CAST(((p * 31 + j * 17) % 13) - 6 AS DOUBLE))
                      AS plane
           FROM (SELECT unnest(range(CAST((SELECT b FROM nb) AS BIGINT)))
                 AS p)),
    bk AS (SELECT e.vec_id,
                  SUM(CASE WHEN list_dot_product(e.v, pl.plane) > 0
                           THEN (CAST(1 AS BIGINT) << pl.p)
                           ELSE CAST(0 AS BIGINT) END) AS bucket
           FROM e CROSS JOIN pl GROUP BY e.vec_id),
    b2 AS (SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id))
    SELECT a.vec_id AS doc_a, c.vec_id AS doc_b,
           ROUND(list_dot_product(a.v, c.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM b2 a JOIN b2 c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE ROUND(list_dot_product(a.v, c.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.35
    """,
    description="embedding-cosine near-dup pairs with corpus-sized sign-LSH blocking (B from COUNT(*), mirrored in the oracle)",
)
def sim_embedding_near_dup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_planes=None -> auto_n_planes(count): B=4 at the driver-gate SFs
    # (n <= 1024, where this lane provably equals the fixed one), B=8 at
    # sf10's 200k vectors (256 buckets, ~780 members each — the bucketed
    # join parallelizes across keys instead of melting 12 tasks).
    return embedding_near_dup_pairs(t(spark, sf_dir, "embeddings"),
                                    threshold=0.35)

"""Text-analysis queries over `documents` (SURVEY.md §2.2 LLM-ext).

Oracles re-express each operator's arithmetic in DuckDB SQL — same IEEE
op sequence per row, so values match exactly without tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import (
    BPE_TOKEN_RE,
    GOPHER_STOPWORDS,
    fingerprint_col,
    lang_id_col,
    marker_count,
    normalized_md5_col,
    quality_cols,
    token_counts,
    words_col,
)

_GOPHER_STOPS_SQL = "(" + ",".join(f"'{w}'" for w in GOPHER_STOPWORDS) + ")"
from ..operators.spread import spread
from ._util import t
from .registry import query


@query(
    "text_token_stats", "text",
    oracle=rf"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars_measured,
           n_chars AS n_chars_recorded
    FROM documents
    """,
    description="token counting: whitespace + BPE-ish regex classes",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(t(spark, sf_dir, "documents"))
    cols = token_counts("text")
    return d.select(
        "doc_id",
        cols["n_ws_tokens"].alias("n_ws_tokens"),
        cols["n_bpe_tokens"].alias("n_bpe_tokens"),
        cols["n_chars_measured"].alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_recorded"),
    )


_MARKER_SQL = {
    "en": "('the','a','and','of')",
    "es": "('el','la','los','de')",
    "de": "('der','die','und','das')",
    "fr": "('le','les','et','des')",
    "zh": "('的','是','了','在')",
}
_COUNTS_SQL = ",\n".join(
    f"len(list_filter(string_split(text,' '), w -> w IN {s})) AS c_{lang}"
    for lang, s in _MARKER_SQL.items())
_BEST_SQL = "greatest(c_en, c_es, c_de, c_fr, c_zh)"
_CASE_SQL = ("CASE "
             + " ".join(f"WHEN c_{lang} > 0 AND c_{lang} = {_BEST_SQL} "
                        f"THEN '{lang}'" for lang in _MARKER_SQL)
             + " ELSE 'und' END")


@query(
    "text_lang_id", "text",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_recorded, {_COUNTS_SQL}
        FROM documents
    )
    SELECT doc_id, lang_recorded, {_CASE_SQL} AS lang_pred,
           CAST(c_en AS BIGINT) AS en_markers
    FROM scored
    """,
    description="stopword-marker language ID heuristic (argmax, fixed ties)",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(t(spark, sf_dir, "documents"))
    from ..operators.text import LANG_MARKERS, marker_count
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_recorded"),
        lang_id_col("text").alias("lang_pred"),
        marker_count(words_col("text"), LANG_MARKERS["en"]).alias("en_markers"),
    )


# The composite quality score as a DuckDB expression over column `text`
# — the SQL mirror of operators/text.quality_cols()['quality_score']
# (identical IEEE op sequence => bit-identical, so even a `>= threshold`
# GATE on it is deterministic cross-engine). Shared by text_quality_score
# and the composed multimodal pipeline's oracle.
QUALITY_SCORE_SQL = r"""least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE)) * 0.3
           + least(CAST(len(list_filter(string_split(text,' '),
                        w -> w IN ('the','a','and','of'))) AS DOUBLE)
                   / CAST(len(string_split(text,' ')) AS DOUBLE) * 5.0, 1.0) * 0.3"""


@query(
    "text_quality_score", "text",
    oracle=rf"""
    SELECT doc_id,
           (CAST(length(text) AS DOUBLE) - (CAST(len(string_split(text,' ')) AS DOUBLE) - 1))
               / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_word_len,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST(len(list_filter(string_split(text,' '),
                    w -> w IN ('the','a','and','of'))) AS DOUBLE)
               / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_ratio,
           {QUALITY_SCORE_SQL}
               AS quality_score
    FROM documents
    """,
    description="quality scoring: word length / punctuation / stopword ratios",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(t(spark, sf_dir, "documents"))
    cols = quality_cols("text")
    return d.select("doc_id", *(c.alias(n) for n, c in cols.items()))


@query(
    "text_bigram_tf", "text",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    )
    SELECT t1.tok || ' ' || t2.tok AS bigram,
           COUNT(*) AS tf,
           COUNT(DISTINCT t1.doc_id) AS df
    FROM toks t1
    JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    GROUP BY bigram
    HAVING COUNT(*) >= 10
    """,
    description="word bigram term/document frequencies (n-gram TF)",
)
def text_bigram_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(t(spark, sf_dir, "documents"))
    words = words_col("text")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("tf"),
             F.countDistinct("doc_id").alias("df"))
        .filter(F.col("tf") >= 10)
    )


@query(
    "text_fingerprint", "text",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '),
                       w -> CAST(ascii(substring(w, 1, 1)) AS BIGINT) * 31
                            + CAST(length(w) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_md5
    FROM documents
    """,
    description="rolling-hash document fingerprint + normalized content md5",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        fingerprint_col("text").alias("fingerprint"),
        normalized_md5_col("text").alias("content_md5"),
    )


@query(
    "text_tfidf_topk", "text",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               ROUND(tf * ln((CAST(n_docs AS DOUBLE) + 1.0)
                             / (CAST(df AS DOUBLE) + 1.0)), 6) AS tfidf
        FROM tf JOIN dfreq USING (word), n
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, word) AS rank
        FROM scored
    )
    SELECT doc_id, word, tfidf, rank FROM ranked WHERE rank <= 3
    """,
    description="TF-IDF top-3 terms per document (corpus-level IDF join)",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IDF is a tiny per-word table (vocabulary-sized) joined back to the
    # doc-term table; n_docs is a 1-row broadcast. At 100 TB the df/tf
    # aggregations are the only shuffles, both on compact keys.
    from pyspark.sql import Window as W
    d = spread(t(spark, sf_dir, "documents"))
    toks = d.select("doc_id",
                    F.explode(F.split(F.lower("text"), " ")).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "word").crossJoin(F.broadcast(n))
              .select("doc_id", "word",
                      F.round(F.col("tf")
                              * F.log((F.col("n_docs").cast("double") + 1.0)
                                      / (F.col("df").cast("double") + 1.0)), 6)
                      .alias("tfidf")))
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "word", "tfidf", "rank"))


_QUALITY_SCORE_SQL = r"""
    least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
    + (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE)) * 0.3
    + least(CAST(len(list_filter(string_split(text,' '),
                 w -> w IN ('the','a','and','of'))) AS DOUBLE)
            / CAST(len(string_split(text,' ')) AS DOUBLE) * 5.0, 1.0) * 0.3
"""


@query(
    "text_training_prep", "text",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source, text,
               {_QUALITY_SCORE_SQL} AS q,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_md5
        FROM documents
    ), filtered AS (
        SELECT * FROM scored WHERE q >= 0.5
    ), deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY content_md5
                                         ORDER BY doc_id) AS rn
            FROM filtered) WHERE rn = 1
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
           ROUND(SUM(q) / COUNT(*), 6) AS avg_quality
    FROM deduped
    GROUP BY lang, source
    """,
    description="composed training-data prep: quality filter -> exact dedup -> corpus stats",
)
def text_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the end-to-end shape of a corpus-prep job: score -> filter ->
    # content-hash dedup (keep lowest id) -> per-(lang, source) stats.
    # Every stage is the already-audited operator; composition adds no
    # new shuffle beyond the dedup window and final aggregate.
    from pyspark.sql import Window as W
    d = spread(t(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "lang", "source", "text",
        quality_cols("text")["quality_score"].alias("q"),
        normalized_md5_col("text").alias("content_md5"))
    filtered = scored.filter(F.col("q") >= 0.5)
    w = W.partitionBy("content_md5").orderBy("doc_id")
    deduped = (filtered.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("total_tokens"),
        F.round(F.sum("q") / F.count(F.lit(1)), 6).alias("avg_quality"),
    )


@query(
    "text_train_split", "text",
    oracle="""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 'cc' THEN 'train'
                WHEN bucket < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, substr(md5(text), 1, 2) AS bucket FROM documents) b
    """,
    description="deterministic content-addressed train/val/test split (md5 bucket)",
)
def text_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content-hash bucketing: the split follows the DOCUMENT, not the
    # row position, so re-shards/reloads/dedup reruns can never leak a
    # train doc into test. 256 hex buckets: < 'cc' = 204/256 ~ 80%
    # train, < 'e6' = 26/256 ~ 10% val, rest test. Pure per-row
    # expression: no shuffle, survives any partitioning.
    d = t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5("text"), 1, 2)
    return d.select(
        "doc_id", bucket.alias("bucket"),
        F.when(bucket < "cc", "train")
         .when(bucket < "e6", "val")
         .otherwise("test").alias("split"))


@query(
    "text_vocab_build", "text",
    oracle="""
    SELECT word, n_occurrences, n_docs,
           row_number() OVER (ORDER BY n_occurrences DESC, word) - 1
               AS vocab_id
    FROM (
        SELECT word, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents) w
        WHERE word <> ''
        GROUP BY word
    ) c
    """,
    description="tokenizer vocabulary build: frequency-ranked word -> contiguous id",
)
def text_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The vocabulary-construction step of tokenizer training: corpus
    # term counts, then a contiguous id assigned by (frequency desc,
    # word) — deterministic, so retraining on re-sharded data yields the
    # identical vocab. The explode+count is map-side combinable. The id
    # assignment is the two-phase total sort from operators/ranking.py
    # (range exchange + offset merge) — a web-scale vocab is billions of
    # rows, and the r4 `Window.orderBy` spelling funneled them all into
    # ONE task (WindowExec: No Partition Defined); global_rank never
    # collapses below the shuffle parallelism.
    from ..operators.ranking import global_rank
    d = t(spark, sf_dir, "documents")
    counts = (d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word")
              .agg(F.count(F.lit(1)).alias("n_occurrences"),
                   F.countDistinct("doc_id").alias("n_docs")))
    ranked = global_rank(
        counts, [F.col("n_occurrences").desc(), F.col("word")],
        rank_col="_rk")
    return ranked.select(
        "word", "n_occurrences", "n_docs",
        (F.col("_rk") - 1).alias("vocab_id"))


@query(
    "text_sequence_pack", "text",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(SUM(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS token_offset,
           CAST(coalesce(SUM(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // 512 AS BIGINT) AS pack_id
    FROM toks
    """,
    description="training sequence packing: cumulative token offset -> 512-token pack ids",
)
def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sequence packing for pretraining batches: within each source
    # stream (ordered by doc_id), each document starts at the running
    # token offset of its predecessors and lands in pack
    # floor(offset/512). Pure window arithmetic — one shuffle on
    # source, no state, and the pack assignment is reproducible under
    # any input partitioning. (Offset-based packing, the streaming-
    # friendly approximation of bin packing — docs longer than the
    # budget span packs, exactly as concat-and-chunk training does.)
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source",
                    F.size(F.split("text", " ")).alias("n_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id", "source", "n_tokens",
        offset.cast("long").alias("token_offset"),
        F.floor(offset / 512).alias("pack_id"))


@query(
    "text_repetition_filter", "text",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ng AS (SELECT doc_id,
           CASE WHEN len(w) >= 3 THEN
               list_transform(generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
           ELSE [] END AS ng
           FROM w)
    SELECT doc_id,
           len(ng) AS n_trigrams,
           len(list_distinct(ng)) AS n_distinct,
           CASE WHEN len(ng) > 0 THEN
               ROUND(1.0 - CAST(len(list_distinct(ng)) AS DOUBLE) / len(ng), 6)
           ELSE 0.0 END AS rep_ratio,
           CASE WHEN len(ng) > 0 THEN
               (1.0 - CAST(len(list_distinct(ng)) AS DOUBLE) / len(ng)) > 0.02
           ELSE FALSE END AS is_repetitive
    FROM ng
    """,
    description="within-doc trigram repetition ratio (Gopher-style rep filter)",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style repetition signal: fraction of duplicated word
    # trigrams inside each document — boilerplate and degenerate
    # generations score high and get filtered before training. Pure
    # per-row array expressions (no explode: the trigram list never
    # leaves its row, so there is no shuffle and no row blow-up; at
    # 100 TB this is a map-only pass).
    # split ONCE into a projection column before the higher-order
    # expression: Spark does no CSE across array-lambda elements, so an
    # inline split(text) inside the transform re-tokenizes the document
    # per trigram (O(words^2) — measured 8x slower at sf0.1).
    d = t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split("text", " ").alias("w"))
    ng = F.expr(
        "CASE WHEN size(w) >= 3 THEN "
        "transform(sequence(0, size(w) - 3), "
        "i -> concat_ws(' ', w[i], w[i+1], w[i+2])) ELSE array() END")
    base = words.select("doc_id", ng.alias("ng"))
    n_tri = F.size("ng")
    n_uniq = F.size(F.array_distinct("ng"))
    ratio = F.lit(1.0) - n_uniq.cast("double") / n_tri
    return base.select(
        "doc_id",
        n_tri.alias("n_trigrams"),
        n_uniq.alias("n_distinct"),
        F.when(n_tri > 0, F.round(ratio, 6)).otherwise(0.0).alias("rep_ratio"),
        F.when(n_tri > 0, ratio > 0.02).otherwise(F.lit(False))
            .alias("is_repetitive"))


@query(
    "text_pii_redact", "text",
    oracle=r"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@' || source ||
               '.example.com or call 555-0' ||
               lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
               ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
               CAST(doc_id % 100 AS VARCHAR) AS raw
        FROM documents),
    red AS (
        SELECT doc_id, raw,
               regexp_replace(regexp_replace(regexp_replace(raw,
                   '[a-z0-9]+@[a-z0-9.]+\.com', '<EMAIL>', 'g'),
                   '555-0[0-9]{3}', '<PHONE>', 'g'),
                   '10\.0\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS clean
        FROM injected)
    SELECT doc_id,
           CAST(length(regexp_extract_all(raw,
                '[a-z0-9]+@[a-z0-9.]+\.com')) AS INT) AS n_emails,
           CAST(length(regexp_extract_all(raw, '555-0[0-9]{3}')) AS INT)
               AS n_phones,
           CAST(length(regexp_extract_all(raw,
                '10\.0\.[0-9]{1,3}\.[0-9]{1,3}')) AS INT) AS n_ips,
           md5(clean) AS clean_md5,
           CAST(length(raw) - length(clean) AS BIGINT) AS chars_removed,
           NOT contains(clean, '@') AS no_residual_at
    FROM red
    """,
    description="PII redaction: regex email/phone/IP scrub (training-data prep)",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Training-data PII scrub: the mandatory pre-training pass that
    # strips contact info. PII is INJECTED deterministically (the
    # corpus is synthetic) so the redaction is oracle-checkable, then
    # removed with chained regexp_replace — narrow per-row codegen,
    # no shuffle, linear at 100 TB. Patterns stay in the RE2-and-Java
    # common subset so both engines see identical matches.
    d = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id"),
        F.lit("@"), F.col("source"), F.lit(".example.com or call 555-0"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"))
    email = r"[a-z0-9]+@[a-z0-9.]+\.com"
    phone = r"555-0[0-9]{3}"
    ip = r"10\.0\.[0-9]{1,3}\.[0-9]{1,3}"
    clean = F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.col("raw"), email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>")
    return (d.select("doc_id", raw.alias("raw"))
            .withColumn("clean", clean)
            .select(
                "doc_id",
                F.regexp_count("raw", F.lit(email)).alias("n_emails"),
                F.regexp_count("raw", F.lit(phone)).alias("n_phones"),
                F.regexp_count("raw", F.lit(ip)).alias("n_ips"),
                F.md5(F.col("clean").cast("binary")).alias("clean_md5"),
                (F.length("raw") - F.length("clean")).cast("long")
                    .alias("chars_removed"),
                (~F.col("clean").contains("@")).alias("no_residual_at"),
            ))


def _pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline's shared front half — inject -> redact ->
    quality gate -> exact content dedup — used by both near-dup twins
    and by the lane decision, so the three build byte-identical
    survivor streams."""
    # No spread() here: measured r12-opt (interleaved A/B at sf0.1) —
    # widening the front half was a wash on text_pipeline_full_lsh and
    # slightly negative on _auto; the regex/md5 map work is too cheap
    # at this corpus size to amortize the repartition's text shuffle.
    d = t(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"), F.lit(" contact user"), F.col("doc_id"),
                   F.lit("@"), F.col("source"), F.lit(".example.com"))
    clean = F.regexp_replace(raw, r"[a-z0-9]+@[a-z0-9.]+\.com", "<EMAIL>")
    redacted = d.select("doc_id", "lang", clean.alias("clean"))
    quality = (redacted
               .withColumn("n_words", F.size(F.split("clean", " ")))
               .filter(F.col("n_words") >= 20))
    keeper = (quality.groupBy(F.md5(F.col("clean").cast("binary")))
              .agg(F.min("doc_id").alias("doc_id")))
    return quality.join(keeper, "doc_id", "left_semi")


@query(
    "text_pipeline_full", "text",
    oracle=r"""
    WITH injected AS (
        SELECT doc_id, lang,
               text || ' contact user' || doc_id || '@' || source ||
               '.example.com' AS raw
        FROM documents),
    redacted AS (
        SELECT doc_id, lang,
               regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+\.com',
                              '<EMAIL>', 'g') AS clean
        FROM injected),
    quality AS (
        SELECT doc_id, lang, clean,
               len(string_split(clean, ' ')) AS n_words
        FROM redacted
        WHERE len(string_split(clean, ' ')) >= 20),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(clean)),
    survivors AS (
        SELECT q.* FROM quality q JOIN exact_kept k USING (doc_id)),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(clean, ' ')) - 2, 0) + 1),
                   i -> array_to_string(
                       list_slice(string_split(clean, ' '), i, i + 2), ' '))))
                   AS shingle
        FROM survivors),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    neardup_b AS (
        SELECT DISTINCT doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                               AND a.doc_id < b.doc_id
            GROUP BY 1, 2) c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5),
    final AS (
        SELECT s.*,
               CASE WHEN substr(md5(clean), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(clean), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM survivors s
        WHERE s.doc_id NOT IN (SELECT doc_b FROM neardup_b))
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM final
    GROUP BY split, lang
    """,
    description="composed training pipeline: redact -> quality -> dedup -> near-dup -> split",
)
def text_pipeline_full(spark: SparkSession, sf_dir: str,
                       survivors: DataFrame | None = None) -> DataFrame:
    # The whole training-data prep chain as ONE declarative plan —
    # Catalyst sees every stage, so column pruning and predicate
    # pushdown cross stage boundaries (no materialization walls
    # between steps, unlike a multi-job pipeline). Stage shapes at
    # 100 TB: redact/quality are map-only; exact dedup one hash
    # shuffle on content hash; near-dup is the inverted-index join
    # (LSH replaces it at scale, operators/dedup.py); the split is a
    # map-side md5 bucket. Inject->redact mirrors text_pii_redact so
    # the scrub provably fires.
    from ..operators.dedup import ngram_jaccard_pairs
    if survivors is None:
        survivors = _pipeline_survivors(spark, sf_dir)
    pairs = ngram_jaccard_pairs(survivors, threshold=0.5, n=3,
                                text_col="clean")
    dup_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    bucket = F.substring(F.md5(F.col("clean").cast("binary")), 1, 2)
    final = (survivors.join(dup_b, "doc_id", "left_anti")
             .withColumn("split",
                         F.when(bucket < "cc", "train")
                          .when(bucket < "e6", "val")
                          .otherwise("test")))
    return (final.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").cast("long").alias("total_words"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc")))


def _pipeline_lsh_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    """Oracle for the LSH-mode composed pipeline: the same
    inject->redact->quality->exact-dedup CTEs as text_pipeline_full, with
    the near-dup stage swapped for portable MinHash banding (generated
    from the operator's own permutation coefficients)."""
    from ..operators.dedup import MINHASH_P, minhash_perm_coeffs
    rows = num_hashes // bands
    min_exprs = ",\n               ".join(
        f"min((x * {minhash_perm_coeffs(i)[0]} + {minhash_perm_coeffs(i)[1]})"
        f" % {MINHASH_P}) AS h{i}"
        for i in range(num_hashes))
    sig_list = ", ".join(f"h{i}" for i in range(num_hashes))
    return rf"""
    WITH injected AS (
        SELECT doc_id, lang,
               text || ' contact user' || doc_id || '@' || source ||
               '.example.com' AS raw
        FROM documents),
    redacted AS (
        SELECT doc_id, lang,
               regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+\.com',
                              '<EMAIL>', 'g') AS clean
        FROM injected),
    quality AS (
        SELECT doc_id, lang, clean,
               len(string_split(clean, ' ')) AS n_words
        FROM redacted
        WHERE len(string_split(clean, ' ')) >= 20),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(clean)),
    survivors AS (
        SELECT q.* FROM quality q JOIN exact_kept k USING (doc_id)),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(clean, ' ')) - 2, 0) + 1),
                   i -> array_to_string(
                       list_slice(string_split(clean, ' '), i, i + 2), ' '))))
                   AS shingle
        FROM survivors),
    hx AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
                   % {MINHASH_P} AS x
        FROM sh),
    sig AS (
        SELECT doc_id,
               {min_exprs}
        FROM hx GROUP BY doc_id),
    arr AS (SELECT doc_id, [{sig_list}] AS s FROM sig),
    banded AS (
        SELECT doc_id, bt.b AS band,
               array_to_string(
                   list_slice(s, bt.b * {rows} + 1, (bt.b + 1) * {rows}), ',')
                   AS key
        FROM arr CROSS JOIN (SELECT unnest(range({bands})) AS b) bt),
    neardup_b AS (
        SELECT DISTINCT c.doc_id AS doc_b
        FROM banded a
        JOIN banded c ON a.band = c.band AND a.key = c.key
                     AND a.doc_id < c.doc_id),
    final AS (
        SELECT s.*,
               CASE WHEN substr(md5(clean), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(clean), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM survivors s
        WHERE s.doc_id NOT IN (SELECT doc_b FROM neardup_b))
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM final
    GROUP BY split, lang
    """


@query(
    "text_pipeline_full_lsh", "text",
    oracle=_pipeline_lsh_oracle(),
    description="composed training pipeline, near-dup stage swapped to MinHash+LSH (the 100 TB mode), exact-oracled end-to-end",
)
def text_pipeline_full_lsh(spark: SparkSession, sf_dir: str,
                           survivors: DataFrame | None = None) -> DataFrame:
    # text_pipeline_full with the documented scale swap APPLIED: the
    # exact-Jaccard near-dup stage replaced by portable MinHash+LSH
    # banding — signatures are one aggregate pass, candidates one bucket
    # join; no posting-list quadratic term anywhere. Still ONE Catalyst
    # plan end-to-end, and still exact-oracled because the portable hash
    # family reproduces bit-for-bit in SQL.
    from ..operators.dedup import (
        lsh_portable_candidate_pairs,
        minhash_portable_signatures,
    )
    if survivors is None:
        survivors = _pipeline_survivors(spark, sf_dir)
    sigs = minhash_portable_signatures(survivors, num_hashes=16, n=3,
                                       text_col="clean")
    pairs = lsh_portable_candidate_pairs(sigs, bands=4)
    dup_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    bucket = F.substring(F.md5(F.col("clean").cast("binary")), 1, 2)
    final = (survivors.join(dup_b, "doc_id", "left_anti")
             .withColumn("split",
                         F.when(bucket < "cc", "train")
                          .when(bucket < "e6", "val")
                          .otherwise("test")))
    return (final.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").cast("long").alias("total_words"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc")))


@query(
    "text_gopher_rules", "text",
    oracle=rf"""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               CAST(length(text) AS DOUBLE) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               (n_chars - (len(ws) - 1)) / len(ws) AS mwl,
               len(list_filter(ws,
                   w -> w IN {_GOPHER_STOPS_SQL})) AS n_stop,
               len(list_filter(ws,
                   w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
               len(list_filter(ws,
                   w -> contains(w, '#') OR contains(w, '...'))) AS n_sym
        FROM s
    )
    SELECT doc_id, n_words,
           ROUND(mwl, 6) AS mean_word_len,
           n_stop AS n_stopwords,
           n_words BETWEEN 25 AND 100000 AS ok_word_count,
           mwl BETWEEN 3 AND 10 AS ok_mean_word_len,
           CAST(n_sym AS DOUBLE) / n_words < 0.1 AS ok_symbol_ratio,
           CAST(n_alpha AS DOUBLE) / n_words > 0.8 AS ok_alpha_frac,
           n_stop >= 2 AS ok_stopwords,
           (n_words BETWEEN 25 AND 100000) AND (mwl BETWEEN 3 AND 10)
               AND CAST(n_sym AS DOUBLE) / n_words < 0.1
               AND CAST(n_alpha AS DOUBLE) / n_words > 0.8
               AND n_stop >= 2 AS passes_gopher
    FROM m
    """,
    description="Gopher-style quality rule battery (word count / word length / symbol / alpha / stopword gates)",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher (Rae et al. 2021, §A1.1) rule-based quality battery,
    adapted to the newline-free synthetic corpus: word-count bounds,
    mean-word-length band, symbol-to-word ratio (# / ellipsis), words-
    with-alphabetic-char fraction, and minimum stopword evidence, plus
    the conjunctive pass flag used as the training-data gate.

    Pure per-row column expressions over one tokenization — map-only,
    no shuffle, whole-stage codegen end to end; at 100 TB this runs at
    scan speed and is the cheap first gate before any pairwise dedup.
    Every ratio is an identical IEEE op sequence in Spark and DuckDB,
    so even the boolean gates are bit-deterministic cross-engine.
    (No spread(): that local-mode repartition would be this plan's only
    Exchange — at scale the scan's own splits provide the parallelism.)
    """
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        F.length("text").cast("double").alias("n_chars"))
    n_words = F.size("ws")
    mwl = (F.col("n_chars") - (n_words - F.lit(1))) / n_words
    n_stop = marker_count(F.col("ws"), GOPHER_STOPWORDS)
    n_alpha = F.size(F.filter("ws", lambda w: w.rlike("[A-Za-z]")))
    n_sym = F.size(F.filter(
        "ws", lambda w: w.contains("#") | w.contains("...")))
    ok_wc = (n_words >= 25) & (n_words <= 100000)
    ok_mwl = (mwl >= 3) & (mwl <= 10)
    ok_sym = n_sym.cast("double") / n_words < 0.1
    ok_alpha = n_alpha.cast("double") / n_words > 0.8
    ok_stop = n_stop >= 2
    return base.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        n_stop.cast("long").alias("n_stopwords"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_frac"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop)
            .alias("passes_gopher"))


@query(
    "text_segment_dedup", "text",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    seg AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, CAST(ceil(len(words) / 12.0) AS BIGINT) + 1),
                   i -> struct_pack(
                       idx := i,
                       seg := array_to_string(
                           list_slice(words, (i - 1) * 12 + 1, i * 12), ' '))),
                   recursive := true)
        FROM w),
    enc AS (SELECT doc_id, idx, seg,
                   doc_id * 1000000 + idx AS encoded FROM seg),
    own AS (SELECT seg, MIN(encoded) AS own_enc FROM enc GROUP BY seg)
    SELECT e.doc_id,
           COUNT(*) AS n_segments,
           COUNT(*) FILTER (WHERE e.encoded = o.own_enc) AS n_kept,
           coalesce(string_agg(e.seg, ' ' ORDER BY e.idx)
                        FILTER (WHERE e.encoded = o.own_enc), '')
               AS kept_text
    FROM enc e JOIN own o ON e.seg = o.seg
    GROUP BY e.doc_id
    """,
    description="corpus-wide segment-level exact dedup: keep first occurrence, reassemble in order",
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RefinedWeb/CCNet-style line-level dedup re-expressed for this
    # corpus (documents are single-line word streams, so "lines" are
    # fixed 12-word segments): a segment repeated anywhere in the
    # corpus survives only at its first occurrence (min (doc_id, idx),
    # encoded as one BIGINT so plain MIN works identically on both
    # engines); every document is then REASSEMBLED from its surviving
    # segments in original order. Scale shape: explode -> partial-agg
    # min per segment (map-side combine, never a window over a hot
    # segment's whole partition) -> equi-join back on segment -> one
    # groupBy(doc_id) with array_sort(collect_list(struct)) for
    # order-preserving reassembly. Two shuffles + the join; no
    # quadratic term, no Python. The 100 TB posture matches
    # dedup_corpus_dup_fraction's join-back shape (BASELINE.md records
    # the df=1-ownership rewrite measuring 2.7x slower).
    from ..operators.dedup import segment_dedup
    return segment_dedup(t(spark, sf_dir, "documents"), width=12)


@query(
    "text_shuffle_rank", "text",
    # Deterministic epoch shuffle: each document's position in the
    # training order is row_number over md5("0:" || doc_id) — a
    # portable hash both engines render as the same lowercase hex. The
    # Spark side computes the rank with operators/ranking.global_rank
    # (range partition + per-partition offsets), NEVER a
    # single-partition global window, and must match the oracle's
    # window spelling exactly.
    oracle="""
    SELECT doc_id,
           row_number() OVER (
               ORDER BY md5('0:' || CAST(doc_id AS VARCHAR))) AS shuffle_rank
    FROM documents
    """,
    description="deterministic epoch-shuffle rank via scalable two-phase total sort (range partition + offset merge)",
)
def text_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank, salted_key
    keyed = (t(spark, sf_dir, "documents")
             .select("doc_id", salted_key("doc_id", "0:").alias("_skey")))
    return (global_rank(keyed, "_skey", rank_col="shuffle_rank")
            .select("doc_id", "shuffle_rank"))


@query(
    "text_tokenize_ids", "text",
    # corpus -> tensor-ready: every document becomes its array of
    # vocabulary ids in original token order (top-512 vocab by the same
    # deterministic (freq DESC, word) rank as text_vocab_build; OOV =
    # -1). Scale shape: one explode with map-side-combinable counts for
    # the vocab, the word->id mapping applied through a BROADCAST join
    # (vocab is tiny vs corpus), and one doc_id shuffle to reassemble
    # arrays via array_sort(collect_list(struct(pos,...))) — the same
    # order-preserving reassembly as text_segment_dedup. The ranking
    # window runs over the aggregated vocab only, never corpus rows.
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents),
    tf AS (SELECT * FROM tok WHERE word <> ''),
    counts AS (SELECT word, COUNT(*) AS c FROM tf GROUP BY word),
    vocab AS (SELECT word, row_number() OVER (ORDER BY c DESC, word) - 1
                      AS vid
              FROM counts),
    v AS (SELECT * FROM vocab WHERE vid < 512),
    ids AS (SELECT t.doc_id, t.pos, CAST(COALESCE(v.vid, -1) AS BIGINT)
                   AS tid
            FROM tf t LEFT JOIN v USING (word))
    SELECT doc_id,
           array_to_string(list(tid ORDER BY pos), ',') AS token_ids,
           COUNT(*) AS n_tokens
    FROM ids GROUP BY doc_id
    """,
    description="tokenize to vocab ids: top-512 vocab broadcast-mapped onto every document, order-preserving id arrays, OOV=-1, serialized as a CSV string (driver-canonicalizable scalar)",
)
def text_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.posexplode(F.split("text", " ")).alias("pos", "word"))
            .filter(F.col("word") != ""))
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    # top-512 via orderBy().limit() — compiles to the distributed
    # TakeOrderedAndProject (per-partition top-k + merge), replacing the
    # r4 partition-less Window over the full vocab; ids for the 512
    # survivors come from the two-phase rank (no WindowExec anywhere).
    from ..operators.ranking import global_rank
    top = counts.orderBy(F.col("c").desc(), "word").limit(512)
    vocab = (global_rank(top, [F.col("c").desc(), F.col("word")],
                         rank_col="_rk")
             .select("word", (F.col("_rk") - 1).cast("int").alias("vid")))
    ids = (toks.join(F.broadcast(vocab), "word", "left")
           .select("doc_id", "pos",
                   F.coalesce("vid", F.lit(-1)).cast("long").alias("tid")))
    # token_ids ships as a comma-joined STRING, not array<long>: the
    # round-5 driver canonicalizer (pandas sort_values + value hash)
    # cannot sort/hash array cells — a top-level array output column is
    # driver-RED even when every value is correct (CORRECTNESS_r05).
    # tests/test_registry_guard.py pins "no top-level array/map/struct
    # outputs" for the whole registry.
    return (ids.groupBy("doc_id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                         lambda s: s["tid"]),
                     ",").alias("token_ids"),
                 F.count(F.lit(1)).alias("n_tokens")))


@query(
    "text_unigram_logprob", "text",
    # CCNet-style LM quality scoring, reduced to the engine-portable
    # core: score every document by the average log-probability of its
    # tokens under the corpus's own unigram model, avg_lp =
    # SUM(ln cnt_w)/n - ln(T). Low scorers are rare-token noise
    # (boilerplate, mojibake); the real pipeline thresholds on this.
    # Portability: ln differs in the last ULP across libm
    # implementations, so each word's ln(cnt) rides a 1e-6 integer
    # grid and the per-doc SUM is an exact BIGINT (order-independent);
    # the single trailing ln(T) and final ROUND(,6) operate on
    # bit-identical inputs. Scale shape: one explode with map-side
    # combine for the model, a word-keyed join to score (Catalyst/AQE
    # broadcasts while the vocab is small; at 100 TB vocab it is a
    # correct shuffle join on the word key), one doc_id shuffle to
    # aggregate. The model table is corpus-derived — no external LM.
    oracle="""
    WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
    tok AS (SELECT * FROM tf WHERE word <> ''),
    model AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
    tot AS (SELECT SUM(c) AS t_tokens FROM model)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CAST(ROUND(ln(c) * 1e6, 0) AS BIGINT)) AS BIGINT) AS sum_lnc_scaled,
           ROUND(CAST(SUM(CAST(ROUND(ln(c) * 1e6, 0) AS BIGINT)) AS DOUBLE)
                     / (1e6 * COUNT(*))
                 - ln(CAST(t_tokens AS DOUBLE)), 6) AS avg_logprob
    FROM tok JOIN model USING (word), tot
    GROUP BY doc_id, t_tokens
    """,
    description="unigram-LM document scoring: avg ln-probability of tokens under the corpus unigram model (CCNet-style quality filter)",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
           .filter(F.col("word") != ""))
    model = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    scaled = F.round(F.log("c") * 1e6, 0).cast("long")
    per_doc = (tok.join(model, "word")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum(scaled).alias("sum_lnc_scaled")))
    # T from the per-doc frame, not a second corpus explode+agg: the
    # two consumers share an identical doc-agg subplan, so Spark's
    # ReuseExchange serves both from ONE shuffle (plan-audited)
    tot = per_doc.agg(F.sum("n_tokens").alias("t_tokens"))
    return (per_doc
            .crossJoin(F.broadcast(tot))
            .select("doc_id", "n_tokens", "sum_lnc_scaled",
                    F.round(F.col("sum_lnc_scaled").cast("double")
                            / (1e6 * F.col("n_tokens"))
                            - F.log(F.col("t_tokens").cast("double")), 6)
                    .alias("avg_logprob")))


@query(
    "text_quality_quantile_gate", "text",
    # "Keep the top half of each source by quality" — the per-stratum
    # quantile gate real pipelines apply instead of one global
    # threshold (sources have different score distributions; a global
    # cut empties the weakest source). percent_rank over the
    # bit-deterministic quality score with a doc_id tiebreak is a pure
    # function of the data, so both engines rank identically and the
    # gate is exact. One stratum shuffle; the window never leaves the
    # source partition.
    oracle=f"""
    SELECT doc_id, source,
           ROUND({QUALITY_SCORE_SQL}, 6) AS quality_r,
           ROUND(percent_rank() OVER (
               PARTITION BY source
               ORDER BY {QUALITY_SCORE_SQL} DESC, doc_id), 6) AS pr
    FROM documents
    QUALIFY pr <= 0.5
    """,
    description="per-source quality quantile gate: keep top half of each source by percent_rank over the deterministic quality score",
)
def text_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    q = quality_cols("text")["quality_score"]
    w = (Window.partitionBy("source")
         .orderBy(F.desc("_q"), "doc_id"))
    return (d.withColumn("_q", q)
            .withColumn("pr", F.round(F.percent_rank().over(w), 6))
            .filter(F.col("pr") <= 0.5)
            .select("doc_id", "source",
                    F.round(F.col("_q"), 6).alias("quality_r"), "pr"))


@query(
    "text_bigram_logprob", "text",
    # Bigram-LM document scoring — the next rung above the unigram lane
    # (text_unigram_logprob): score each document by the average
    # ln-probability of its token BIGRAMS under an add-one-smoothed
    # corpus bigram model, P(w2|w1) = (c12 + 1) / (c1 + V). The fluency
    # signal a perplexity gate uses that unigram frequency cannot see
    # (word-order scrambles keep unigram scores, crash bigram scores).
    # Cross-engine exactness: ln is taken ONLY of integers (c12+1,
    # c1+V), each rounded to the 1e-6 grid BEFORE the sum — the same
    # integer-grid-ln idiom the unigram lane uses, so libm-vs-JVM ln
    # ulps cannot reorder a sum. SCALE: model = one (w1,w2) aggregate
    # (map-combinable), context counts by one more agg over the model
    # (tiny), join back on the bigram key (broadcast while the model is
    # small, plain shuffle join at 100 TB vocab), one doc_id window for
    # adjacency riding a single shuffle.
    oracle="""
    WITH tok AS (
        SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)),
    big AS (
        SELECT doc_id, w AS w1,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok),
    bg AS (SELECT * FROM big WHERE w2 IS NOT NULL),
    model AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1 FROM model GROUP BY w1),
    voc AS (SELECT COUNT(DISTINCT w) AS v FROM tok)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(ROUND(ln(m.c12 + 1) * 1000000.0, 0) AS BIGINT)
                    - CAST(ROUND(ln(ctx.c1 + voc.v) * 1000000.0, 0) AS BIGINT))
                AS BIGINT) AS sum_ln_scaled,
           ROUND(CAST(SUM(CAST(ROUND(ln(m.c12 + 1) * 1000000.0, 0) AS BIGINT)
                          - CAST(ROUND(ln(ctx.c1 + voc.v) * 1000000.0, 0) AS BIGINT))
                      AS DOUBLE) / (1000000.0 * COUNT(*)), 6) AS avg_logprob
    FROM bg
    JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
    JOIN ctx ON bg.w1 = ctx.w1, voc
    GROUP BY bg.doc_id
    """,
    description="bigram-LM document scoring with add-one smoothing: avg ln P(w2|w1) per doc (fluency/perplexity quality gate)",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.posexplode(F.split("text", " ")).alias("pos", "w"))
    wspec = Window.partitionBy("doc_id").orderBy("pos")
    # localCheckpoint: THREE consumers read the bigram stream (the model
    # aggregate, its context rollup, and the final per-doc join) and
    # Spark shares no subplans across them — uncheckpointed, the plan
    # tokenizes + window-shuffles the corpus three times (audited; the
    # plan test pins the fixed form). One materialization beats three
    # full passes at any scale.
    bg = (tok.withColumn("w2", F.lead("w").over(wspec))
          .filter(F.col("w2").isNotNull())
          .select("doc_id", F.col("w").alias("w1"), "w2")
          .localCheckpoint())
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    voc = tok.agg(F.countDistinct("w").alias("v"))
    ln_grid = lambda col: F.round(F.log(col) * 1e6, 0).cast("long")  # noqa: E731
    term = ln_grid(F.col("c12") + 1) - ln_grid(F.col("c1") + F.col("v"))
    return (bg.join(F.broadcast(model), ["w1", "w2"])
            .join(F.broadcast(ctx), "w1")
            .crossJoin(F.broadcast(voc))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum(term).alias("sum_ln_scaled"))
            .select("doc_id", "n_bigrams", "sum_ln_scaled",
                    F.round(F.col("sum_ln_scaled").cast("double")
                            / (1e6 * F.col("n_bigrams")), 6)
                    .alias("avg_logprob")))


@query(
    "text_chunk_overlap", "text",
    # Context-window chunking — the "concat-and-chunk" counterpart for
    # models with a fixed context: every document's token stream is cut
    # into windows of 8 tokens at stride 6 (2-token overlap, so no
    # boundary-spanning n-gram is lost between adjacent chunks), tail
    # chunks shorter but never empty, zero-token docs dropped. SCALE:
    # pure per-row array arithmetic + one explode — map-only, no
    # shuffle, linear at any corpus size; the chunk stream feeds
    # straight into tokenize/pack stages under the same partitioning.
    # Boundary discipline per the r5 corpus fuzzer: starts come from
    # sequence(1, n, stride) with n >= 1 guaranteed by the filter, so
    # the descending-sequence trap (shingles_col's r5 bug) can't fire.
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS tk
        FROM documents),
    t2 AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
    ch AS (
        SELECT doc_id,
               CAST((u.s - 1) // 6 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, u.s, least(u.s + 7, n)), ' ')
                   AS chunk_text,
               CAST(least(u.s + 7, n) - u.s + 1 AS BIGINT) AS n_tokens
        FROM t2, unnest(generate_series(1, n, 6)) AS u(s))
    SELECT doc_id, chunk_id, chunk_text, n_tokens FROM ch
    """,
    description="context-window chunking: 8-token windows at stride 6 (2-token overlap), tail-safe, map-only",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    window, stride = 8, 6
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: w != "").alias("tk"))
    t2 = toks.withColumn("n", F.size("tk")).filter(F.col("n") > 0)
    starts = F.sequence(F.lit(1), F.col("n"), F.lit(stride))
    ch = t2.select(
        "doc_id", "tk", "n", F.explode(starts).alias("s"))
    return ch.select(
        "doc_id",
        ((F.col("s") - 1) / stride).cast("long").alias("chunk_id"),
        F.array_join(F.slice("tk", F.col("s"), F.lit(window)), " ")
            .alias("chunk_text"),
        (F.least(F.col("s") + window - 1, F.col("n")) - F.col("s") + 1)
            .cast("long").alias("n_tokens"))


# --- composed-pipeline scale dispatch (VERDICT r9 task #4) ----------------

# The exact-Jaccard near-dup stage materializes sum(df^2) posting-join
# rows over the survivors' distinct 3-gram shingles — the pipeline's one
# super-linear term. The cap bounds that term's ABSOLUTE work before the
# dispatch flips to MinHash+LSH banding (linear): measured at sf0.1 this
# corpus sits at 3.39M rows and the exact pipeline costs ~2x its LSH
# twin (4.6 s vs 2.4 s), while the driver-gate corpora sit at ~61k rows
# where exact is both cheap and the stronger (verified-Jaccard) result.
EXACT_NEARDUP_POSTING_CAP = 1_000_000
# The decision metric is estimated on the deterministic doc_id % k == 0
# subsample (the "known next dial" of the r10 SCALE note, shipped after
# the r11 sf1 A/B measured the full-metric pass at 2.02 s on top of a
# 6.1 s pinned lane): the estimate k^2 * sum(df_sub^2) is computed from
# the SAME integer arithmetic in the oracle, so the engines still agree
# at the cap boundary at every sf — the dispatch stays exact even
# though the metric is now an estimator of the posting-join bound.
#
# KNOWN ESTIMATOR FAILURE MODE (ADVICE r11): the 1/k id-slice is an
# unbiased estimator of sum(df^2) only when duplicate text is spread
# across id residues. An id-CLUSTERED duplicate corpus (e.g. a crawl
# that assigns consecutive ids per host, with one host's boilerplate
# repeated millions of times) can park its hot shingles outside the
# doc_id % k == 0 slice, under-estimate the posting bound, and route a
# just-over-cap corpus to the exact lane the cap exists to avoid. The
# engines still AGREE (the oracle mirrors the same integer), so this is
# a performance cliff, never a cross-engine split. The secondary guard
# below bounds the cliff: past PIPELINE_EXACT_MAX_SURVIVORS survivors
# the dispatch forces the LSH lane unconditionally — the survivor count
# is a true COUNT(*), not an estimate, so no corpus shape can dodge it,
# and the exact lane's worst case stays bounded by
# (max_survivors x max-doc-shingles) posting rows regardless of how the
# subsample lands.
PIPELINE_DECISION_SUBSAMPLE = 8
PIPELINE_EXACT_MAX_SURVIVORS = 200_000


def text_pipeline_lane_decision(
        spark: SparkSession, sf_dir: str,
        cap: int = EXACT_NEARDUP_POSTING_CAP,
        subsample: int = PIPELINE_DECISION_SUBSAMPLE,
        max_survivors: int = PIPELINE_EXACT_MAX_SURVIVORS) -> dict:
    """The exact-vs-LSH pick as EXECUTABLE code (the
    string_distance_lane_decision pattern): ONE metadata-scale aggregate
    over a deterministic 1/k subsample of the survivors' shingle
    inverted index decides, with a survivor-COUNT(*) ceiling as the
    estimator-proof secondary guard (ADVICE r11 — see the
    PIPELINE_EXACT_MAX_SURVIVORS note). String shingle keys, not
    xxhash64, and a doc_id % k subsample rather than any sampling
    primitive — the oracle recomputes the identical integers, so the
    two engines can never disagree at either boundary.

    The survivors frame is persist()ed here and returned in the dict so
    the chosen lane reuses the materialized front half instead of
    rebuilding redact -> quality -> exact-dedup a second time (ADVICE
    r10: the rebuild roughly doubled the shared work per headline run).
    The CALLER owns the release: text_pipeline_full_auto materializes
    its (tiny, grouped) result and then unpersists — direct callers of
    this function must do the same or the cached blocks accumulate
    across invocations (ADVICE r11: the previous localCheckpoint leaked
    exactly so)."""
    from ..operators.dedup import doc_shingles
    survivors = _pipeline_survivors(spark, sf_dir).persist()
    sh = doc_shingles(survivors.filter(F.col("doc_id") % subsample == 0),
                      text_col="clean", hash_keys=False)
    sub = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
           .agg(F.sum(F.col("df") * F.col("df")).alias("s"))
           .collect()[0]["s"]) or 0
    est = int(sub) * subsample * subsample
    # the count guard only gates the EXACT branch, so don't pay its job
    # when the metric already picked lsh (lane = lsh iff est > cap OR
    # n > ceiling — short-circuiting the OR cannot change the pick, and
    # the oracle's CASE evaluates the same boolean). n_survivors is
    # None in that case.
    n_surv = None
    if est <= cap:
        n_surv = survivors.count()
    lane = "exact" if (est <= cap and n_surv <= max_survivors) else "lsh"
    return {"sum_df2": est, "cap": cap, "subsample": subsample,
            "n_survivors": n_surv, "max_survivors": max_survivors,
            "lane": lane, "survivors": survivors}


def _pipeline_auto_oracle(num_hashes: int = 16, bands: int = 4,
                          cap: int = EXACT_NEARDUP_POSTING_CAP,
                          subsample: int = PIPELINE_DECISION_SUBSAMPLE,
                          max_survivors: int =
                          PIPELINE_EXACT_MAX_SURVIVORS) -> str:
    """Oracle that DISPATCHES exactly like the Spark lane: shared
    inject->redact->quality->exact-dedup CTEs, the same k^2*sum(df^2)
    estimate over the doc_id % k survivor subsample's distinct shingles
    AND the same survivor-COUNT(*) ceiling (the estimator-proof guard,
    ADVICE r11), then the exact-Jaccard OR the MinHash+LSH near-dup
    branch chosen by the same cap — so the oracle stays bit-exact at
    ANY sf, on either side of either boundary."""
    from ..operators.dedup import MINHASH_P, minhash_perm_coeffs
    rows = num_hashes // bands
    min_exprs = ",\n               ".join(
        f"min((x * {minhash_perm_coeffs(i)[0]} + {minhash_perm_coeffs(i)[1]})"
        f" % {MINHASH_P}) AS h{i}"
        for i in range(num_hashes))
    sig_list = ", ".join(f"h{i}" for i in range(num_hashes))
    return rf"""
    WITH injected AS (
        SELECT doc_id, lang,
               text || ' contact user' || doc_id || '@' || source ||
               '.example.com' AS raw
        FROM documents),
    redacted AS (
        SELECT doc_id, lang,
               regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+\.com',
                              '<EMAIL>', 'g') AS clean
        FROM injected),
    quality AS (
        SELECT doc_id, lang, clean,
               len(string_split(clean, ' ')) AS n_words
        FROM redacted
        WHERE len(string_split(clean, ' ')) >= 20),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(clean)),
    survivors AS (
        SELECT q.* FROM quality q JOIN exact_kept k USING (doc_id)),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(clean, ' ')) - 2, 0) + 1),
                   i -> array_to_string(
                       list_slice(string_split(clean, ' '), i, i + 2), ' '))))
                   AS shingle
        FROM survivors),
    metric AS (
        SELECT COALESCE(SUM(df * df), 0) * {subsample * subsample}
            AS sum_df2
        FROM (SELECT COUNT(*) AS df FROM sh
              WHERE doc_id % {subsample} = 0 GROUP BY shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    exact_neardup_b AS (
        SELECT DISTINCT doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                               AND a.doc_id < b.doc_id
            GROUP BY 1, 2) c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5),
    hx AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
                   % {MINHASH_P} AS x
        FROM sh),
    sig AS (
        SELECT doc_id,
               {min_exprs}
        FROM hx GROUP BY doc_id),
    arr AS (SELECT doc_id, [{sig_list}] AS s FROM sig),
    banded AS (
        SELECT doc_id, bt.b AS band,
               array_to_string(
                   list_slice(s, bt.b * {rows} + 1, (bt.b + 1) * {rows}), ',')
                   AS key
        FROM arr CROSS JOIN (SELECT unnest(range({bands})) AS b) bt),
    lsh_neardup_b AS (
        SELECT DISTINCT c.doc_id AS doc_b
        FROM banded a
        JOIN banded c ON a.band = c.band AND a.key = c.key
                     AND a.doc_id < c.doc_id),
    nsurv AS (SELECT COUNT(*) AS n FROM survivors),
    neardup_b AS (
        SELECT doc_b FROM exact_neardup_b
        WHERE (SELECT sum_df2 FROM metric) <= {cap}
          AND (SELECT n FROM nsurv) <= {max_survivors}
        UNION ALL
        SELECT doc_b FROM lsh_neardup_b
        WHERE (SELECT sum_df2 FROM metric) > {cap}
           OR (SELECT n FROM nsurv) > {max_survivors}),
    final AS (
        SELECT s.*,
               CASE WHEN substr(md5(clean), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(clean), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM survivors s
        WHERE s.doc_id NOT IN (SELECT doc_b FROM neardup_b))
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM final
    GROUP BY split, lang
    """


@query(
    "text_pipeline_full_auto", "text",
    # The twins under ONE entry point (VERDICT r9 task #4, the
    # fn_string_distance_auto pattern): the sum(df^2) decision aggregate
    # picks the verified-exact near-dup stage while its posting join is
    # bounded, the MinHash+LSH stage past the cap — and the ORACLE
    # computes the identical metric and branches on the identical cap,
    # so the driver gate proves the dispatch itself, not just one lane,
    # at every sf on either side of the crossover (sf0.001/0.01 -> exact
    # at ~61k-63k rows; sf0.1+ -> LSH at 3.39M+).
    oracle=_pipeline_auto_oracle(),
    description="composed training pipeline with executable scale dispatch: exact-Jaccard vs MinHash+LSH near-dup stage picked by the posting-join bound, dispatch mirrored in the oracle",
)
def text_pipeline_full_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    decision = text_pipeline_lane_decision(spark, sf_dir)
    # reuse the decision's persisted survivors — the shared front half
    # (redact -> quality -> exact-dedup) runs once, not twice
    try:
        if decision["lane"] == "exact":
            out = text_pipeline_full(spark, sf_dir,
                                     survivors=decision["survivors"])
        else:
            out = text_pipeline_full_lsh(spark, sf_dir,
                                         survivors=decision["survivors"])
        # materialize the (tiny, grouped) result now, then release the
        # cached survivors — repeated invocations in one session must
        # not accumulate storage (ADVICE r11)
        return out.localCheckpoint(eager=True)
    finally:
        decision["survivors"].unpersist()

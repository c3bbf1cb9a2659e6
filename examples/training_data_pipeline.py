"""End-to-end training-data prep pipeline composed from the engine's
operators: quality + Gopher-rule filters -> repetition filter -> exact +
near dedup -> decontamination -> content-addressed split -> sequence
packing -> corpus stats.

This is the "switch from the reference" story for an LLM data pipeline:
every stage is a registered, oracle-checked operator (OPERATORS.md), and
every stage is shuffle-minimal by construction (SCALE.md) — the corpus
itself is shuffled only by the near-dup candidate join, the dedup
anti-joins on doc_id, and the pack-window; every filter stage is
map-only, and the decontamination join broadcasts the (small) eval gram
set rather than shuffling the corpus by gram.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python examples/training_data_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from datastream_processing_demo_spark.catalog import load_table
from datastream_processing_demo_spark.operators.components import min_label_components
from datastream_processing_demo_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from datastream_processing_demo_spark.operators.text import (
    GOPHER_STOPWORDS,
    exploded_ngrams,
    marker_count,
    quality_cols,
)
from datastream_processing_demo_spark.session import EngineConfig, get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(EngineConfig(app_name="training-data-pipeline"))
    raw = load_table(spark, sf_dir, "documents")
    n_raw = raw.count()

    # 0. carve out the held-out eval slice FIRST (doc_id % 20 == 0
    # stands in for a benchmark set). Its grams — taken from the RAW
    # slice, before any filter can hide a doc — drive decontamination
    # in 4b, and the slice itself never enters the training corpus.
    is_eval = F.col("doc_id") % 20 == 0
    eval_docs = raw.filter(is_eval)
    docs = raw.filter(~is_eval)

    # 1. quality gate: map-only scoring, keep the upper band
    q = quality_cols("text")["quality_score"]
    docs = docs.withColumn("q", q).filter(F.col("q") >= 0.5)

    # 1b. Gopher-style rule gate (see text_gopher_rules for the full
    # battery): word-count floor + stopword evidence, fused into the
    # same map-only scan — no extra shuffle (tokenize once into a
    # column; CSE does not reach inside array lambdas)
    docs = (docs.withColumn("wtoks", F.split("text", " "))
            .filter((F.size("wtoks") >= 10)
                    & (marker_count(F.col("wtoks"), GOPHER_STOPWORDS) >= 1))
            .drop("wtoks"))

    # 2. repetition gate: map-only trigram dup-ratio inside each row
    # (words split once into a column — no CSE inside array lambdas)
    w3 = F.expr(
        "CASE WHEN size(wtoks) >= 3 THEN "
        "transform(sequence(0, size(wtoks) - 3), i -> "
        "concat_ws(' ', wtoks[i], wtoks[i+1], wtoks[i+2])) "
        "ELSE array() END")
    docs = (docs.withColumn("wtoks", F.split("text", " "))
            .withColumn("ng", w3).drop("wtoks")
            .withColumn("rep", F.when(
                F.size("ng") > 0,
                1.0 - F.size(F.array_distinct("ng")).cast("double")
                / F.size("ng")).otherwise(0.0))
            .filter(F.col("rep") <= 0.02).drop("ng", "rep"))

    # 3. exact dedup on normalized content hash (one combine-able agg)
    norm = F.md5(F.regexp_replace(F.lower("text"), r"\s+", " "))
    keeper = (docs.withColumn("h", norm)
              .groupBy("h").agg(F.min("doc_id").alias("doc_id")))
    docs = docs.join(keeper, "doc_id", "left_semi")

    # 4. near-dedup: MinHash+LSH candidate pairs -> connected components
    #    -> keep each cluster's min doc_id (the 100 TB dedup path)
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    comps = min_label_components(pairs, src="doc_a", dst="doc_b")
    drop = (comps.filter(F.col("node") != F.col("cluster_id"))
            .select(F.col("node").alias("doc_id")))
    docs = docs.join(drop, "doc_id", "left_anti")

    # 4b. decontamination: drop surviving docs that share any word
    # 8-gram with the held-out eval slice (dedup_decontaminate's shape:
    # the DISTINCT eval gram set is broadcast, the training side never
    # shuffles by gram; per-doc gram dedup is within-row via
    # array_distinct). persist() first: docs feeds both the probe side
    # and the final anti-join, and without it the whole upstream
    # filter/dedup lineage would re-evaluate per use.
    docs = docs.persist()
    ev_grams = exploded_ngrams(eval_docs, 8).select("gram").distinct()
    contaminated = (exploded_ngrams(docs, 8)
                    .join(F.broadcast(ev_grams), "gram")
                    .select("doc_id").distinct())
    docs = docs.join(contaminated, "doc_id", "left_anti")

    # 5. content-addressed train/val/test split (pure expression)
    bucket = F.substring(F.md5("text"), 1, 2)
    docs = docs.withColumn(
        "split",
        F.when(bucket < "cc", "train").when(bucket < "e6", "val")
         .otherwise("test"))

    # 6. sequence packing per (split, source) stream
    w = (Window.partitionBy("split", "source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    n_tok = F.size(F.split("text", " "))
    offset = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    packed = docs.select(
        "doc_id", "split", "source", n_tok.alias("n_tokens"),
        F.floor(offset / 512).alias("pack_id"))

    stats = (packed.groupBy("split")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_tokens").alias("n_tokens"),
                  F.countDistinct("source", "pack_id").alias("n_packs"))
             .orderBy("split"))
    print(f"raw docs: {n_raw}")
    stats.show()

    # 7. temperature-rebalanced train mixture (alpha = 0.5): tail
    # languages upsampled within a floor(N/2) budget — integer-grid
    # weights, content-hash draw (pure function of the data), corpus
    # filtered map-side behind a broadcast weight table
    # (sample_temperature_mixture's shape)
    from datastream_processing_demo_spark.operators.ranking import (
        global_rank,
        salted_key,
    )
    train = docs.filter(F.col("split") == "train")
    counts = (train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_s"))
              .withColumn("w_s",
                          F.round(F.sqrt("n_s") * 1e6, 0).cast("long")))
    tot = counts.agg(F.sum("n_s").alias("n"), F.sum("w_s").alias("w"))
    th = (counts.crossJoin(F.broadcast(tot))
          .select("lang", F.floor(F.least(
              F.lit(1.0),
              (F.floor(F.col("n") / 2).cast("long")
               * F.col("w_s")).cast("double")
              / (F.col("w") * F.col("n_s")).cast("double"))
              * F.lit(4294967296.0)).cast("long").alias("t_s")))
    draw = F.conv(F.substring(salted_key("doc_id", "t:"), 1, 8),
                  16, 10).cast("long")
    mix = train.join(F.broadcast(th), "lang").filter(draw < F.col("t_s"))

    # 8. deterministic epoch shuffle: scalable two-phase total sort
    # (text_shuffle_rank's shape — never a single-partition window)
    epoch = 0
    keyed = mix.select("doc_id", "lang", "text",
                       salted_key("doc_id", f"{epoch}:").alias("_k"))
    ordered = global_rank(keyed, "_k", rank_col="train_order").drop("_k")

    # 9. tensorize: top-512 vocab broadcast-mapped to token-id arrays
    # in original order (text_tokenize_ids' shape), OOV = -1
    toks = (ordered.select("doc_id",
                           F.posexplode(F.split("text", " "))
                           .alias("pos", "wtok"))
            .filter(F.col("wtok") != ""))
    wcounts = toks.groupBy("wtok").agg(F.count(F.lit(1)).alias("c"))
    vw = Window.orderBy(F.col("c").desc(), "wtok")
    vocab = (wcounts.select("wtok",
                            (F.row_number().over(vw) - 1).alias("vid"))
             .filter(F.col("vid") < 512))
    ids = (toks.join(F.broadcast(vocab), "wtok", "left")
           .groupBy("doc_id")
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct(
                   "pos", F.coalesce("vid", F.lit(-1)).alias("tid")))),
               lambda s: s["tid"]).alias("token_ids")))
    tensor = (ordered.select("doc_id", "lang", "train_order")
              .join(ids, "doc_id"))
    first = tensor.orderBy("train_order").first()
    print(f"train mixture: {mix.count()} docs; first tensor row: "
          f"doc {first['doc_id']} ({first['lang']}), "
          f"{len(first['token_ids'])} token ids")
    spark.stop()


if __name__ == "__main__":
    main()

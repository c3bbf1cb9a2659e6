"""Incremental corpus ingest — the shape a continuously-growing
training corpus runs every time a new crawl shard lands:

1. the EXISTING corpus is the already-ingested half (sources
   src0..src9 stand in for it); its per-doc content hashes are the
   incremental state a production pipeline persists between ingests;
2. the NEW shard (src10..src19) is deduplicated against that state
   (hash anti-join) and within itself (keep-first per hash);
3. survivors are chunked into overlapping context windows
   (8-token windows, stride 6) and sequence-packed into 64-token
   training packs, ready for tokenization.

Every stage is a registered, oracle-checked operator
(dedup_incremental_delta / text_chunk_overlap / text_sequence_pack in
OPERATORS.md), and the composition stays shuffle-minimal: the corpus
hash state reduces to DISTINCT hashes (broadcast-sized long before the
shard is), the shard shuffles once on the content hash, and chunking
is map-only.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python examples/incremental_ingest.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from datastream_processing_demo_spark.catalog import load_table
from datastream_processing_demo_spark.session import EngineConfig, get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(EngineConfig(app_name="incremental-ingest"))
    docs = load_table(spark, sf_dir, "documents")

    # --- 1. split: existing corpus vs the newly-landed shard ---------
    tagged = docs.select(
        "doc_id", "source", "text",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        (F.substring("source", 4, 10).cast("int") >= 10).alias("is_new"))
    existing_hashes = (tagged.filter(~F.col("is_new"))
                       .select("content_md5").distinct())
    shard = tagged.filter(F.col("is_new"))
    n_existing = tagged.filter(~F.col("is_new")).count()
    n_shard = shard.count()
    print(f"existing corpus: {n_existing} docs; new shard: {n_shard} docs")

    # --- 2. incremental dedup: against state, then within shard ------
    fresh = shard.join(existing_hashes, "content_md5", "left_anti")
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    survivors = (fresh.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") == 1)
                 .drop("rn", "is_new"))
    n_surv = survivors.count()
    print(f"survivors after incremental dedup: {n_surv} "
          f"({n_shard - n_surv} dropped)")

    # --- 3. chunk survivors into overlapping context windows ---------
    window, stride = 8, 6
    toks = survivors.select(
        "doc_id", "source",
        F.filter(F.split("text", " "), lambda t: t != "").alias("tk"))
    t2 = toks.withColumn("n", F.size("tk")).filter(F.col("n") > 0)
    chunks = (t2.select(
        "doc_id", "source", "n",
        F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(stride)))
            .alias("s"))
        .select(
            "doc_id", "source",
            ((F.col("s") - 1) / stride).cast("long").alias("chunk_id"),
            (F.least(F.col("s") + window - 1, F.col("n"))
             - F.col("s") + 1).alias("n_tokens")))
    n_chunks = chunks.count()
    print(f"context chunks ({window}-token windows, stride {stride}): "
          f"{n_chunks}")

    # --- 4. pack chunks into fixed 64-token training packs -----------
    wp = (Window.partitionBy("source").orderBy("doc_id", "chunk_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum("n_tokens").over(wp), F.lit(0))
    packs = (chunks.select(
        "source", "doc_id", "chunk_id", "n_tokens",
        F.floor(offset / 64).alias("pack_id"))
        .groupBy("source")
        .agg(F.countDistinct("pack_id").alias("n_packs"),
             F.sum("n_tokens").alias("n_tokens")))
    print("per-source packing:")
    for r in sorted(packs.collect(), key=lambda r: r["source"]):
        print(f"  {r['source']}: {r['n_packs']} packs, "
              f"{r['n_tokens']} tokens")
    spark.stop()


if __name__ == "__main__":
    main()

"""Using the engine as a library: build a session, run relational
queries, LLM-pipeline operators, and a streaming topology — the
programmatic counterpart of `python -m datastream_processing_demo_spark.job`.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python examples/library_usage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datastream_processing_demo_spark.catalog import load_table, register_views
from datastream_processing_demo_spark.operators.dedup import ngram_jaccard_pairs
from datastream_processing_demo_spark.operators.similarity import ivf_topk
from datastream_processing_demo_spark.plans.registry import all_queries
from datastream_processing_demo_spark.session import EngineConfig, get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_session(EngineConfig(app_name="library-usage-example"))

    # 1. any registered query from the inventory (OPERATORS.md) by name
    q1 = all_queries()["q1_pricing_summary"].spark(spark, sf_dir)
    print("q1 pricing summary:")
    q1.show(4, truncate=False)

    # 2. ad-hoc SQL over the registered views
    register_views(spark, sf_dir, ("orders", "customer"))
    spark.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY n_orders DESC
    """).show()

    # 3. LLM-pipeline operators as composable functions
    docs = load_table(spark, sf_dir, "documents")
    near_dups = ngram_jaccard_pairs(docs, threshold=0.5)
    print("near-duplicate pairs:", near_dups.count())

    emb = load_table(spark, sf_dir, "embeddings")
    neighbors = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=3)
    neighbors.show()

    # 4. the 100 TB dedup mode: MinHash+LSH candidate pairs (portable
    #    hash family — same answer in any engine), one aggregate pass
    #    for signatures, one bucket join for candidates
    from datastream_processing_demo_spark.operators.dedup import (
        lsh_portable_candidate_pairs,
        minhash_portable_signatures,
    )
    sigs = minhash_portable_signatures(docs, num_hashes=16)
    print("LSH candidate pairs:", lsh_portable_candidate_pairs(sigs).count())

    # 5. the 100 TB semantic-dedup mode: the vectorized SemDeDup twin
    #    with the cells-proportional-to-corpus sizing rule (the exact
    #    fold spelling is the oracle surface; this is the scale dial)
    from datastream_processing_demo_spark.operators.similarity import (
        auto_n_cells,
        semdedup_fast,
    )
    n_cells = auto_n_cells(emb.count(), target_cell_size=64)
    kept = (semdedup_fast(emb, threshold=0.35, n_cells=n_cells)
            .filter("is_kept").count())
    print(f"semdedup_fast ({n_cells} cells): {kept} survivors")

    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-rehearsal data generator: synthesize an sf1-shaped dataset
(10x sf0.1) under /tmp so bench.py can measure per-query scaling SLOPES
instead of arguing them from plan shape (VERDICT r3 item 6).

NOT a correctness fixture — the driver's oracle gate stays on the real
/root/testdata parquet. This builds 10 key-offset replicas of every
sf0.1 table (region/nation stay single — they're fixed dimensions):

- relational tables: every key column shifted by `replica * 10_000_000`
  consistently across tables, so FK joins (lineitem⋈orders⋈customer,
  part/supplier) keep exactly the same per-replica match structure —
  join/agg work scales linearly by construction.
- events: event_id/user_id offset; ts kept, so each window holds 10x
  rows (the honest streaming-scale axis).
- documents: every token salted with the replica tag (`tok#r3`), making
  replicas DISJOINT corpora of identical shape — dedup/similarity pair
  counts scale ~linearly (replicating identical text would grow true
  near-dup pairs quadratically and poison the slope measurement).
- embeddings: vec_id offset; vectors np.roll'ed by replica (norms and
  within-replica geometry preserved bit-for-bit, cross-replica cosines
  decorrelated) — ANN candidate structure scales linearly.

Usage: python tools/gen_sf1.py [--src /root/testdata/sf0.1]
                               [--out /tmp/spark_graft_sf1] [--copies 10]
Then:  SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_STRIDE = 10_000_000

# key columns to offset, per table (consistent stride keeps FKs aligned)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ("region", "nation")


def _salt_tokens(texts: "np.ndarray", r: int) -> list[str]:
    tag = f"#r{r}"
    return [" ".join(tok + tag for tok in t.split(" ")) for t in texts]


def replicate(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in COPY_AS_IS:
        pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                       os.path.join(out, f"{t}.parquet"))
        print(f"{t}: copied")
    for t, keys in KEY_COLS.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pdf = base.to_pandas()
        chunks = []
        for r in range(copies):
            c = pdf.copy()
            for k in keys:
                c[k] = c[k] + r * KEY_STRIDE
            if t == "documents" and r > 0:
                c["text"] = _salt_tokens(c["text"].to_numpy(), r)
                c["n_chars"] = c["text"].str.len()
            if t == "part" and r > 0:
                # suffix of 4 identical replica-specific chars: pairwise
                # suffix edit distance 4 > the fuzzy-match bound (3), so
                # cross-replica name pairs can't match and the TRUE
                # fuzzy-join output scales linearly (unsalted names made
                # it quadratic — every name recurs in all 10 replicas)
                tag = " " + chr(ord("a") + r) * 4
                c["p_name"] = c["p_name"] + tag
            if t == "embeddings" and r > 0:
                c["embedding"] = [np.roll(np.asarray(v), r).tolist()
                                  for v in c["embedding"]]
            chunks.append(c)
        import pandas as pd
        big = pd.concat(chunks, ignore_index=True)
        table = pa.Table.from_pandas(big, preserve_index=False,
                                     schema=base.schema)
        pq.write_table(table, os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {len(pdf)} -> {len(big)} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    replicate(args.src, args.out, args.copies)


if __name__ == "__main__":
    main()

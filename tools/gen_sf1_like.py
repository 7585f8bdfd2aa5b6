"""Generate an sf1-LIKE dataset by tiling sf0.1 ten times.

The driver's testdata stops at sf0.1; every scale claim above that is
plan-shape reasoning.  This tool manufactures one more decade of real
data volume (~6M lineitem rows) so the sf1 spot-bench can measure
per-gate scaling exponents empirically.

Tiling, not regeneration: each fact table is replicated 10x with
surrogate keys offset per tile, so join fan-outs, group cardinalities
per key, and value distributions match sf0.1 exactly while totals grow
10x -- the shape a scaling exponent should be measured against.
region/nation stay fixed (constant-size dimensions, as in TPC-H).

Two content-bearing tables get per-tile decorrelation so similarity
operators see new data rather than 10 exact copies of the old corpus
(which would inflate LSH candidate volume quadratically and measure
the data, not the operator):

- documents: the word sequence is deterministically shuffled per
  (doc_id, tile), which preserves vocabulary, length, and language
  statistics but destroys shingle overlap between tiles;
- embeddings: small deterministic per-tile noise decorrelates
  near-duplicate structure while keeping the metric distribution.

Usage: python tools/gen_sf1_like.py [outdir]   (default ./sf1data)
"""

from __future__ import annotations

import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TILES = 10

# per-table key columns to offset by tile * (max+1)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
FIXED = ["region", "nation"]


def main(outdir: str) -> None:
    con = duckdb.connect()
    import os

    os.makedirs(outdir, exist_ok=True)
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{outdir}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")
    for t, keys in KEYED.items():
        spans = {
            k: con.execute(
                f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
            for k in keys
        }
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        select = ", ".join(
            f"{c} + tile.i * {spans[c]} AS {c}" if c in spans else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range(0, {TILES})) AS i) tile) TO "
            f"'{outdir}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{outdir}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n, "rows")

    # documents: tile with per-tile word shuffle
    docs = con.execute(f"SELECT * FROM '{SRC}/documents.parquet'").df()
    span = int(docs["doc_id"].max()) + 1
    frames = []
    for i in range(TILES):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * span
        if i > 0:
            def _shuffle(row_text, seed):
                words = row_text.split(" ")
                random.Random(seed).shuffle(words)
                return " ".join(words)

            d["text"] = [
                _shuffle(t_, int(did))
                for t_, did in zip(d["text"], d["doc_id"])
            ]
        frames.append(d)
    import pandas as pd

    out = pd.concat(frames, ignore_index=True)
    con.execute(
        f"COPY (SELECT * FROM out) TO '{outdir}/documents.parquet' "
        "(FORMAT parquet)"
    )
    print("documents", len(out), "rows")

    # embeddings: tile with small deterministic per-tile noise
    import numpy as np

    emb = con.execute(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
    vspan = int(emb["vec_id"].max()) + 1
    frames = []
    for i in range(TILES):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + i * vspan
        if i > 0:
            rng = np.random.RandomState(1000 + i)
            e["embedding"] = [
                (np.asarray(v, dtype=np.float32)
                 + rng.normal(0, 0.02, len(v)).astype(np.float32))
                for v in e["embedding"]
            ]
        frames.append(e)
    out = pd.concat(frames, ignore_index=True)
    con.execute(
        f"COPY (SELECT * FROM out) TO '{outdir}/embeddings.parquet' "
        "(FORMAT parquet)"
    )
    print("embeddings", len(out), "rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf1data")

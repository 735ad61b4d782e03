"""Deterministic scale-up of a driver testdata dir by key-remapped
tiling — produces the sf1 inputs for the scale benchmark (round-11
verdict ask #1: at sf0.1 the 2x-vs-DuckDB letter measures Spark's
~0.2-0.3s/query job-submission floor, not plan quality; at sf1 the
floor amortizes and real plan defects become visible).

Method (seeded, reproducible, no RNG in the relational tables):

* every table is tiled ``--copies`` times; copy ``i`` offsets each key
  column by ``i x (source row count of the key's home table)`` — keys
  are dense 0-based in the source, so foreign-key joins stay exactly
  as selective as the original (each orders copy references its own
  customer copy, etc.);
* ``region``/``nation`` are fixed dims in TPC-H and stay as-is;
* ``documents``: copy 0 is verbatim; copies > 0 deterministically
  word-shuffle each text (seed = (copy, doc_id)) so cross-copy
  near-dup similarity vanishes (shingles change) while the token /
  character distributions the text operators depend on are preserved
  — naive duplication would make every doc a 10-way exact dup and
  turn the dedup/LSH benchmarks into a different workload;
  ``n_chars`` is recomputed to keep the column consistent;
* ``embeddings``: copies > 0 apply a per-copy deterministic dimension
  permutation — norms and within-copy cosines are untouched (the ANN
  workload per copy is identical) while cross-copy vectors decorrelate
  (naive tiling would make every vector a 10-way cosine-1.0 dup).

Usage:
    python tools/gen_scale.py --src /root/testdata/sf0.1 \
        --out testdata_big/sf1 --copies 10
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (table, {column: stride-home-table}) — stride = source row count
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "__users"},
}
ASIS = ["region", "nation"]


def _counts(con, src: str) -> dict[str, int]:
    out = {}
    for t in ["customer", "supplier", "part", "orders", "events", "documents",
              "embeddings"]:
        out[t] = con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
    out["__users"] = con.execute(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    return out


def tile_relational(con, src: str, out: str, copies: int, counts: dict) -> None:
    for t in ASIS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied as-is")
    for t, strides in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        parts = []
        for i in range(copies):
            sel = ", ".join(
                f"{c} + {i * counts[strides[c]]} AS {c}" if c in strides else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' "
            f"(FORMAT parquet, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies} copies)")


def _shuffle_words(text: str, seed: int) -> str:
    words = (text or "").split()
    random.Random(seed).shuffle(words)
    return " ".join(words)


def tile_documents(con, src: str, out: str, copies: int, counts: dict) -> None:
    base = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        f"ORDER BY doc_id"
    ).fetch_arrow_table().to_pydict()
    stride = counts["documents"]
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for i in range(copies):
        for j in range(stride):
            did = int(base["doc_id"][j])
            t = base["text"][j]
            if i > 0:
                t = _shuffle_words(t, seed=(i << 32) ^ did)
            ids.append(did + i * stride)
            texts.append(t)
            langs.append(base["lang"][j])
            sources.append(base["source"][j])
            nchars.append(len(t or ""))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(nchars, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: {len(ids)} rows (copy 0 verbatim, others word-shuffled)")


def tile_embeddings(con, src: str, out: str, copies: int, counts: dict) -> None:
    base = con.execute(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetch_arrow_table().to_pydict()
    stride = counts["embeddings"]
    mat = np.array([list(v) for v in base["embedding"]], dtype=np.float32)
    dim = mat.shape[1]
    ids, vecs, labels = [], [], []
    for i in range(copies):
        perm = (
            np.arange(dim)
            if i == 0
            else np.random.default_rng(1000 + i).permutation(dim)
        )
        m = mat[:, perm]
        for j in range(stride):
            ids.append(int(base["vec_id"][j]) + i * stride)
            vecs.append(m[j].tolist())
            labels.append(base["label"][j])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(ids)} rows (per-copy dim permutation)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--threads", type=int, default=None,
                    help="cap duckdb threads (polite generation next to "
                    "other work; default: duckdb's own)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    if args.threads:
        con.execute(f"PRAGMA threads={int(args.threads)}")
    counts = _counts(con, args.src)
    tile_relational(con, args.src, args.out, args.copies, counts)
    tile_documents(con, args.src, args.out, args.copies, counts)
    tile_embeddings(con, args.src, args.out, args.copies, counts)
    print("done:", args.out)


if __name__ == "__main__":
    sys.exit(main())

"""FLAGSHIP evidence for the round-5 BPE trainer: a real-vocab-scale
merge count (32k, the size actual tokenizers train) over the 250k-doc
synthetic corpus — the shape the old 2-Spark-jobs-per-merge loop
could never reach (~64k jobs ≈ days).

Reports the cluster phase (word-count reduction + bounded collect)
and the driver merge loop separately: the cluster phase is the only
part that scales with corpus size; the merge loop is a pure function
of the vocab.

Usage: python tools/bench_bpe.py [--docs 250000] [--merges 32000]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.bpe import apply_bpe, train_bpe

from bench_textops import gen_corpus  # noqa: E402  (tools/ sibling)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--merges", type=int, default=32_000)
    args = ap.parse_args()

    spark = get_session(app_name="bench_bpe")
    corpus = gen_corpus(spark, args.docs)

    t0 = time.perf_counter()
    merges = train_bpe(corpus, num_merges=args.merges)
    train_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_tokens = (
        apply_bpe(corpus.limit(10_000), merges)
        .agg({"n_bpe_tokens": "sum"})
        .collect()[0][0]
    )
    encode_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "docs": args.docs,
                "merges_requested": args.merges,
                "merges_learned": len(merges),
                "train_sec": round(train_s, 2),
                "encode_10k_sec": round(encode_s, 2),
                "encoded_tokens_10k": int(n_tokens),
            }
        )
    )


if __name__ == "__main__":
    main()

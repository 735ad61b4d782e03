"""Re-run of FLAGSHIP.md negative result #1 with the round-5
exact-collapse guard: the adversarially duplicated corpus that sent
LSH pair emission quadratic (437s at 250k docs) now runs through
``near_dedup`` in linear-ish time because byte-identical groups are
collapsed to one representative before any band self-join.

Corpus: doc i's text is generated from seed ``i % n_groups`` — with
n_groups=5000 at 250k docs every document has exactly 50 identical
twins, the same shape as the early generator that produced the
original blowup. Uncollapsed, the band self-join emits
C(50,2) x 5000 = 6.1M candidate pairs before clustering even starts;
collapsed, it emits only the rep-level pairs (~0, the groups are
mutually unrelated).

Usage: python tools/bench_twin_dedup.py [--sizes 50000,250000]
       [--uncollapsed-max 50000] [--reps 3]

Emits one JSON line:
{"n_groups": 5000, "sec": {"collapsed": {size: s}, "uncollapsed": {...}},
 "pairs": {"collapsed_reps": n, "member_level_50000": n}}

The uncollapsed leg is capped (default 50k docs = 10 twins each,
225k pairs) — running it at 250k is the 437s negative result itself
and proves nothing new.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.dedup import (
    _collapsed_rep_pairs,
    lsh_candidate_pairs,
    near_dedup,
)


def twin_corpus(
    spark: SparkSession, n_docs: int, n_groups: int = 5000, tokens: int = 120
) -> DataFrame:
    """Every doc's text derives from (id % n_groups): n_docs/n_groups
    exact twins per group, tokens non-linear in (seed, j) via xxhash64
    (see tools/bench_textops.py for why linearity is fatal here)."""
    ids = spark.range(0, n_docs, 1, 64)
    text = F.concat_ws(
        " ",
        F.expr(
            f"transform(sequence(1, {tokens}), "
            f"j -> concat('w', pmod(xxhash64(id % {n_groups}, j), 1000003)))"
        ),
    )
    return ids.select(F.col("id").alias("doc_id"), text.alias("text"))


def _timed(build) -> float:
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,250000")
    ap.add_argument("--uncollapsed-max", type=int, default=50000)
    ap.add_argument("--n-groups", type=int, default=5000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_session(app_name="bench_twin_dedup")
    sec: dict[str, dict[str, float]] = {"collapsed": {}, "uncollapsed": {}}

    # round-robin passes, keep per-leg min (burst-proof protocol)
    legs = []
    for n in sizes:
        legs.append(("collapsed", n, True))
        if n <= args.uncollapsed_max:
            legs.append(("uncollapsed", n, False))
    for _ in range(args.reps):
        for mode, n, collapse in legs:
            corpus = twin_corpus(spark, n, args.n_groups)
            t = _timed(
                lambda c=corpus, co=collapse: near_dedup(
                    c, k=16, bands=4, collapse_exact=co
                )
            )
            key = str(n)
            prev = sec[mode].get(key)
            sec[mode][key] = t if prev is None else min(prev, t)
            print(f"  {mode} n={n}: {t:.2f}s", file=sys.stderr, flush=True)

    # pair-cardinality evidence at the largest size
    big = twin_corpus(spark, sizes[-1], args.n_groups)
    _, _, rep_pairs = _collapsed_rep_pairs(big, "doc_id", "text", 3, 16, 4)
    small = twin_corpus(spark, min(sizes), args.n_groups)
    pairs = {
        f"collapsed_reps_{sizes[-1]}": rep_pairs.count(),
        f"member_level_{min(sizes)}": lsh_candidate_pairs(
            small, k=16, bands=4
        ).count(),
    }
    print(json.dumps({"n_groups": args.n_groups, "sec": sec, "pairs": pairs}))


if __name__ == "__main__":
    main()

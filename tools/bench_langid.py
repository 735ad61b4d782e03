"""Language-ID classification cost: the head-bounded explode vs the
unbounded one, and how the bound keeps per-document cost constant as
documents grow.

Generates ``--docs`` synthetic documents of ``--chars`` characters
(repeating multilingual sentence stock), trains 6-language profiles,
then times ``classify_language`` end-to-end (count) with
``max_chars`` ∈ {500, 4000, None} at two document lengths.

Usage: python tools/bench_langid.py [--docs 5000] [--chars 2000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from binancedatapipeline_spark.session import get_session  # noqa: E402
from binancedatapipeline_spark.textops import langid  # noqa: E402

_STOCK = {
    "en": "the quick brown fox jumps over the lazy dog near the river bank",
    "es": "el rapido zorro marron salta sobre el perro perezoso junto al rio",
    "fr": "le rapide renard brun saute par dessus le chien paresseux pres de la riviere",
    "de": "der schnelle braune fuchs springt uber den faulen hund am fluss entlang",
    "it": "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
    "pt": "a rapida raposa marrom pula sobre o cachorro preguicoso perto do rio",
}


def timed(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--chars", type=int, default=2000)
    ap.add_argument(
        "--para",
        action="store_true",
        help="measure classify_language_paragraphs over a docs x "
        "paragraphs grid instead of the document-level curve",
    )
    ap.add_argument(
        "--many-langs",
        action="store_true",
        help="measure the >50-language codegen fallback: the classify "
        "fold carries 2 aggregate columns per language, so past "
        "~spark.sql.codegen.maxFields/2 languages the aggregate drops "
        "out of whole-stage codegen — time the SAME corpus at "
        "language counts straddling the bound",
    )
    args = ap.parse_args()

    spark = get_session(shuffle_partitions=32)

    if args.many_langs:
        import random

        rng = random.Random(7)
        stocks = {}
        for i in range(80):
            letters = rng.sample("abcdefghijklmnopqrstuvwxyz", 8)
            stocks[f"l{i:02d}"] = " ".join(
                "".join(rng.choices(letters, k=rng.randint(3, 8)))
                for _ in range(40)
            )
        all_langs = sorted(stocks)
        rows = [
            (i, (stocks[all_langs[i % 10]] + " ") * (args.chars // 200 + 1))
            for i in range(args.docs)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"]).cache()
        docs.count()
        res = {"docs": args.docs, "mode": "many_langs"}
        for n_langs in (10, 40, 60, 80):
            train = spark.createDataFrame(
                [(lg, stocks[lg] * 8) for lg in all_langs[:n_langs]],
                ["lang", "text"],
            )
            prof = langid.collect_profiles(
                langid.train_language_profiles(train, top_k=200)
            )
            out = langid.classify_language(docs, prof)
            plan = out._jdf.queryExecution().executedPlan().toString()
            # is the conditional-aggregate fold still codegen'd? the
            # fallback is HashAggregate outside any WholeStageCodegen
            res[f"langs{n_langs}_sec"] = round(
                timed(
                    lambda out=out: out.agg(
                        F.sum(F.length("lang_id")), F.sum("lang_id_dist")
                    ).first()
                ),
                3,
            )
            # codegen'd operators print as "*(N) HashAggregate"; an
            # interpreted fallback line has no "*(" stage marker
            res[f"langs{n_langs}_agg_codegen"] = not any(
                "HashAggregate" in ln and "*(" not in ln
                for ln in plan.splitlines()
            )
            # sanity: the classifier still classifies (majority of the
            # 10 source languages recovered)
            if n_langs == 60:
                ok = out.filter(
                    F.col("lang_id") == F.concat(
                        F.lit("l"),
                        F.lpad((F.col("doc_id") % 10).cast("string"), 2, "0"),
                    )
                ).count()
                res["langs60_accuracy"] = round(ok / args.docs, 3)
        docs.unpersist()
        print(json.dumps(res))
        return
    langs = sorted(_STOCK)
    train = spark.createDataFrame(
        [(lang, _STOCK[lang] * 8) for lang in langs], ["lang", "text"]
    )
    profiles = langid.train_language_profiles(train, top_k=300).cache()
    profiles.count()

    if args.para:
        from binancedatapipeline_spark.textops.langid import (
            classify_language_paragraphs,
        )

        res = {"docs": args.docs, "mode": "paragraphs"}
        for n_para in (4, 16, 64):
            rows = [
                (
                    i,
                    "\n\n".join(
                        (_STOCK[langs[(i + j) % len(langs)]] + " ") * 5
                        for j in range(n_para)
                    ),
                )
                for i in range(args.docs)
            ]
            docs = spark.createDataFrame(rows, ["doc_id", "text"]).cache()
            docs.count()
            res[f"para{n_para}_sec"] = round(
                timed(
                    lambda: classify_language_paragraphs(docs, profiles)
                    .agg(
                        F.sum(F.length("lang_majority")),
                        F.sum("n_paragraphs_classified"),
                    )
                    .first()
                ),
                3,
            )
            docs.unpersist()
        print(json.dumps(res))
        return

    res = {"docs": args.docs, "chars": args.chars}
    for factor, tag in ((1, ""), (4, "_4x_chars")):
        chars = args.chars * factor
        rows = [
            (i, (_STOCK[langs[i % len(langs)]] + " ") * (chars // 60 + 1))
            for i in range(args.docs)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"]).cache()
        docs.count()
        for mc in (500, 4000, None):
            key = f"mc{mc or 'full'}{tag}_sec"
            # checksum, NOT count(): the round-9 classify plan joins a
            # groupBy(id) aggregate back on id, which Spark proves
            # unique and ELIMINATES under count() — a count would time
            # the cached scan, not the classification
            res[key] = round(
                timed(
                    lambda mc=mc: langid.classify_language(
                        docs, profiles, max_chars=mc
                    )
                    .agg(F.sum(F.length("lang_id")), F.sum("lang_id_dist"))
                    .first()
                ),
                3,
            )
        docs.unpersist()

    print(json.dumps(res))


if __name__ == "__main__":
    main()

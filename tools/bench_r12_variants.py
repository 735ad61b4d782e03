"""Round-12 in-process paired A/B: count_distinct plan variants and
tfidf df-attach modes, timed with the bench methodology (noop sink,
interleaved round-robin passes, per-pass host-calibration probes) in
ONE process so host drift between variants is visible, not silent.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata_big/sf1 python tools/bench_r12_variants.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as bench_mod
from binancedatapipeline_spark.session import get_session


def cd_current(spark, sf_dir):
    """C1: repartition(suppkey) first, two exchange-free distinct
    branches, key-local join (the r7 form, today's registry plan)."""
    import __spark_entry__ as e

    return e.q_count_distinct(spark, sf_dir)


def cd_branch_join(spark, sf_dir):
    """C3: no up-front repartition — each branch pays its own
    (suppkey, value) distinct exchange WITH map-side partial distinct,
    then a suppkey exchange for the count; join reuses partitioning."""
    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem")
    d = li.select("l_suppkey", "l_partkey", "l_orderkey")
    parts = (
        d.select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("l_partkey").alias("n_parts"))
    )
    orders = (
        d.select("l_suppkey", "l_orderkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("l_orderkey").alias("n_orders"))
    )
    return parts.join(orders, "l_suppkey")


def cd_expand(spark, sf_dir):
    """C2: the single two-countDistinct aggregate (Expand doubles the
    scan rows; rejected at sf0.1 in rounds 5/7 — re-measured at sf1
    per VERDICT item 6)."""
    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def cd_repart_expand(spark, sf_dir):
    """C4: repartition(suppkey) then the two-countDistinct aggregate —
    Expand happens post-shuffle, the aggregate is exchange-free."""
    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem")
    return (
        li.select("l_suppkey", "l_partkey", "l_orderkey")
        .repartition(F.col("l_suppkey"))
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def tfidf_window(spark, sf_dir):
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import tfidf_top_terms

    d = e._t(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, k=3, df_mode="window")
    return out.select(
        "doc_id", "term", "tf", e._r6("tfidf").alias("tfidf"), "term_rank"
    )


def tfidf_broadcast(spark, sf_dir):
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import tfidf_top_terms

    d = e._t(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, k=3, df_mode="broadcast")
    return out.select(
        "doc_id", "term", "tf", e._r6("tfidf").alias("tfidf"), "term_rank"
    )


def tfidf_repart_id(spark, sf_dir):
    """Candidate: repartition the exploded tokens by doc id BEFORE the
    tf aggregate — the aggregate then plans complete (no partial, no
    own exchange) and the per-doc top-k window rides the same
    hash(id) partitioning, removing the tf-sized window exchange; the
    df aggregate still reuses the repartition exchange. Trade: the one
    big exchange carries RAW exploded tokens (no map-side partial-agg
    compression)."""
    import __spark_entry__ as e
    from pyspark.sql import Window
    from binancedatapipeline_spark.textops.analysis import tokens_col

    d = e._t(spark, sf_dir, "documents")
    toks = tokens_col(F.lower(F.col("text")))
    tf = (
        d.select(F.col("doc_id"), F.explode(toks).alias("term"))
        .filter(F.length("term") > 0)
        .repartition(F.col("doc_id"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = d.select(F.count_distinct(F.col("doc_id")).alias("__n"))
    dfc = tf.groupBy("term").agg(F.sum(F.when(F.col("tf") > 0, 1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(dfc), "term")
        .join(F.broadcast(n_docs), F.lit(True))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.lit(1) + F.col("__n")) / (F.lit(1) + F.col("__df"))) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    out = (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "term_rank")
    )
    return out.select(
        "doc_id", "term", "tf", e._r6(F.col("tfidf")).alias("tfidf"), "term_rank"
    )


def _emb(spark, sf_dir):
    import __spark_entry__ as e

    return e._t(spark, sf_dir, "embeddings")


def _emb_queries(emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _mk_cosine(kernel):
    def fn(spark, sf_dir):
        from binancedatapipeline_spark.similarity import cosine_topk

        emb = _emb(spark, sf_dir)
        return cosine_topk(emb, _emb_queries(emb), k=10, kernel=kernel)

    return fn


def _mk_sq8(kernel):
    def fn(spark, sf_dir):
        from binancedatapipeline_spark.similarity import (
            sq_encode,
            sq_topk,
            train_sq_params,
        )

        emb = _emb(spark, sf_dir)
        params = train_sq_params(emb)
        enc = sq_encode(emb, params).select("vec_id", "sq_code")
        return sq_topk(enc, _emb_queries(emb), params, k=10, kernel=kernel)

    return fn


def _mk_neardup(kernel):
    def fn(spark, sf_dir):
        from binancedatapipeline_spark.similarity import cosine_near_dup_pairs

        emb = _emb(spark, sf_dir)
        return cosine_near_dup_pairs(
            emb, threshold=0.3, block_col="label", kernel=kernel
        )

    return fn


def lang_guess_current(spark, sf_dir):
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import with_lang_guess

    d = e._t(spark, sf_dir, "documents")
    return with_lang_guess(d).select("doc_id", "lang", "lang_guess")


def lang_guess_regex(spark, sf_dir):
    """Candidate: per-language marker hits via one whole-token
    regexp_count per language instead of tokenize + 5 interpreted
    HOF filters (value-equal: a hit is a whole \\s-delimited token)."""
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import LANG_MARKERS

    d = e._t(spark, sf_dir, "documents")
    langs = sorted(LANG_MARKERS)
    t = F.lower(F.col("text"))
    out = d
    for lang in langs:
        alts = "|".join(LANG_MARKERS[lang])
        out = out.withColumn(
            f"__hits_{lang}",
            F.regexp_count(t, F.lit(rf"(?<=^|\s)({alts})(?=\s|$)")),
        )
    m = F.greatest(*[F.col(f"__hits_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(F.col(f"__hits_{lang}") == m, F.lit(lang)).otherwise(guess)
    guess = F.when(m == 0, F.lit("und")).otherwise(guess)
    return out.withColumn("lang_guess", guess).select("doc_id", "lang", "lang_guess")


def token_stats_current(spark, sf_dir):
    import __spark_entry__ as e

    return e.q_doc_token_stats(spark, sf_dir)


def token_stats_split(spark, sf_dir):
    """The pre-round materializing form (collapse+split+size), kept
    here as the A/B reference for the regexp_count rewrite."""
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import tokens_col

    d = e._t(spark, sf_dir, "documents")
    t = F.col("text")
    toks = tokens_col(t)
    pieces = F.split(
        F.trim(F.regexp_replace(t, r"([^\sA-Za-z0-9]|\d+)", " $1 ")), r"\s+"
    )
    return d.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_bpe_ish", F.size(pieces)
    ).select("doc_id", "n_tokens", "n_bpe_ish")


def token_stats_hybrid(spark, sf_dir):
    """n_tokens via regexp_count, n_bpe_ish via the old split form —
    isolates which of the two counts the rewrite helps/hurts."""
    import __spark_entry__ as e

    d = e._t(spark, sf_dir, "documents")
    t = F.col("text")
    n = F.regexp_count(t, F.lit(r"\S+"))
    count_or_one = F.when(n == 0, F.lit(1)).otherwise(n)
    pieces = F.split(
        F.trim(F.regexp_replace(t, r"([^\sA-Za-z0-9]|\d+)", " $1 ")), r"\s+"
    )
    return d.withColumn("n_tokens", count_or_one).withColumn(
        "n_bpe_ish", F.size(pieces)
    ).select("doc_id", "n_tokens", "n_bpe_ish")


def quality_count(spark, sf_dir):
    """Current with_quality (regexp_count char-class counts)."""
    import __spark_entry__ as e

    return e.q_doc_quality(spark, sf_dir)


def quality_replace(spark, sf_dir):
    """The pre-round with_quality: counts via regexp_replace copies +
    length and size(split) — the A/B reference."""
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import tokens_col

    d = e._t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    mean_tok = n_alpha / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(200.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
    )
    out = (
        d.withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", mean_tok)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("quality_score", score)
    )
    return out.select(
        "doc_id", "n_tokens", e._r6(F.col("mean_token_len")).alias("mean_token_len"),
        e._r6(F.col("punct_ratio")).alias("punct_ratio"),
        e._r6(F.col("alpha_ratio")).alias("alpha_ratio"),
        e._r6(F.col("quality_score")).alias("quality_score"),
    )


VARIANTS = {
    "cd_current": cd_current,
    "cd_branch_join": cd_branch_join,
    "cd_expand": cd_expand,
    "cd_repart_expand": cd_repart_expand,
    "tfidf_window": tfidf_window,
    "tfidf_broadcast": tfidf_broadcast,
    "tfidf_repart_id": tfidf_repart_id,
    "cosine_jvm": _mk_cosine("jvm"),
    "cosine_arrow": _mk_cosine("arrow"),
    "sq8_jvm": _mk_sq8("jvm"),
    "sq8_arrow": _mk_sq8("arrow"),
    "neardup_jvm": _mk_neardup("jvm"),
    "neardup_arrow": _mk_neardup("arrow"),
    "lang_guess_current": lang_guess_current,
    "lang_guess_regex": lang_guess_regex,
    "token_stats_current": token_stats_current,
    "token_stats_split": token_stats_split,
    "token_stats_hybrid": token_stats_hybrid,
    "quality_count": quality_count,
    "quality_replace": quality_replace,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata_big/sf1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    only = os.environ.get("SPARK_GRAFT_VARIANTS")
    variants = dict(VARIANTS)
    if only:
        keep = {s.strip() for s in only.split(",")}
        variants = {k: v for k, v in variants.items() if k in keep}
    spark = get_session(app_name="bench_r12_variants")
    for name, fn in variants.items():  # warm-up (JIT/codegen exclusion)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    calib = []
    for _ in range(repeats):
        calib.append(bench_mod.host_calibration(repeats=1))
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r12 variant: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "host_calibration_per_pass": [round(c, 4) for c in calib],
        "best": {n: round(min(s), 4) for n, s in samples.items()},
        "median": {
            n: round(sorted(s)[len(s) // 2], 4) for n, s in samples.items()
        },
        "all": {n: [round(v, 4) for v in s] for n, s in samples.items()},
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

"""Deterministic hash-bucket sampling and train/val/test splits.

`df.sample()` re-draws membership every run; training pipelines need
the opposite — a document's split must be a pure function of its id
so re-running the pipeline (or adding new data) never moves existing
documents between train and test. The standard trick: hash the id
into B buckets and cut the bucket range.

Implemented as md5-derived 56-bit buckets (the same hash family as
textops.dedup._hash56, computable bit-identically in any SQL engine
for oracle checks). The operator is a pure per-row projection — no
shuffle, no state, trivially 100 TB-safe — and composes with
predicate pushdown when used as a sampling filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CUTS: tuple[tuple[str, int], ...] = (("train", 80), ("val", 90))
DEFAULT_FALLBACK = "test"


def hash_bucket(id_col: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from the id's decimal
    string form — md5 → first 56 bits → mod."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 14),
        16,
        10,
    ).cast("bigint")
    return h % buckets


def split_col(
    id_col: str,
    buckets: int = 100,
    cuts: Sequence[tuple[str, int]] = DEFAULT_CUTS,
    fallback: str = DEFAULT_FALLBACK,
) -> Column:
    """Split label from cumulative bucket cut-points: with the default
    cuts, buckets [0,80) → train, [80,90) → val, rest → test."""
    b = hash_bucket(id_col, buckets)
    expr = None
    for name, upper in cuts:
        cond = b < upper
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(fallback)


def stable_split(
    df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 100,
    cuts: Sequence[tuple[str, int]] = DEFAULT_CUTS,
    fallback: str = DEFAULT_FALLBACK,
    output_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column keyed on ``id_col``."""
    return df.withColumn(output_col, split_col(id_col, buckets, cuts, fallback))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Stable ``fraction`` sample: keeps ids whose bucket falls below
    fraction·buckets. Same rows every run, on every engine."""
    keep = int(round(fraction * buckets))
    return df.filter(hash_bucket(id_col, buckets) < keep)


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-domain mixture reweighting: keep a stable
    ``rates[domain]`` fraction of each domain's documents (domains
    absent from ``rates`` keep ``default_rate``).

    This is the down-sampling half of training-mixture construction
    (e.g. keep 100% of books, 30% of common-crawl): membership is a
    pure function of (id), so re-running the pipeline or appending
    new data never changes which existing documents are kept, and
    per-domain proportions stay exact in expectation without a
    shuffle — the rate lookup is a literal CASE over ``domain_col``
    and the filter is the same pushdown-friendly bucket predicate as
    :func:`hash_sample`. Rates > 1 are capped at 1 (up-sampling is
    repetition, a separate concern — use an explode over
    ``ceil(rate)`` with a fractional keep for the remainder).
    """
    rate_expr = None
    # key=str: a stray None key must not crash the sort (a null domain
    # never matches the equality CASE below, so its rate is inert)
    for domain, rate in sorted(rates.items(), key=lambda kv: str(kv[0])):
        keep = int(round(min(max(rate, 0.0), 1.0) * buckets))
        cond = F.col(domain_col) == domain
        rate_expr = (
            F.when(cond, keep) if rate_expr is None else rate_expr.when(cond, keep)
        )
    default_keep = int(round(min(max(default_rate, 0.0), 1.0) * buckets))
    rate_expr = (
        F.lit(default_keep) if rate_expr is None else rate_expr.otherwise(default_keep)
    )
    return df.filter(hash_bucket(id_col, buckets) < rate_expr)


def mixture_oversample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    buckets: int = 10_000,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """The up-sampling half of mixture construction: a domain with
    rate 2.5 emits every document twice plus a stable half of them a
    third time (epoch-style repetition, the standard way scarce
    domains are over-weighted).

    Deterministic like :func:`mixture_sample`: the fractional copy is
    kept iff the id's hash bucket clears the fractional part, so the
    same documents get the extra copy every run. Emits ``copy_col``
    (0-based) so downstream shuffling/packing can interleave copies.
    Rates < 1 degenerate to :func:`mixture_sample` semantics (a
    0-or-1 copy). One explode, no shuffle, no driver state."""
    import math

    rate_expr = None
    frac_expr = None
    # key=str mirrors mixture_sample: a stray None key must not crash
    # the sort (a null domain never matches the equality CASE)
    for domain, rate in sorted(rates.items(), key=lambda kv: str(kv[0])):
        rate = max(rate, 0.0)
        whole = int(math.floor(rate))
        frac_keep = int(round((rate - whole) * buckets))
        cond = F.col(domain_col) == domain
        rate_expr = (
            F.when(cond, whole) if rate_expr is None else rate_expr.when(cond, whole)
        )
        frac_expr = (
            F.when(cond, frac_keep)
            if frac_expr is None
            else frac_expr.when(cond, frac_keep)
        )
    d_whole = int(math.floor(max(default_rate, 0.0)))
    d_frac = int(round((max(default_rate, 0.0) - d_whole) * buckets))
    rate_expr = F.lit(d_whole) if rate_expr is None else rate_expr.otherwise(d_whole)
    frac_expr = F.lit(d_frac) if frac_expr is None else frac_expr.otherwise(d_frac)
    n_copies = rate_expr + (hash_bucket(id_col, buckets) < frac_expr).cast("int")
    out = df.withColumn("__n_copies", n_copies).filter(F.col("__n_copies") > 0)
    return (
        out.withColumn(
            copy_col, F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1))
        )
        .drop("__n_copies")
    )


def shuffle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — the training-order
    randomization step before sharded writes. Row order is a pure
    function of (id, seed): re-running the pipeline reproduces the
    exact order, and bumping ``seed`` gives an independent epoch
    permutation.

    Distributed shape: the sort key is ``xxhash64(id, seed)``;
    ``repartitionByRange`` on it range-partitions the key space (one
    shuffle, sampled range boundaries, no single-point global sort)
    and ``sortWithinPartitions`` orders within each range — together
    a total global order, exactly how Spark executes any orderBy, but
    stated explicitly so the partition count (= output shard count)
    is the caller's choice. Ties (hash collisions) break on the id,
    so the order is total even across collisions."""
    key = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    out = df.withColumn("__shuffle_key", key)
    parts = (
        out.repartitionByRange(num_partitions, "__shuffle_key", id_col)
        if num_partitions
        else out.repartitionByRange("__shuffle_key", id_col)
    )
    return parts.sortWithinPartitions("__shuffle_key", id_col).drop(
        "__shuffle_key"
    )


def temperature_mixture_rates(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.7,
    token_col: str | None = None,
) -> dict[str, float]:
    """Temperature-based mixture rates (the T5/multilingual-LM
    alpha-sampling rule): a domain with share p of the corpus gets
    sampling weight ∝ p^alpha, renormalized so the LARGEST resulting
    rate is 1.0 — alpha < 1 flattens the mixture (up-weights small
    domains, down-samples dominant ones), alpha = 1 keeps natural
    proportions.

    Returns {domain: keep_fraction} to feed :func:`mixture_sample`
    (a rate of 1.0 keeps the whole domain; head domains get < 1).
    The size-by-domain aggregation is one groupBy over the corpus
    (weighted by ``token_col`` when given, else document counts); the
    result is domain-cardinality-sized, collected to the driver by
    design — it IS the mixture spec."""
    agg = (
        F.sum(token_col).cast("double") if token_col else F.count(F.lit(1)).cast("double")
    )
    sizes = {
        r["d"]: r["w"]
        for r in df.groupBy(F.col(domain_col).alias("d")).agg(agg.alias("w")).collect()
    }
    # zero/null-weight domains (all-empty or all-null token sums) have
    # no mass to reweight — p^(alpha-1) would divide by zero — and a
    # NULL domain can't be matched by mixture_sample's equality CASE
    # anyway; both are omitted from the returned spec so
    # mixture_sample's default_rate governs them
    sizes = {d: w for d, w in sizes.items() if w and d is not None}
    total = sum(sizes.values()) or 1.0
    # target share ∝ p^alpha; dividing by natural share p gives the
    # per-domain KEEP rate shape p^(alpha-1), scaled so max = 1
    raw = {d: (w / total) ** (alpha - 1.0) for d, w in sizes.items()}
    hi = max(raw.values()) if raw else 1.0
    return {d: r / hi for d, r in raw.items()}


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    score_col: str = "score",
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 1000,
    exact: bool = False,
) -> DataFrame:
    """Quality-ranked data selection under a token budget: keep the
    highest-``score_col`` documents whose cumulative ``n_tokens_col``
    fits ``budget_tokens`` — the selection step (QuRating/DsDm-style)
    that turns a scored corpus into a right-sized training set.

    The naive form is a GLOBAL sort + running sum — a single-task
    window at 100 TB. This implementation is the scale-safe two-pass
    threshold search instead:

    1. one aggregation buckets scores into ``n_buckets`` equi-width
       bins and sums tokens per bin (bin table is driver-tiny);
    2. the driver walks bins best-first to find the threshold bin
       where the cumulative budget lands;
    3. one filter keeps everything STRICTLY above the threshold bin —
       pure map, pushdown-friendly.

    Default (``exact=False``) stops there: the kept set undershoots
    the budget by at most one bin's tokens (resolution = corpus
    tokens / n_buckets, so 0.1% at the default — raise n_buckets for
    finer). ``exact=True`` additionally rank-orders ONLY the
    threshold bin (a window over ~1/n_buckets of the corpus,
    deterministic (score desc, id) order) and takes its prefix, so
    the result is exactly the global-sort answer at a fraction of its
    cost."""
    from pyspark.sql import Window

    stats = df.agg(
        F.min(score_col).alias("lo"), F.max(score_col).alias("hi")
    ).collect()[0]
    if stats["lo"] is None:
        return df.filter(F.lit(False))
    lo, hi = float(stats["lo"]), float(stats["hi"])
    width = (hi - lo) / n_buckets or 1.0
    # null scores sort LAST (bin -1): least/greatest skip nulls, so
    # without the explicit branch a null score would land in the TOP
    # bin and poison the threshold walk (score_documents emits null
    # avg_logp for token-less docs — a realistic input here)
    bucket = F.when(F.col(score_col).isNull(), F.lit(-1)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col(score_col) - lo) / width).cast("int"),
        )
    )
    # null token counts count as 0 (F.sum would otherwise return a
    # None bin total and crash the driver walk)
    bins = {
        r["b"]: r["t"] or 0
        for r in df.select(
            bucket.alias("b"),
            F.coalesce(F.col(n_tokens_col), F.lit(0)).alias("t"),
        )
        .groupBy("b")
        .agg(F.sum("t").alias("t"))
        .collect()
    }
    spent, thresh = 0, n_buckets
    for b in sorted(bins, reverse=True):
        if spent + bins[b] > budget_tokens:
            thresh = b
            break
        spent += bins[b]
    else:
        return df  # whole corpus fits the budget
    kept = df.filter(bucket > thresh)
    if not exact:
        return kept
    remaining = budget_tokens - spent
    edge = df.filter(bucket == thresh)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    edge_kept = (
        edge.withColumn("__cum", F.sum(n_tokens_col).over(w))
        .filter(F.col("__cum") <= remaining)
        .drop("__cum")
    )
    return kept.unionByName(edge_kept)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap each group's contribution at ``max_rows`` documents — the
    per-domain quota of crawl curation (RefinedWeb-style: no single
    site dominates the corpus). Keeps the best ``order_col``
    (descending — pass a quality score) per group, ties and the
    no-score case broken by ``id_col`` so the selection is
    deterministic and stable under re-runs. One window over the
    group key; rows with a NULL group pass through uncapped (no
    meaningful quota key)."""
    from pyspark.sql import Window

    order = (
        [F.col(order_col).desc_nulls_last(), F.col(id_col).asc()]
        if order_col is not None
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    ranked = df.withColumn("__rank", F.row_number().over(w))
    return ranked.filter(
        F.col(group_col).isNull() | (F.col("__rank") <= max_rows)
    ).drop("__rank")

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
    for domain, rate in sorted(rates.items()):
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
    for domain, rate in sorted(rates.items()):
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

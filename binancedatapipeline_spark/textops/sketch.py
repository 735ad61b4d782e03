"""Count-Min sketch: bounded-memory frequency estimation over
unbounded key spaces.

Exact token/n-gram counting over a 100 TB corpus shuffles one state
row per DISTINCT key — for word 5-grams that is more state than the
corpus. A Count-Min sketch caps the state at ``depth x width``
counters regardless of cardinality, with the classic one-sided
guarantee: estimates never undercount, and overcount by more than
``e/width * N`` (N = total weight) with probability at most
``e^-depth`` per key.

Spark-first shape: the sketch IS a DataFrame of at most
``depth x width`` rows — built with one explode + groupBy (map-side
partial aggregation does the heavy fold), merged with union+groupBy,
probed with a broadcast join. No driver arrays, no UDFs, no
``collect`` anywhere in the build, so sketches compose with the rest
of the engine (persist them, upsert them into the warehouse as
incremental state, union them across corpus shards).

The (depth, width) parameters ride ON the relation as constant
columns: a probe or merge with mismatched parameters would silently
break the never-undercounts guarantee (wrong buckets read as implicit
zeros), so estimate/merge read the parameters off the sketch itself
and raise on any conflict instead of trusting the caller to repeat
them correctly.

Reference parity: the reference engine has no sketch operators; this
is part of the beyond-reference training-data suite (brief: "a novel
sketch" under custom operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CELLS = ["row", "bucket", "cnt", "depth", "width"]


def _params(sketch: DataFrame, what: str, cols: tuple[str, ...] = ("depth", "width")) -> tuple:
    """The parameter tuple read off a sketch relation — one bounded
    action over the (tiny by construction) state. Raises if the
    relation mixes parameters (e.g. a careless union of incompatible
    sketches) — the shared guard for every sketch family in this
    module (CMS geometry, histogram bin edges)."""
    rows = sketch.select(*cols).distinct().limit(3).collect()
    if len(rows) != 1:
        raise ValueError(
            f"{what}: sketch relation carries "
            f"{[tuple(r) for r in rows]} {cols} tuples — expected "
            "exactly one; was it unioned from incompatible sketches?"
        )
    return tuple(rows[0])


def _cells(key_col: str, depth: int, width: int) -> F.Column:
    """The depth seeded (row, bucket) cells of a key — the ONE hash
    derivation shared by build and probe so they cannot diverge."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 8192,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over ``df[key_col]``.

    Returns the sketch relation ``(row, bucket, cnt, depth, width)``
    with at most ``depth x width`` rows (absent cells are implicit
    zeros; depth/width are constant parameter columns — see module
    note). NULL keys are ignored (SQL aggregate convention).
    ``weight_col`` makes it a weighted sketch (e.g. pre-aggregated
    counts).

    Plan: per input row, ``depth`` (row, bucket) pairs from one
    inline array explode — xxhash64 seeded by the row index keeps
    the hash family independent and JVM-side — then a single
    groupBy whose partial aggregation collapses each partition to
    <= depth*width cells before the one bounded shuffle."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(_cells(key_col, depth, width)).alias("__cell"),
        w.alias("__w"),
    )
    return (
        pairs.select("__cell.row", "__cell.bucket", "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
        .select("*", F.lit(depth).alias("depth"), F.lit(width).alias("width"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width):
    cell-wise sum. Mergeability is the point — per-shard or per-batch
    sketches fold into a corpus sketch without touching the raw data
    again. Raises if the parameters differ (summing cells from
    different hash geometries is silent garbage)."""
    pa, pb = _params(a, "cms_merge"), _params(b, "cms_merge")
    if pa != pb:
        raise ValueError(
            f"cms_merge: incompatible sketches — (depth, width) {pa} vs {pb}"
        )
    return (
        a.select(_CELLS)
        .unionByName(b.select(_CELLS))
        .groupBy("row", "bucket", "depth", "width")
        .agg(F.sum("cnt").alias("cnt"))
        .select(_CELLS)
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
) -> DataFrame:
    """Point estimates: one row per DISTINCT non-null key tuple in
    ``keys``, with ``est`` >= the true count (never under).

    depth/width come from the sketch relation itself — passing them
    again was the silent-zero footgun (a probe with the wrong width
    reads empty buckets and undercounts to 0). NULL keys are excluded
    to mirror the build convention; duplicate key rows collapse to
    one output row (estimates are properties of the key, not the
    probe multiplicity).

    The probe re-derives each key's ``depth`` cells with the same
    seeded hashes and takes the MIN over rows; a cell missing from
    the sketch relation is an implicit zero. The sketch side is
    <= depth*width rows — broadcast, so probing any number of keys
    is shuffle-free on the key side until the final per-key min."""
    depth, width = _params(sketch, "cms_estimate")
    reserved = {"row", "bucket", "cnt", "est", "__c", "__cell"} & set(keys.columns)
    if reserved:
        raise ValueError(
            f"cms_estimate: keys carries reserved column(s) {sorted(reserved)} "
            "— rename them before probing (they collide with the probe's "
            "internal cell/join columns)"
        )
    keys = keys.filter(F.col(key_col).isNotNull()).distinct()
    probe = keys.select(
        "*",
        F.explode(_cells(key_col, depth, width)).alias("__cell"),
    ).select("*", "__cell.row", "__cell.bucket").drop("__cell")
    joined = probe.join(
        F.broadcast(sketch.select("row", "bucket", "cnt")), ["row", "bucket"], "left"
    ).withColumn("__c", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
    group_cols = list(keys.columns)
    return joined.groupBy(*group_cols).agg(F.min("__c").alias("est"))


def cms_error_bound(sketch: DataFrame) -> DataFrame:
    """The additive error guarantee as data: one row with ``total_n``
    (total sketched weight, read off any hash row) and ``eps_bound``
    = e/width * N — the overcount no key exceeds with probability
    >= 1 - e^-depth. Lets callers threshold heavy-hitter candidates
    without rescanning the corpus."""
    _, width = _params(sketch, "cms_error_bound")
    return (
        sketch.filter(F.col("row") == 0)
        .agg(F.sum("cnt").alias("total_n"))
        .select(
            "total_n",
            (F.lit(2.718281828459045) / F.lit(width) * F.col("total_n")).alias(
                "eps_bound"
            ),
        )
    )


# ---------------------------------------------------------------- HLL

# Distinct-count state, same philosophy as the Count-Min relation:
# the sketch is a DataFrame (one Datasketches-HLL binary per group),
# bounded at ~2^lgk bytes per group regardless of cardinality,
# mergeable across shards/batches without re-reading data. Contrast
# with Count-Min on replay: HLL union has SET semantics, so merging
# the same sketch twice is a no-op — per-batch state is unnecessary;
# a stored sketch can be re-merged with a retried batch safely.
# Built entirely on Spark's JVM-side hll_* aggregates.


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``key_col`` values:
    ``group_cols + (hll: binary)``. lgk=12 -> ~4 KiB/group, ~2%
    relative error. One shuffle (the groupBy), partials fold
    map-side like any aggregate."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("hll")
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """Cell-wise union of two sketch relations. Idempotent on
    identical sketches (set semantics) — safe under batch replay
    without the per-batch keying Count-Min needs."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("hll").alias("hll"))
    )


def hll_estimate(
    sketch: DataFrame, group_cols: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """``group_cols + (n_distinct: long)`` estimates off the sketch —
    no rescan of the sketched data."""
    return sketch.select(
        *group_cols, F.hll_sketch_estimate("hll").alias("n_distinct")
    )


# ------------------------------------------------------------ histogram

# Quantile state, completing the mergeable-state family (frequency =
# Count-Min, distinct = HLL, quantiles = this): a fixed-bin histogram
# relation of at most groups x (bins + 2) rows. Spark's
# percentile_approx answers one-shot quantile queries fine; what it
# does not give you is PERSISTABLE state — per-shard histograms you
# upsert into the warehouse, merge across batches (cell-wise sum,
# CMS replay discipline applies: key by batch for retries), and query
# later without rescanning data. Bin edges are fixed at build time,
# so error is bounded by bin width and merging requires identical
# edges — which therefore ride the relation like CMS's (depth, width).


_HIST_COLS = ["bin", "cnt", "lo", "hi", "bins"]
_HIST_COLS_SET = set(_HIST_COLS)
_HIST_EDGES = ("lo", "hi", "bins")


def hist_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Per-group fixed-bin histogram of ``value_col`` over [lo, hi):
    ``group_cols + (bin, cnt, lo, hi, bins)``. Bin -1 catches values
    below ``lo``, bin ``bins`` catches >= ``hi`` (so finite mass is
    never silently dropped); NULL and NaN are ignored (NaN sorts
    above every number in Spark, so without the explicit filter it
    would land in the overflow bin and drag every upper quantile to
    the clamp — percentile_approx ignores NaN, and this state must
    agree with the oracle it replaces). One bounded groupBy."""
    if not (hi > lo) or bins < 1:
        raise ValueError(f"hist_build: need hi > lo and bins >= 1, got [{lo}, {hi}) x {bins}")
    reserved = _HIST_COLS_SET & set(group_cols)
    if reserved:
        raise ValueError(
            f"hist_build: group_cols collide with reserved state column(s) "
            f"{sorted(reserved)} — rename them (the relation carries "
            "bin/cnt/lo/hi/bins)"
        )
    v = F.col(value_col).cast("double")
    bin_col = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - lo) / ((hi - lo) / bins)).cast("int"))
    )
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *group_cols, "bin", "cnt",
            F.lit(float(lo)).alias("lo"),
            F.lit(float(hi)).alias("hi"),
            F.lit(bins).alias("bins"),
        )
    )


def hist_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """Cell-wise sum of two histograms with identical (lo, hi, bins);
    raises on mismatched edges (summing different binnings is silent
    garbage, same rule as cms_merge — both run through the shared
    _params guard)."""
    pa = _params(a, "hist_merge", _HIST_EDGES)
    pb = _params(b, "hist_merge", _HIST_EDGES)
    if pa != pb:
        raise ValueError(
            f"hist_merge: incompatible binnings (lo, hi, bins) {pa} vs {pb}"
        )
    cols = [*group_cols, *_HIST_COLS]
    return (
        a.select(cols)
        .unionByName(b.select(cols))
        .groupBy(*group_cols, "bin", "lo", "hi", "bins")
        .agg(F.sum("cnt").alias("cnt"))
        .select(cols)
    )


def hist_quantile(
    hist: DataFrame,
    q: float,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Per-group quantile estimate off the histogram relation alone
    (no data rescan): ``group_cols + (q_est)``, linear interpolation
    inside the bin holding the q-th mass, error bounded by one bin
    width. Underflow/overflow bins clamp to lo/hi (their true spread
    is unknown to the state — callers wanting exact tails must widen
    [lo, hi)). Validates the relation carries exactly ONE binning
    (a mixed-edge union would cumulate different bin widths into one
    window and return plausible-looking garbage). Whole computation
    is window + filter over the <= groups x (bins+2) relation —
    trivially small. Unlike :func:`hist_quantiles`, this single-q
    form does NOT reserve a ``q`` input column (its output carries
    none) — the internal label rides a dunder column."""
    return _hist_quantiles(hist, [q], group_cols, "hist_quantile").select(
        *group_cols, "q_est"
    )


def hist_quantiles(
    hist: DataFrame,
    qs,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Per-group quantile estimates for SEVERAL q values in one pass
    over the histogram relation: ``group_cols + (q, q_est)``, one row
    per (group, q). Same estimator as :func:`hist_quantile` (linear
    interpolation in the bin holding the q-th mass, under/overflow
    bins clamp to lo/hi, one-bin-width error) — the q values ride the
    relation via a tiny explode so all windows run in the ONE pass a
    per-q loop would repeat. The relation is ≤ groups × (bins+2) × |qs|
    rows — still trivially small. Reserves ``q`` in the INPUT (the
    output carries the quantile label under that name)."""
    if "q" in hist.columns:
        raise ValueError(
            "hist_quantiles: the relation already carries a 'q' column "
            "(reserved for the quantile label) — rename it"
        )
    out = _hist_quantiles(hist, qs, group_cols, "hist_quantiles")
    return out.select(*group_cols, F.col("__q").alias("q"), "q_est")


def _hist_quantiles(
    hist: DataFrame,
    qs,
    group_cols,
    caller: str,
) -> DataFrame:
    """Shared estimator: ``group_cols + (__q, q_est)``. The label
    column is a dunder so the single-q wrapper stays compatible with
    relations that legitimately carry a caller column named 'q';
    validation errors speak as ``caller``."""
    qs = [float(q) for q in qs]
    if not qs:
        raise ValueError(f"{caller}: need at least one q")
    bad = [q for q in qs if not (0.0 <= q <= 1.0)]
    if bad:
        raise ValueError(f"{caller}: q must be in [0, 1], got {bad}")
    if len(set(qs)) != len(qs):
        raise ValueError(f"{caller}: duplicate q values in {qs}")
    if "__q" in hist.columns:
        raise ValueError(
            f"{caller}: the relation already carries the internal "
            "'__q' column — rename it"
        )
    _params(hist, caller, _HIST_EDGES)
    from pyspark.sql import Window

    gw = Window.partitionBy(*group_cols, "__q")
    ow = gw.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    width = (F.col("hi") - F.col("lo")) / F.col("bins")
    h = (
        hist.withColumn("__q", F.explode(F.array(*[F.lit(q) for q in qs])))
        .withColumn("__cum", F.sum("cnt").over(ow))
        .withColumn("__total", F.sum("cnt").over(gw))
        .withColumn("__target", F.col("__total") * F.col("__q"))
    )
    # the first bin whose cumulative mass reaches the target
    h = h.filter(F.col("__cum") >= F.col("__target")).withColumn(
        "__rank", F.row_number().over(gw.orderBy("bin"))
    ).filter(F.col("__rank") == 1)
    frac = (F.col("__target") - (F.col("__cum") - F.col("cnt"))) / F.col("cnt")
    inside = F.col("lo") + (F.col("bin") + frac) * width
    est = (
        F.when(F.col("bin") < 0, F.col("lo"))
        .when(F.col("bin") >= F.col("bins"), F.col("hi"))
        .otherwise(F.least(F.greatest(inside, F.col("lo")), F.col("hi")))
    )
    return h.select(*group_cols, "__q", est.alias("q_est"))

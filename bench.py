"""Benchmark harness: times every __spark_entry__ query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "queries_median": {...},
     "queries_isolated": {...}, "sf": 0.1}

Each query is forced end-to-end with the noop writer (full execution,
no driver-side collect overhead). Three per-query records: best and
median of the interleaved round-robin passes (noise rejection /
noise visibility), plus the isolated back-to-back warm probe (the
plan's intrinsic cost, free of inter-query JVM state churn).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from binancedatapipeline_spark.session import get_session


def host_calibration(repeats: int = 3) -> float:
    """Pinned CPU-bound probe (seconds, best of ``repeats``): a fixed
    sha256 keystream + a fixed numpy matmul, no Spark anywhere. Round
    10 proved ±24% day-to-day CPU-delivery swings on this microVM host
    by hand-re-benching an old tree; this bakes the denominator into
    every sample — compare composites across rounds as
    value/host_calibration, not raw seconds. The workload is
    deterministic (fixed bytes, fixed seed), single-threaded, and
    sized ~1s on the reference host day."""
    import hashlib

    import numpy as np

    best = float("inf")
    rng_mat = np.random.default_rng(42).standard_normal((512, 512))
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        block = b"\x5a" * (1 << 20)
        for _ in range(576):  # 576 MiB of sha256
            h.update(block)
        acc = rng_mat
        for _ in range(72):
            acc = acc @ rng_mat
            acc = acc / np.abs(acc).max()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_session(app_name="bench")

    # Warm-up: run each query once at the MEASURED scale factor so
    # JVM/codegen compilation isn't charged to the timed runs (AQE
    # picks different physical plans per scale, so warming at a tiny
    # SF leaves the real plans cold; standard JIT exclusion; disable
    # with SPARK_GRAFT_WARMUP=0).
    # 3 repeats by default: best-of-2 proved unable to reject sustained
    # co-located load (round-2 bench recorded 7x outliers on single
    # queries vs a quiet re-run). Repeats are interleaved ROUND-ROBIN
    # (pass 1 of every query, then pass 2, then pass 3) rather than
    # back-to-back per query: a multi-minute co-tenant burst then
    # poisons one *pass* — absorbed by the per-query min — instead of
    # landing on all three consecutive samples of whichever queries it
    # overlapped (which is exactly what convicted BENCH_r03). Best is
    # the headline (least noise-sensitive); the median is emitted
    # alongside so a noisy run is self-evident from best<<median.
    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)
    queries = dict(entry_mod.queries())
    # The round-12 registry rotation retired cohort_retention/arg_max
    # from the 50-slot oracle registry (the driver hard-verifies at
    # most 50 rows; 52 entries silently dropped the last two out of
    # the window). The bench contract is additive-only — entries are
    # never removed or renamed — so both stay TIMED here as
    # non-registry rows, with identical methodology, and stay
    # DuckDB-diff-tested in tests/test_retired_queries.py.
    queries.setdefault("cohort_retention", entry_mod.q_cohort_retention)
    queries.setdefault("arg_max", entry_mod.q_arg_max)
    # A/B isolation knobs (diagnosing session-churn effects): run only
    # a comma-separated subset, or everything but one. The composite is
    # then NOT comparable across rounds — for bisection, not headlines.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    skip = os.environ.get("SPARK_GRAFT_BENCH_SKIP")
    if only:
        keep = {s.strip() for s in only.split(",")}
        queries = {k: v for k, v in queries.items() if k in keep}
    if skip:
        drop = {s.strip() for s in skip.split(",")}
        queries = {k: v for k, v in queries.items() if k not in drop}

    do_warmup = os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0"
    if do_warmup:
        for name, fn in queries.items():
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
    samples: dict[str, list[float]] = {name: [] for name in queries}
    # one probe BEFORE each round-robin pass: the single bracketing
    # calibration can't see a mid-run co-tenant burst (round-11 sf1
    # refresh: pass medians 232s vs best 134s with clean bracketing
    # probes) — per-pass values make that burst visible in-band
    calib_per_pass: list[float] = []
    for _ in range(repeats):
        calib_per_pass.append(host_calibration(repeats=1))
        for name, fn in queries.items():
            # drop any persisted intermediates (e.g. the ngram shingle
            # relation) so every timed run pays its own materialization
            spark.catalog.clearCache()
            # label the jobs so a Spark UI / event-log reading of a
            # bench run maps stages back to queries (guide §1.5);
            # thread-local, cleared after the run, zero timing effect
            spark.sparkContext.setJobDescription(f"bench: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name, runs in samples.items():
        runs.sort()
        timings[name] = round(runs[0], 4)
        mid = len(runs) // 2
        med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        medians[name] = round(med, 4)

    # Isolated warm probes (round-7 verdict ask #9, first-class now):
    # in-bench samples run ~2x their isolated-warm cost because the
    # full-registry round-robin churns JVM/GC/code-cache state between
    # consecutive samples of the same query. Probe each query
    # back-to-back (its own state still hot from the pass above) and
    # keep the min — this is the number plan-work should be judged
    # against; best<<isolated in the same file flags co-tenant noise
    # without prose. Disable with SPARK_GRAFT_BENCH_ISOLATED=0.
    # Caveat at larger SF (round 11): these probes run AFTER the full
    # round-robin, so on big-memory runs an early query's isolated
    # sample can sit ABOVE its in-run best (populated GC regions /
    # code cache). Per-query intrinsic cost = min(best, isolated);
    # tools/compare_scales.py implements exactly that.
    isolated: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_ISOLATED", "1") != "0":
        for name, fn in queries.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench isolated: {name}")
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            isolated[name] = round(min(runs), 4)
            spark.sparkContext.setJobDescription(None)

    # calibration measured AFTER the timed passes (same host window as
    # the samples it normalizes; measuring before would still be fine,
    # but after avoids pre-warming the page cache the first queries use)
    calib = host_calibration()
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 4),
        "sf": sf,
        # host-speed denominator: cross-round composites should be
        # compared as value / host_calibration (round-10 finding:
        # ±24% day swings in the microVM's CPU delivery)
        "host_calibration": calib,
        # per-pass probes (before each round-robin pass): a pass whose
        # probe sits far above the others marks a mid-run burst — its
        # samples are absorbed by the per-query min, and the skew is
        # now visible in the artifact itself
        "host_calibration_per_pass": calib_per_pass,
    }
    if isolated:
        out["queries_isolated"] = isolated
        out["value_isolated"] = round(sum(isolated.values()), 4)
    line = json.dumps(out)
    print(line)
    # Belt-and-braces copy of the SAME line to a file: the round-10
    # bench JSON was lost to a 2000-char stdout-tail truncation (the
    # one-line JSON is ~4 KB at 52 queries), which voided the whole
    # round-over-round PERF comparison. Additive only — stdout stays
    # the contract; failures to write never fail the bench.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()

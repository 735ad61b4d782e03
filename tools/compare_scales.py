"""Per-query Spark/DuckDB ratio comparison across scale factors —
the round-11 analysis: at sf0.1 the ratio letter is saturated by
Spark's ~0.2-0.3s/query job-submission floor; at sf1 the floor
amortizes, so a query whose ratio GROWS from sf0.1 to sf1 has a real
plan defect (work growing faster than the comparator's), while a
query whose ratio collapses was only ever paying the floor.

Usage:
    python tools/compare_scales.py BENCH_small.json BASELINE_small.json \
        BENCH_big.json BASELINE_big.json [--md]

Spark times use queries_isolated when present (the plan's intrinsic
cost, free of round-robin JVM churn) and fall back to best-of-passes.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "tail" in d:  # driver wrapper format
        line = d["tail"][d["tail"].rindex('{"metric"'):] if '{"metric"' in d["tail"] else d["tail"]
        d = json.loads(line[: line.rindex("}") + 1])
    return d


def _spark_times(bench: dict) -> dict:
    """Per-query min across the best-of-passes and isolated records —
    the demonstrated intrinsic cost. (At sf1 the isolated probe runs
    AFTER the full round-robin and can sit above the in-run best on
    early queries: the 50-query sweep leaves the JVM with populated
    GC regions and code cache, so neither record dominates the other
    at every scale.)"""
    qs = dict(bench["queries"])
    for k, v in (bench.get("queries_isolated") or {}).items():
        if k in qs:
            qs[k] = min(qs[k], v)
    return qs


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    bs, os_, bb, ob = (_load(a) for a in args[:4])
    s_small, s_big = _spark_times(bs), _spark_times(bb)
    d_small, d_big = os_["queries"], ob["queries"]

    rows = []
    for q in sorted(s_big):
        if q not in d_big or q not in s_small or q not in d_small:
            continue
        r_small = s_small[q] / d_small[q] if d_small[q] > 0 else float("inf")
        r_big = s_big[q] / d_big[q] if d_big[q] > 0 else float("inf")
        rows.append((q, s_small[q], d_small[q], r_small,
                     s_big[q], d_big[q], r_big, r_big / r_small))
    rows.sort(key=lambda r: -r[7])

    sep = "|" if md else " "
    hdr = ["query", "spark_s", "duck_s", "ratio_s", "spark_b", "duck_b",
           "ratio_b", "ratio_change"]
    if md:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print(("%-24s" + "%10s" * 7) % tuple(hdr))
    grew, collapsed = [], []
    for q, ss, ds, rs, sb, db, rb, chg in rows:
        vals = (q, f"{ss:.3f}", f"{ds:.3f}", f"{rs:.1f}x",
                f"{sb:.3f}", f"{db:.3f}", f"{rb:.1f}x", f"{chg:.2f}")
        if md:
            print("| " + " | ".join(vals) + " |")
        else:
            print(("%-24s" + "%10s" * 7) % vals)
        if chg > 1.25 and rb > 1.0:
            grew.append(q)
        if rs > 2.0 and rb <= 2.0:
            collapsed.append(q)

    tot = lambda d: sum(d.values())  # noqa: E731
    print()
    print(f"composite small: spark {tot(s_small):.1f}s vs duckdb "
          f"{tot(d_small):.1f}s = {tot(s_small)/tot(d_small):.1f}x")
    print(f"composite big:   spark {tot(s_big):.1f}s vs duckdb "
          f"{tot(d_big):.1f}s = {tot(s_big)/tot(d_big):.1f}x")
    over2_small = sum(1 for r in rows if r[3] > 2)
    over2_big = sum(1 for r in rows if r[6] > 2)
    print(f">2x queries: {over2_small}/{len(rows)} small -> "
          f"{over2_big}/{len(rows)} big")
    print("ratio GREW >1.25x (plan suspects):", grew or "none")
    print("letter retired (was >2x, now <=2x):", len(collapsed), "queries")


if __name__ == "__main__":
    main()

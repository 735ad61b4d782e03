"""WARC source throughput: the zero-Python text-reader path vs the
mapInPandas decode kernel, and per-file parallelism.

Generates N gzip WARC shards of synthetic HTML response records, then
measures end-to-end ``reader → extract_documents → count`` for:

1. ``read_warc`` (JVM text scan + regex extraction — the fast path);
2. ``read_warc_binary`` (binaryFile + Arrow/Python kernel — the
   general-case path for encoded payloads), same shards;
3. the text path on ONE concatenated shard vs the N shards — gzip is
   per-file parallel, so this is the scan's parallelism knob at
   100 TB (Common Crawl ships ~100k files per crawl for this reason).

Usage: python tools/bench_warc.py [--shards 8] [--records 2500]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

from binancedatapipeline_spark.session import get_session  # noqa: E402
from binancedatapipeline_spark.textops.corpus_io import (  # noqa: E402
    extract_documents,
    read_warc,
    read_warc_binary,
)

_PARA = (
    "<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit %d, sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua.</p>"
)


def _record(shard: int, i: int) -> str:
    body = (
        f"<html><head><title>Doc {shard}-{i} &amp; co</title>"
        "<style>body{margin:0}</style><script>var x='<p>no</p>';</script>"
        "</head><body><h1>Heading</h1>"
        + "".join(_PARA % j for j in range(12))
        + "</body></html>"
    )
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: https://ex.com/{shard}/{i}\r\n"
        "WARC-Date: 2024-04-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{shard}-{i}>\r\n"
        "\r\n"
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + body
        + "\r\n\r\n"
    )


def gen_shards(root: Path, shards: int, records: int) -> tuple[str, str]:
    multi = root / "multi"
    single = root / "single"
    multi.mkdir(parents=True)
    single.mkdir(parents=True)
    whole = []
    for s in range(shards):
        blob = "".join(_record(s, i) for i in range(records))
        whole.append(blob)
        with gzip.open(multi / f"shard{s:03d}.warc.gz", "wb") as f:
            f.write(blob.encode())
    with gzip.open(single / "all.warc.gz", "wb") as f:
        f.write("".join(whole).encode())
    return str(multi), str(single)


def timed(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--records", type=int, default=2500)
    ap.add_argument("--tmp", default="/tmp/bench_warc")
    args = ap.parse_args()

    root = Path(args.tmp)
    if root.exists():
        import shutil

        shutil.rmtree(root)
    multi, single = gen_shards(root, args.shards, args.records)
    n_docs = args.shards * args.records

    spark = get_session(shuffle_partitions=32)
    res = {"shards": args.shards, "records_per_shard": args.records, "docs": n_docs}

    t, c = timed(lambda: extract_documents(read_warc(spark, multi)).count())
    assert c == n_docs, (c, n_docs)
    res["text_reader_sec"] = round(t, 3)
    res["text_docs_per_sec"] = round(n_docs / t)

    t, c = timed(lambda: extract_documents(read_warc_binary(spark, multi)).count())
    assert c == n_docs, (c, n_docs)
    res["binary_kernel_sec"] = round(t, 3)
    res["binary_docs_per_sec"] = round(n_docs / t)

    t, c = timed(lambda: extract_documents(read_warc(spark, single)).count())
    assert c == n_docs, (c, n_docs)
    res["text_single_file_sec"] = round(t, 3)
    res["file_parallel_speedup"] = round(
        res["text_single_file_sec"] / res["text_reader_sec"], 2
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()

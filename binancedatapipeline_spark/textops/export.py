"""Training-shard export: the last step of the corpus pipeline — hand
the curated corpus to a trainer as deterministic, ~equal shards with a
manifest.

Every placement decision is a PURE FUNCTION of (doc id, seed): shard
assignment is ``xxhash64(id, seed) mod n_shards`` and within-shard
order is an independent hash — re-running the export reproduces every
shard bit-for-bit (the property `repartitionByRange` alone cannot
give: its range boundaries come from per-run sampling), and bumping
``seed`` is an independent epoch permutation. Hash placement balances
shards to ±O(√(N/n)) rows — the trainer-facing guarantee is "all
shards within a few percent", not exact equality, which is what
hash-bucketed shard writers (WebDataset, TFRecord sharding) provide
too.

Scale shape: one pass to size the export (count + token sum), one
shuffle to co-locate each shard in one task (range partition on the
shard id — duplicate keys cannot split, so each shard lands whole in
exactly one task and writes exactly one file), one bounded groupBy
for the manifest. The corpus body never passes through the driver.

Manifest IO uses local ``os`` calls (atomic replace) — local disk /
NFS / POSIX-rename filesystems, the same contract the warehouse
documents; object stores want the manifest written through their own
conditional-put primitive.
"""

from __future__ import annotations

import json
import math
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int | None = None,
    tokens_per_shard: int | None = None,
    token_col: str | None = None,
    n_shards: int | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
    file_format: str = "parquet",
    compression: str | None = None,
) -> dict:
    """Write ``df`` as ``path/shard=K/*.parquet`` plus an atomic
    ``_MANIFEST.json``; returns the manifest dict.

    Exactly one sizing mode: ``n_shards`` directly, ``rows_per_shard``
    (shard count = ceil(rows / target)), or ``tokens_per_shard`` with
    ``token_col`` (shard count = ceil(token sum / target) — hash
    placement balances tokens in expectation, so a shard's token count
    tracks the target within sampling noise, the same guarantee as its
    row count).

    ``file_format``: ``"parquet"`` (default — full type fidelity) or
    ``"json"`` (JSON Lines, the shape line-oriented trainer loaders
    ingest directly; timestamps/binaries degrade to their JSON forms,
    so export the columns the trainer needs). ``compression`` passes
    through to the writer (e.g. ``"gzip"`` for ``.json.gz`` shards).

    Manifest: ``seed``, ``n_shards``, per-shard ``rows``/``tokens``/
    ``files`` (file names sorted — concatenating a shard's files in
    name order reproduces its deterministic within-shard order), and
    corpus totals. A trainer (or a resumed export) validates against
    it instead of trusting a directory listing."""
    modes = [n_shards is not None, rows_per_shard is not None,
             tokens_per_shard is not None]
    if sum(modes) != 1:
        raise ValueError(
            "write_training_shards: pass exactly one of n_shards, "
            "rows_per_shard, tokens_per_shard"
        )
    if tokens_per_shard is not None and token_col is None:
        raise ValueError("tokens_per_shard requires token_col")
    if "__shard" in df.columns:
        raise ValueError("write_training_shards: '__shard' column is reserved")
    if file_format not in ("parquet", "json"):
        raise ValueError(
            f"write_training_shards: file_format must be 'parquet' or "
            f"'json', got {file_format!r}"
        )

    aggs = [F.count(F.lit(1)).alias("rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("tokens"))
    totals = df.agg(*aggs).first()
    total_rows = totals["rows"]
    # sum() is NULL over an all-NULL column — count that as 0 tokens
    # (sizing then falls back to one shard) rather than crashing
    total_tokens = (
        int(totals["tokens"] or 0) if token_col is not None else None
    )
    if total_rows == 0:
        raise ValueError("write_training_shards: empty corpus")
    if n_shards is None:
        if rows_per_shard is not None:
            n_shards = math.ceil(total_rows / rows_per_shard)
        else:
            n_shards = math.ceil((total_tokens or 0) / tokens_per_shard) or 1
    n_shards = max(int(n_shards), 1)

    sid = F.col(id_col).cast("string")
    out = (
        df.withColumn(
            "__shard",
            F.pmod(F.xxhash64(sid, F.lit(seed)), F.lit(n_shards)).cast("int"),
        )
        # the ORDER hash is salted differently from the shard hash so
        # within-shard order is independent of the residue class
        .withColumn("__ord", F.xxhash64(sid, F.lit(seed + 1)))
    )
    writer = (
        # range-partition on the shard id alone: duplicate keys cannot
        # split across partitions, so each shard lands WHOLE in one
        # task → exactly one file per shard directory
        out.repartitionByRange(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__ord", id_col)
        .drop("__ord")
        .write.partitionBy("__shard")
        .mode("error")
        .format(file_format)
    )
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.save(path)

    stat_aggs = [F.count(F.lit(1)).alias("rows")]
    if token_col is not None:
        stat_aggs.append(F.sum(token_col).alias("tokens"))
    stats = {
        int(r["__shard"]): r
        for r in out.groupBy("__shard").agg(*stat_aggs).collect()
    }
    shards = []
    for k in range(n_shards):
        d = os.path.join(path, f"__shard={k}")
        files = sorted(
            f for f in (os.listdir(d) if os.path.isdir(d) else [])
            if not f.startswith((".", "_"))
        )
        row = stats.get(k)
        entry = {
            "shard": k,
            "rows": int(row["rows"]) if row is not None else 0,
            "files": files,
        }
        if token_col is not None:
            entry["tokens"] = (
                int(row["tokens"] or 0) if row is not None else 0
            )
        shards.append(entry)
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "id_col": id_col,
        "format": file_format,
        "total_rows": int(total_rows),
        "shards": shards,
    }
    if total_tokens is not None:
        manifest["total_tokens"] = total_tokens
    tmp = os.path.join(path, f".{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def read_training_shards(spark, path: str) -> DataFrame:
    """Read an export back (shard column included) and VALIDATE it
    against the manifest: total rows and per-shard file lists must
    match — a partially-deleted or hand-edited export fails loudly
    instead of silently training on a truncated corpus."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    df = spark.read.format(manifest.get("format", "parquet")).load(path)
    for entry in manifest["shards"]:
        d = os.path.join(path, f"__shard={entry['shard']}")
        files = sorted(
            f for f in (os.listdir(d) if os.path.isdir(d) else [])
            if not f.startswith((".", "_"))
        )
        if files != entry["files"]:
            raise ValueError(
                f"shard {entry['shard']}: files on disk {files} != "
                f"manifest {entry['files']}"
            )
    n = df.count()
    if n != manifest["total_rows"]:
        raise ValueError(
            f"export holds {n} rows, manifest says {manifest['total_rows']}"
        )
    return df

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

Manifest IO goes through the Hadoop FileSystem API resolved from the
export path (the same injected-FS seam the warehouse uses), so shards
AND manifest land wherever the path's scheme points — local disk,
HDFS, or an object store through its Hadoop connector (s3a/gs/abfs).
The manifest commit is the standard create-temp-then-rename protocol:
atomic on POSIX/HDFS; on object stores rename is copy+delete, which
is exactly the contract their Hadoop committers provide — a true
conditional-put belongs to the store's own primitive, and the
read-side validation below catches any torn manifest regardless.
"""

from __future__ import annotations

import json
import math
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def _fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path``'s scheme — the warehouse's
    `_hadoop_fs` seam (warehouse.py) replicated for the export, so
    manifest reads/writes/listings work on any Hadoop-supported store,
    not just POSIX."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _list_shard_files(spark: SparkSession, path: str, k: int) -> list[str]:
    fs, _ = _fs(spark, path)
    d = spark._jvm.org.apache.hadoop.fs.Path(path, f"__shard={k}")
    if not fs.exists(d) or not fs.getFileStatus(d).isDirectory():
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(d)
        if not st.getPath().getName().startswith((".", "_"))
    )


def _write_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    fs, _ = _fs(spark, path)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(
        path, f".{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}"
    )
    dst = jvm.org.apache.hadoop.fs.Path(path, MANIFEST)
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        stream.close()
    # rename-over-existing is not portable: clear the target first
    # (fresh exports never hit this branch — mode("error") guarantees
    # the directory was empty when the write started)
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"write_training_shards: manifest rename failed: {dst}")


def _read_manifest(spark: SparkSession, path: str) -> dict:
    fs, _ = _fs(spark, path)
    src = spark._jvm.org.apache.hadoop.fs.Path(path, MANIFEST)
    stream = fs.open(src)
    try:
        # py4j copies a Python bytearray into a fresh Java byte[], so
        # read(buf) mutations never come back — drain through
        # commons-io (a Hadoop dependency) which returns byte[] whole
        data = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


class InMemoryConditionalStore:
    """In-repo fake of an object store exposing the conditional-put
    primitive (S3 ``PUT`` + ``If-None-Match: *``, GCS
    ``ifGenerationMatch=0``, Azure ``If-None-Match: *``): create the
    key atomically ONLY if it does not exist. Exists so the
    ``manifest_writer`` seam is tested against the real protocol
    (reject-on-existing), not a stub that always succeeds — swap a
    boto3/google-cloud client with the same one method for a real
    deployment."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.put_attempts: int = 0

    def put_if_none_match(self, key: str, data: bytes) -> bool:
        """Atomic create-if-absent. False = precondition failed (the
        key already exists — the store's 412), never an overwrite."""
        self.put_attempts += 1
        if key in self.objects:
            return False
        self.objects[key] = bytes(data)
        return True

    def get(self, key: str) -> bytes | None:
        return self.objects.get(key)


def conditional_put_manifest_writer(store, key_for_path=None):
    """Reference ``manifest_writer`` for stores with a conditional-put
    primitive — the commit is ONE atomic create of the manifest key,
    so two concurrent exporters of the same path cannot both win and
    a reader can never observe a torn manifest (the two guarantees
    rename-as-commit only approximates on object stores).

    ``store`` needs one method: ``put_if_none_match(key, bytes) ->
    bool`` (False when the key exists — S3 If-None-Match / GCS
    generation-0 semantics; :class:`InMemoryConditionalStore` is the
    in-repo fake). ``key_for_path`` maps the export path to the
    manifest key (default: ``<path>/_MANIFEST.json``).

    Crash-window semantics, all tested in tests/test_export.py:

    * crash BEFORE the put (or the put itself fails): no manifest
      exists — the export is invisible to readers (read-side
      validation requires the manifest), and the retry that re-runs
      the whole export commits normally.
    * crash AFTER the put, before the caller observed success, where
      the retry re-puts the SAME bytes (the manifest dict survived in
      memory, or a deterministic pipeline reproduced it exactly): the
      precondition fails, the content comparison recognizes the
      writer's own earlier commit, and the retry returns success
      (idempotent replay).
    * a manifest with DIFFERENT bytes at the key raises — never a
      silent overwrite. NOTE this includes a retry that RE-RAN
      ``write_training_shards`` after a post-commit crash: the
      manifest embeds Spark part-file NAMES (task UUIDs differ per
      attempt), so re-written bytes never match the committed ones
      even when the corpus is identical. A full re-run after a
      post-commit crash is therefore NOT a supported replay — the
      first commit already won, and the raise says so: when the
      committed manifest agrees with the retry on every
      content-stable field (seed, shard count, per-shard rows/tokens)
      the error message identifies it as an earlier commit of the
      same export and points at ``read_training_shards`` for
      verification; genuinely different content (another exporter, a
      reused path) raises the plain conflict.

    The serialization is canonical (sorted keys) so byte equality is
    content equality across replays."""

    def write(path: str, manifest: dict) -> None:
        key = (
            key_for_path(path)
            if key_for_path is not None
            else f"{path.rstrip('/')}/{MANIFEST}"
        )
        data = json.dumps(manifest, sort_keys=True).encode("utf-8")
        if store.put_if_none_match(key, data):
            return
        existing = store.get(key)
        if existing == data:
            return  # our own earlier commit — idempotent replay
        if _stable_manifest_fields(existing) == _stable_manifest_fields(data):
            # same seed/shards/rows/tokens, different file names: an
            # earlier attempt of THIS export already committed and a
            # re-run re-wrote the data under fresh task UUIDs. The
            # COMMITTED manifest stays authoritative (returning
            # success here would bless a manifest whose file lists no
            # longer match the re-written directory) — fail loudly
            # with the recovery route.
            raise FileExistsError(
                f"write_training_shards: {key} already holds a manifest "
                f"for this same export (identical seed/shard/row/token "
                f"content; only file names differ — a post-commit retry "
                f"re-ran the writer). The first commit is authoritative; "
                f"do not re-run the export against this path — verify it "
                f"with read_training_shards instead"
            )
        raise FileExistsError(
            f"write_training_shards: a DIFFERENT manifest is already "
            f"committed at {key}; refusing to overwrite"
        )

    return write


def _stable_manifest_fields(data: bytes | None):
    """Content-stable projection of a serialized manifest — everything
    that identifies WHAT was exported (seed, sizing, per-shard
    rows/tokens, totals) minus the per-attempt artifacts (part-file
    names, which embed Spark task UUIDs). Two attempts of the same
    export agree on this projection and on nothing finer."""
    if data is None:
        return None
    try:
        m = json.loads(data)
    except ValueError:
        return ("unparseable", data)
    shards = [
        {k: v for k, v in e.items() if k != "files"}
        for e in m.get("shards", [])
    ]
    return {**{k: v for k, v in m.items() if k != "shards"}, "shards": shards}


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
    hash_method: str = "xxhash64",
    manifest_writer=None,
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
    it instead of trusting a directory listing.

    ``hash_method``: ``"xxhash64"`` (default — Spark's native 64-bit
    hash) or ``"md5"`` (first 56 bits of ``md5(id · NUL · seed)``,
    the same engine-portable family as sampling.hash_bucket /
    dedup._hash56) for placement and order. Both are pure functions
    of (id, seed); md5 exists so ANY SQL engine can reproduce shard
    assignment and within-shard order bit-identically (the DuckDB
    differential in tests/test_export.py) at ~equal cost — placement
    hashing is never the export's bottleneck.

    ``manifest_writer``: optional ``callable(path, manifest_dict)``
    that replaces the default create-temp-then-rename commit — the
    injection point for a store's own conditional-put primitive
    (S3 If-None-Match, GCS generation preconditions) when
    rename-as-commit is not strong enough for the deployment;
    :func:`conditional_put_manifest_writer` is the reference
    implementation of that protocol (idempotent replay, loud
    conflict). The default stays correct on POSIX/HDFS and on object
    stores whose Hadoop committers emulate rename."""
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
    if hash_method == "xxhash64":
        shard_h = F.xxhash64(sid, F.lit(seed))
        ord_h = F.xxhash64(sid, F.lit(seed + 1))
    elif hash_method == "md5":
        def h56(salt: int) -> F.Column:
            return F.conv(
                F.substring(
                    F.md5(
                        F.concat(sid, F.lit("\x00"), F.lit(str(salt)))
                        .cast("binary")
                    ),
                    1,
                    14,
                ),
                16,
                10,
            ).cast("bigint")

        shard_h = h56(seed)
        ord_h = h56(seed + 1)
    else:
        raise ValueError(
            f"write_training_shards: hash_method must be 'xxhash64' or "
            f"'md5', got {hash_method!r}"
        )
    out = (
        df.withColumn(
            "__shard", F.pmod(shard_h, F.lit(n_shards)).cast("int")
        )
        # the ORDER hash is salted differently from the shard hash so
        # within-shard order is independent of the residue class
        .withColumn("__ord", ord_h)
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

    # per-shard stats come from the WRITTEN output, not from
    # re-evaluating `out`'s lineage: a nondeterministic upstream
    # (rand, limit, unstable sampling) would make a recomputed stats
    # job disagree with the files on disk, and read_training_shards
    # would then reject a perfectly valid export. Reading back costs
    # one aggregate over what was just written — column-pruned to the
    # token column for parquet shards (cheap), a full decompress+parse
    # pass for JSON shards (the price of a manifest that describes the
    # export by construction).
    spark = df.sparkSession
    # pin the declared schema instead of inferring: JSON shards OMIT
    # null keys, so an all-null token column would vanish from an
    # inferred schema and crash the stats aggregate (types also stay
    # exactly the writer's). `__shard` resolves from the directory
    # names as the partition column.
    written = (
        spark.read.format(file_format)
        .schema(out.drop("__ord").schema)
        .load(path)
    )
    stat_aggs = [F.count(F.lit(1)).alias("rows")]
    if token_col is not None:
        stat_aggs.append(F.sum(token_col).alias("tokens"))
    stats = {
        int(r["__shard"]): r
        for r in written.groupBy("__shard").agg(*stat_aggs).collect()
    }
    written_rows = sum(int(r["rows"]) for r in stats.values())
    shards = []
    for k in range(n_shards):
        files = _list_shard_files(spark, path, k)
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
        "hash": hash_method,
        "total_rows": int(written_rows),
        "shards": shards,
    }
    if token_col is not None:
        # totals also describe the WRITTEN export (same rationale as
        # written_rows), not the pre-write sizing pass
        manifest["total_tokens"] = sum(e["tokens"] for e in shards)
    if manifest_writer is not None:
        manifest_writer(path, manifest)
    else:
        _write_manifest(spark, path, manifest)
    return manifest


def read_training_shards(spark, path: str) -> DataFrame:
    """Read an export back (shard column included) and VALIDATE it
    against the manifest: per-shard file lists, PER-SHARD row counts,
    and the total must all match — a partially-deleted, hand-edited,
    or same-file-set-corrupted export fails loudly instead of
    silently training on a truncated corpus. All storage access goes
    through the Hadoop FS seam, so the same call validates a local,
    HDFS, or object-store export."""
    manifest = _read_manifest(spark, path)
    df = spark.read.format(manifest.get("format", "parquet")).load(path)
    for entry in manifest["shards"]:
        files = _list_shard_files(spark, path, entry["shard"])
        if files != entry["files"]:
            raise ValueError(
                f"shard {entry['shard']}: files on disk {files} != "
                f"manifest {entry['files']}"
            )
    counts = {
        int(r["__shard"]): int(r["n"])
        for r in df.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for entry in manifest["shards"]:
        got = counts.get(int(entry["shard"]), 0)
        if got != entry["rows"]:
            raise ValueError(
                f"shard {entry['shard']} holds {got} rows, manifest "
                f"says {entry['rows']}"
            )
    n = sum(counts.values())
    if n != manifest["total_rows"]:
        raise ValueError(
            f"export holds {n} rows, manifest says {manifest['total_rows']}"
        )
    return df

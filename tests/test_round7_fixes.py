"""Round-7 warehouse hardening (ADVICE r6): the stale-plan-replay
commit guard, vacuum(full) after a crash mid-publish, and the writer
lease heartbeat."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark import catalog
from binancedatapipeline_spark.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _klines(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")


def test_stale_plan_replay_cannot_regress_manifest(spark, wh, fixture_dir):
    """A stalled replayer holding an OLD committed plan (opened before
    the winning publisher executed it and moved on) must not regress
    the manifest — and, critically, must not vacuum the NEWER commit's
    data files (committed-data loss, ADVICE r6 high)."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)

    wh.overwrite(spec, src.withColumn("close", F.lit(1.0)))
    m1 = wh._load_manifest(spec.name)
    wh.overwrite(spec, src.withColumn("close", F.lit(2.0)))
    m2 = wh._load_manifest(spec.name)
    assert (m2["fence"], m2["version"]) > (m1["fence"], m1["version"])

    # plant the stale replay: a committed plan carrying m1, published
    # AFTER m2 is live (what the stalled reader-side recover would do)
    stage = wh._new_stage(spec.name)
    wh._write_plan(stage, {"moves": [], "manifest": m1, "prev_manifest": None})
    wh._publish(spec.name, stage)

    live = wh._load_manifest(spec.name)
    assert live["version"] == m2["version"]  # no regression
    assert not os.path.isdir(stage)  # stale stage still cleaned up
    out = wh.read(spec)
    assert out.count() == src.count()
    assert out.filter(F.col("close") == 2.0).count() == src.count()


def test_vacuum_full_keeps_pending_plan_files(spark, wh, fixture_dir):
    """vacuum(full=True) must never delete files a committed-but-
    unpublished plan references: after a crash mid-publish some of the
    plan's files are already moved into the table dir and are
    referenced ONLY by the plan (ADVICE r6 medium)."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)

    batch = src.filter(
        F.to_date("timestamp").isin("2024-01-15", "2024-01-16")
    ).withColumn("close", F.lit(-5.0))

    calls = {"n": 0}
    orig = type(wh)._rename

    def crashing(src_p, dst_p):
        if calls["n"] >= 1:
            raise RuntimeError("injected crash mid-publish")
        calls["n"] += 1
        orig(wh, src_p, dst_p)

    wh._rename = crashing
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.upsert(spec, batch)
    del wh.__dict__["_rename"]

    base = wh.path(spec.name)
    moved = {
        os.path.relpath(os.path.join(d, f), base)
        for d, _, fs in os.walk(base)
        for f in fs
        if not f.startswith((".", "_"))
    }
    # the internal GC (no recover) with full=True must keep every file
    # the pending plan moved in, even though no manifest lists it yet
    wh._vacuum_unreferenced(spec.name, full=True)
    still = {
        os.path.relpath(os.path.join(d, f), base)
        for d, _, fs in os.walk(base)
        for f in fs
        if not f.startswith((".", "_"))
    }
    assert moved <= still

    # the PUBLIC vacuum rolls the plan forward first — afterwards the
    # table reads complete, upsert included
    wh.vacuum(spec.name, full=True)
    out = wh.read(spec)
    assert out.count() == src.count()
    assert out.filter(F.col("close") == -5.0).count() == batch.count()


def test_lease_heartbeat_prevents_steal_of_live_writer(spark, tmp_path):
    """A writer alive PAST its lease TTL keeps the lock fresh via the
    heartbeat thread, so a contender sees a live lease and refuses —
    the long-maintain lost-update scenario (ADVICE r6 low). A crashed
    writer (no heartbeat) still ages out and is stolen."""
    from binancedatapipeline_spark.warehouse import ConcurrentWriterError

    root = str(tmp_path / "wh")
    holder = Warehouse(spark, root, lease_ttl=1.0)
    contender = Warehouse(spark, root, lease_ttl=1.0)
    with holder._writer_lock("t"):
        time.sleep(2.5)  # > 2 TTLs: without the heartbeat this is stale
        with pytest.raises(ConcurrentWriterError, match="locked by writer"):
            with contender._writer_lock("t"):
                pass
    # released: the contender acquires immediately
    with contender._writer_lock("t") as fence:
        assert fence > 0

"""Cross-table atomic publish (round 7): all-or-nothing multi-table
transactions over the per-table WAP protocol."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark import catalog
from binancedatapipeline_spark.warehouse import ConcurrentWriterError, Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _tables(spark, fixture_dir):
    kl = spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")
    sym = spark.read.parquet(f"{fixture_dir}/bn_spot_symbols.parquet")
    return kl, sym


def _staging_txs(wh, name):
    sroot = wh._staging_root(name)
    return sorted(os.listdir(sroot)) if os.path.isdir(sroot) else []


def test_transaction_commits_both_tables_atomically(spark, wh, fixture_dir):
    kl, sym = _tables(spark, fixture_dir)
    k_spec, s_spec = catalog.BN_SPOT_KLINES, catalog.BN_SPOT_SYMBOLS
    wh.overwrite(k_spec, kl)
    wh.overwrite(s_spec, sym)

    with wh.transaction() as tx:
        tx.upsert(k_spec, kl.limit(60).withColumn("close", F.lit(-9.0)))
        tx.overwrite(s_spec, sym.limit(3))
        # nothing is visible while the transaction is open
        assert wh.read(k_spec).filter(F.col("close") == -9.0).count() == 0
        assert wh.read(s_spec).count() == sym.count()

    assert wh.read(k_spec).filter(F.col("close") == -9.0).count() == 60
    assert wh.read(s_spec).count() == 3
    assert _staging_txs(wh, k_spec.name) == []
    assert _staging_txs(wh, s_spec.name) == []
    assert os.listdir(wh._txlog_dir()) == []  # record cleaned after publish


def test_transaction_exception_rolls_back_everything(spark, wh, fixture_dir):
    kl, sym = _tables(spark, fixture_dir)
    k_spec, s_spec = catalog.BN_SPOT_KLINES, catalog.BN_SPOT_SYMBOLS
    wh.overwrite(k_spec, kl)
    wh.overwrite(s_spec, sym)

    with pytest.raises(RuntimeError, match="boom"):
        with wh.transaction() as tx:
            tx.upsert(k_spec, kl.limit(60).withColumn("close", F.lit(-9.0)))
            tx.overwrite(s_spec, sym.limit(3))
            raise RuntimeError("boom")

    assert wh.read(k_spec).filter(F.col("close") == -9.0).count() == 0
    assert wh.read(s_spec).count() == sym.count()
    assert _staging_txs(wh, k_spec.name) == []
    assert _staging_txs(wh, s_spec.name) == []
    # the warehouse is not stuck in a transaction
    wh.upsert(k_spec, kl.limit(5).withColumn("close", F.lit(7.0)))
    assert wh.read(k_spec).filter(F.col("close") == 7.0).count() == 5


def test_crash_before_commit_record_leaves_nothing_visible(
    spark, wh, fixture_dir
):
    """Process death after staging but before the group commit record:
    no member may ever become visible; the next writer-side mutation
    sweeps the aborted stages."""
    kl, sym = _tables(spark, fixture_dir)
    k_spec, s_spec = catalog.BN_SPOT_KLINES, catalog.BN_SPOT_SYMBOLS
    wh.overwrite(k_spec, kl)
    wh.overwrite(s_spec, sym)

    orig = type(wh)._write_json_atomic

    def crashing(path, payload):
        if "_txlog" in path:
            raise RuntimeError("crash at commit point")
        orig(wh, path, payload)

    wh._write_json_atomic = crashing
    with pytest.raises(RuntimeError, match="crash at commit point"):
        with wh.transaction() as tx:
            tx.upsert(k_spec, kl.limit(60).withColumn("close", F.lit(-9.0)))
            tx.overwrite(s_spec, sym.limit(3))
    del wh.__dict__["_write_json_atomic"]

    # reads never surface the aborted group (reader-side recover skips)
    assert wh.read(k_spec).filter(F.col("close") == -9.0).count() == 0
    assert wh.read(s_spec).count() == sym.count()
    # the next mutation's writer-side recover sweeps the stages
    wh.upsert(k_spec, kl.limit(1))
    assert _staging_txs(wh, k_spec.name) == []
    assert wh.read(s_spec).count() == sym.count()


def test_crash_after_commit_record_rolls_both_forward(spark, wh, fixture_dir):
    """Process death between the commit record and the member
    publishes: every member rolls FORWARD on the next read of its
    table — the group is all-or-nothing on disk."""
    kl, sym = _tables(spark, fixture_dir)
    k_spec, s_spec = catalog.BN_SPOT_KLINES, catalog.BN_SPOT_SYMBOLS
    wh.overwrite(k_spec, kl)
    wh.overwrite(s_spec, sym)

    def crashing(name, stage):
        raise RuntimeError("crash mid-group-publish")

    wh._publish = crashing
    with pytest.raises(RuntimeError, match="crash mid-group-publish"):
        with wh.transaction() as tx:
            tx.upsert(k_spec, kl.limit(60).withColumn("close", F.lit(-9.0)))
            tx.overwrite(s_spec, sym.limit(3))
    del wh.__dict__["_publish"]
    assert len(os.listdir(wh._txlog_dir())) == 1  # record survived the crash

    # each table self-heals on first read
    assert wh.read(k_spec).filter(F.col("close") == -9.0).count() == 60
    assert wh.read(s_spec).count() == 3
    # vacuum GCs the record once every member stage is gone
    wh.vacuum(k_spec.name)
    assert os.listdir(wh._txlog_dir()) == []


def test_one_mutation_per_table_per_transaction(spark, wh, fixture_dir):
    kl, _ = _tables(spark, fixture_dir)
    k_spec = catalog.BN_SPOT_KLINES
    wh.overwrite(k_spec, kl)
    with pytest.raises(ValueError, match="already mutated"):
        with wh.transaction() as tx:
            tx.upsert(k_spec, kl.limit(5))
            tx.upsert(k_spec, kl.limit(5))
    # and the failed transaction rolled back cleanly
    assert wh.read(k_spec).count() == kl.count()


def test_concurrent_writer_blocked_while_transaction_holds_lease(
    spark, wh, fixture_dir
):
    kl, _ = _tables(spark, fixture_dir)
    k_spec = catalog.BN_SPOT_KLINES
    wh.overwrite(k_spec, kl)
    other = Warehouse(spark, wh.root)
    with wh.transaction() as tx:
        tx.upsert(k_spec, kl.limit(5).withColumn("close", F.lit(1.0)))
        with pytest.raises(ConcurrentWriterError):
            other.upsert(k_spec, kl.limit(5))
    # released after commit
    other.upsert(k_spec, kl.limit(5).withColumn("close", F.lit(2.0)))
    assert wh.read(k_spec).filter(F.col("close") == 2.0).count() == 5


def test_txn_crash_point_sweep_all_or_nothing(spark, tmp_path, fixture_dir):
    """Exhaustive crash-point sweep over the TRANSACTION commit
    sequence (the single-table sweep's discipline, lifted to groups):
    kill the writer at every boundary — the _txlog record write, every
    member file move, every manifest write — recover, and assert the
    pair of tables is EITHER fully old or fully new, matching whether
    the commit record landed. No crash point may yield a mixed state."""
    k_spec, s_spec = catalog.BN_SPOT_KLINES, catalog.BN_SPOT_SYMBOLS
    kl = spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")
    sym = spark.read.parquet(f"{fixture_dir}/bn_spot_symbols.parquet")
    batch = kl.filter(
        F.to_date("timestamp").isin("2024-01-15", "2024-01-16")
    ).withColumn("close", F.lit(-9.0))

    def outcome(w):
        k = w.read(k_spec)
        return (
            k.count(),
            k.filter(F.col("close") == -9.0).count(),
            w.read(s_spec).count(),
        )

    def run_txn(w):
        with w.transaction() as tx:
            tx.upsert(k_spec, batch)
            tx.overwrite(s_spec, sym.limit(3))

    # the two consistent outcomes
    ref = Warehouse(spark, str(tmp_path / "ref"))
    ref.overwrite(k_spec, kl)
    ref.overwrite(s_spec, sym)
    OLD = outcome(ref)
    run_txn(ref)
    NEW = outcome(ref)
    assert OLD != NEW and NEW[1] == batch.count()

    orig_rename = type(ref)._rename
    orig_json = type(ref)._write_json_atomic

    def instrument(w, counter, crash_at):
        def c_rename(src_p, dst_p):
            if counter["n"] >= crash_at:
                raise RuntimeError(f"crash at op {crash_at}")
            counter["n"] += 1
            orig_rename(w, src_p, dst_p)

        def c_json(path, payload):
            base = os.path.basename(path)
            if base.startswith("_MANIFEST") or "_txlog" in path:
                if counter["n"] >= crash_at:
                    raise RuntimeError(f"crash at op {crash_at}")
                counter["n"] += 1
            orig_json(w, path, payload)

        w._rename = c_rename
        w._write_json_atomic = c_json

    # count commit-sequence ops on a clean run
    probe = Warehouse(spark, str(tmp_path / "probe"))
    probe.overwrite(k_spec, kl)
    probe.overwrite(s_spec, sym)
    counter = {"n": 0}
    instrument(probe, counter, 10**9)
    run_txn(probe)
    del probe.__dict__["_rename"], probe.__dict__["_write_json_atomic"]
    n_ops = counter["n"]
    assert n_ops >= 6  # record + per-member moves & manifests

    for crash_at in range(n_ops + 1):
        w = Warehouse(spark, str(tmp_path / f"sweep{crash_at}"))
        w.overwrite(k_spec, kl)
        w.overwrite(s_spec, sym)
        counter = {"n": 0}
        instrument(w, counter, crash_at)
        if crash_at < n_ops:
            with pytest.raises(RuntimeError, match=f"crash at op {crash_at}"):
                run_txn(w)
        else:
            run_txn(w)
        del w.__dict__["_rename"], w.__dict__["_write_json_atomic"]
        committed = bool(os.listdir(w._txlog_dir())) or crash_at >= n_ops
        w.recover(k_spec.name)
        w.recover(s_spec.name)
        got = outcome(w)
        want = NEW if committed else OLD
        assert got == want, (
            f"crash at op {crash_at}: got {got}, want {want} "
            f"(committed={committed})"
        )
        assert _staging_txs(w, k_spec.name) == []
        assert _staging_txs(w, s_spec.name) == []
        w.vacuum(k_spec.name)
        assert os.listdir(w._txlog_dir()) == []


def test_lease_steal_during_live_txn_aborts_whole_group(
    spark, tmp_path, fixture_dir
):
    """A writer suspended past its TTL whose member stage is swept by
    a thief must NOT commit the surviving members (partial group) —
    the pre-record verification aborts the whole transaction with
    FencedWriterError and nothing becomes visible."""
    from binancedatapipeline_spark.warehouse import FencedWriterError

    k_spec, s_spec = catalog.BN_SPOT_KLINES, catalog.BN_SPOT_SYMBOLS
    kl = spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")
    sym = spark.read.parquet(f"{fixture_dir}/bn_spot_symbols.parquet")
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root, lease_ttl=900)
    thief = Warehouse(spark, root, lease_ttl=0.0)
    wh.overwrite(k_spec, kl)
    wh.overwrite(s_spec, sym)

    with pytest.raises(FencedWriterError, match="aborted|superseded"):
        with wh.transaction() as tx:
            tx.upsert(k_spec, kl.limit(60).withColumn("close", F.lit(-9.0)))
            tx.overwrite(s_spec, sym.limit(3))
            # the suspended-writer scenario: a thief steals K's lease,
            # its recover sweeps the uncommitted group stage, and it
            # commits its own mutation
            thief.upsert(k_spec, kl.limit(5).withColumn("close", F.lit(5.0)))

    out_k = wh.read(k_spec)
    assert out_k.filter(F.col("close") == -9.0).count() == 0  # member aborted
    assert out_k.filter(F.col("close") == 5.0).count() == 5  # thief's commit
    assert wh.read(s_spec).count() == sym.count()  # other member NOT published
    assert os.listdir(wh._txlog_dir()) == []  # no record ever written
    assert _staging_txs(wh, s_spec.name) == []

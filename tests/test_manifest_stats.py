"""Manifest file-level min/max stats: the data-skipping layer.

Round 6: every commit records per-file bounds of the spec's time
column into the manifest (new files from their staged footers,
retained files carried forward), so

- ``Warehouse.latest_timestamp`` answers the incremental watermark
  from the manifest alone — ZERO Spark jobs (reference parity: the
  ClickHouse ``SELECT MAX`` was a metadata-speed lookup);
- ``Warehouse.read_between`` prunes the file listing driver-side on
  the raw timestamp — which Hive partition pruning cannot do (the
  partition column is the derived ``ds``).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark import catalog
from binancedatapipeline_spark.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _klines(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")


def _manifest(wh, name):
    m = wh._load_manifest(name)
    assert m is not None
    return m


def _live_rels(manifest):
    return [r for rels in manifest["files"].values() for r in rels]


def test_overwrite_records_complete_stats(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    m = _manifest(wh, spec.name)
    assert m["stats_column"] == spec.time_column
    rels = _live_rels(m)
    assert rels and all(r in m["stats"] for r in rels)
    # the recorded global bounds equal what a scan computes
    lo = min(datetime.fromisoformat(m["stats"][r]["min"]) for r in rels)
    hi = max(datetime.fromisoformat(m["stats"][r]["max"]) for r in rels)
    row = src.agg(
        F.min(spec.time_column).alias("lo"), F.max(spec.time_column).alias("hi")
    ).first()
    assert (lo, hi) == (row["lo"], row["hi"])


def test_upsert_carries_untouched_stats_forward(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    before = _manifest(wh, spec.name)["stats"]
    # touch only the last day's partition
    last_day = src.agg(F.max(F.to_date(spec.time_column))).first()[0]
    batch = src.filter(F.to_date(spec.time_column) == F.lit(last_day)).withColumn(
        "close", F.lit(1.25)
    )
    assert batch.count() > 0
    wh.upsert(spec, batch)
    m = _manifest(wh, spec.name)
    rels = _live_rels(m)
    assert rels and all(r in m["stats"] for r in rels)
    untouched = [
        r
        for ds, rs in m["files"].items()
        if ds != last_day.isoformat()
        for r in rs
    ]
    assert untouched
    for r in untouched:  # carried forward verbatim, not recomputed
        assert m["stats"][r] == before[r]


def test_latest_timestamp_answers_from_manifest_without_a_scan(
    spark, wh, fixture_dir, monkeypatch
):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    expected = src.agg(F.max(spec.time_column)).first()[0]

    def _no_scan(*a, **k):  # any Spark read means the fast path failed
        raise AssertionError("latest_timestamp fell back to a scan")

    monkeypatch.setattr(wh, "_read_live", _no_scan)
    assert wh.latest_timestamp(spec) == expected


def test_latest_timestamp_falls_back_when_stats_incomplete(
    spark, wh, fixture_dir
):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    expected = src.agg(F.max(spec.time_column)).first()[0]
    # simulate legacy data: strip one file's stats entry
    m = _manifest(wh, spec.name)
    dropped = _live_rels(m)[0]
    del m["stats"][dropped]
    wh._write_json_atomic(wh._manifest_path(spec.name), m)
    assert wh.latest_timestamp(spec) == expected  # scan fallback, same answer


def test_read_between_prunes_files_and_stays_exact(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    m = _manifest(wh, spec.name)
    total_files = len(_live_rels(m))
    assert total_files > 2  # multi-day fixture → multiple ds partitions
    since = src.agg(F.max(spec.time_column)).first()[0].replace(
        hour=0, minute=0, second=0, microsecond=0
    )
    out = wh.read_between(spec, since=since)
    expected = wh.read(spec).filter(F.col(spec.time_column) >= F.lit(since))
    assert out.count() == expected.count() > 0
    assert sorted(r["timestamp"] for r in out.select("timestamp").collect()) == sorted(
        r["timestamp"] for r in expected.select("timestamp").collect()
    )
    # the pruning actually happened: strictly fewer files in the scan
    assert 0 < len(out.inputFiles()) < total_files


def test_read_between_window_and_no_bounds(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    lo = src.agg(F.min(spec.time_column)).first()[0]
    hi = src.agg(F.max(spec.time_column)).first()[0]
    mid_lo = lo + (hi - lo) / 3
    mid_hi = lo + 2 * (hi - lo) / 3
    out = wh.read_between(spec, since=mid_lo, until=mid_hi)
    expected = src.filter(F.col(spec.time_column).between(mid_lo, mid_hi))
    assert out.count() == expected.count() > 0
    # no bounds → plain snapshot read
    assert wh.read_between(spec).count() == src.count()
    # disjoint window → empty, schema intact
    empty = wh.read_between(spec, since=hi.replace(year=hi.year + 1))
    assert empty.count() == 0
    assert empty.columns == spec.columns


def test_read_between_legacy_table_unpruned_but_correct(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    # legacy layout: raw parquet, no manifest
    wh._with_ds(spec, spec.align(src)).write.partitionBy("ds").parquet(
        wh.path(spec.name)
    )
    assert wh._load_manifest(spec.name) is None
    since = src.agg(F.max(spec.time_column)).first()[0].replace(hour=0, minute=0)
    out = wh.read_between(spec, since=since)
    expected = src.filter(F.col(spec.time_column) >= F.lit(since))
    assert out.count() == expected.count() > 0


def test_stats_recomputed_after_maintain(spark, wh, fixture_dir):
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    # fragment one partition: a many-task upsert (forced via
    # maxRecordsPerFile; AQE coalesces this tiny fixture otherwise)
    last_day = src.agg(F.max(F.to_date(spec.time_column))).first()[0]
    day = src.filter(F.to_date(spec.time_column) == F.lit(last_day))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "80")
    try:
        wh.upsert(spec, day.withColumn("close", F.lit(2.5)))
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    res = wh.maintain(spec, max_files_per_partition=2)
    assert res["partitions_compacted"] >= 1
    m = _manifest(wh, spec.name)
    rels = _live_rels(m)
    assert rels and all(r in m["stats"] for r in rels)
    expected = src.agg(F.max(spec.time_column)).first()[0]
    assert wh.latest_timestamp(spec) == expected


def test_no_time_column_means_no_stats_and_read_between_raises(spark, wh):
    spec = catalog.BN_SPOT_SYMBOLS
    assert spec.time_column is None
    wh.overwrite(spec, spec.empty(spark))
    m = _manifest(wh, spec.name)
    assert "stats_column" not in m
    with pytest.raises(ValueError, match="no time column"):
        wh.read_between(spec, since=datetime(2024, 1, 1))


def test_read_between_accepts_plain_dates(spark, wh, fixture_dir):
    from datetime import date as _date

    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    wh.overwrite(spec, src)
    d = src.agg(F.max(F.to_date(spec.time_column))).first()[0]
    assert isinstance(d, _date)
    out = wh.read_between(spec, since=d, until=d)
    expected = src.filter(F.to_date(spec.time_column) == F.lit(d))
    assert out.count() == expected.count() > 0


def test_int96_writer_degrades_gracefully(spark, wh, fixture_dir):
    """A writer running WITHOUT the session's TIMESTAMP_MICROS config
    (vanilla INT96 — no footer stats for timestamps) must still
    commit correctly: the manifest simply records no bounds for those
    files, the watermark falls back to the scan, and read_between
    includes them unpruned. No wrong answers, only less pruning."""
    spec = catalog.BN_SPOT_KLINES
    src = _klines(spark, fixture_dir)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        wh.overwrite(spec, src)
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    m = _manifest(wh, spec.name)
    rels = _live_rels(m)
    assert rels and all(r not in m.get("stats", {}) for r in rels)
    expected = src.agg(F.max(spec.time_column)).first()[0]
    assert wh.latest_timestamp(spec) == expected  # scan fallback
    since = expected.replace(hour=0, minute=0, second=0, microsecond=0)
    out = wh.read_between(spec, since=since)
    assert out.count() == src.filter(F.col(spec.time_column) >= since).count() > 0

"""Parquet-backed warehouse with PK-upsert and incremental ledger.

Replaces the reference's two storage backends (DuckDB upsert pair,
crypto_data_pipeline_duckdb.py:1546-1594; ClickHouse
ReplacingMergeTree + OPTIMIZE FINAL,
crypto_data_pipline_clickhouse.py:1757-1793) with one distributed
layout:

- every table lives at ``<root>/<name>/`` as parquet, fact tables
  hive-partitioned by a derived ``ds`` date column (from the spec's
  ``partition_date_source``);
- upsert is **partition-scoped**: only the ``ds`` partitions present
  in the update batch are read, anti-joined and rewritten — at
  100 TB an hourly micro-batch touches 1-2 partitions, not the
  table (dynamic partition overwrite mode);
- the incremental watermark (reference: ``SELECT MAX(time_col)``,
  duckdb:1523-1544) reads only the latest partitions thanks to
  partition pruning on ``ds``.

This is MERGE-ON-READ-free: readers see plain parquet with unique
PKs, no dedup view needed.

Write-audit-publish (round 5): every mutation (upsert / overwrite /
maintain) stages its full output under ``<root>/_staging/<name>/<tx>``
first, records a ``_PLAN.json`` once the stage is completely written,
and only then publishes by RENAMING whole partition directories into
place. The reference got crash atomicity from DuckDB/ClickHouse
transactions (duckdb:1546-1594; ch:1757-1793); here it comes from the
rename protocol:

- **Crash before the plan file exists** → the live table was never
  touched; ``recover`` discards the half-written stage.
- **Crash mid-publish** → the plan replays idempotently: each
  partition either still has its staged dir (swap it) or was already
  swapped (skip); ``recover`` (called automatically at the start of
  every mutation) rolls the transaction forward to completion.
- **Reader contract**: each partition transitions atomically from its
  complete old state to its complete new state (one directory rename
  on a POSIX/HDFS filesystem) — a concurrent reader never sees a
  partially-written partition. Across partitions the publish is
  sequential, so a multi-partition reader can observe partition A new
  while B is still old (and a partition mid-swap is briefly absent
  from a directory listing); full snapshot isolation requires a table
  format (Delta/Iceberg) and is explicitly out of scope.
- **Writer contract**: one writer per table at a time. Staging makes
  crashes recoverable, not concurrent writers serializable — the
  reference had the same single-writer scheduler
  (scheduler_clickhouse.py:120-133).
- Renames are ``os.rename`` (atomic on local disk / NFS / anything
  POSIX; HDFS renames are atomic too via the FileSystem API). Object
  stores without atomic rename need a table format instead.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binancedatapipeline_spark.catalog import TableSpec
from binancedatapipeline_spark.operators.dedup import dedup_keep_last

DS_COL = "ds"


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            not entry.startswith((".", "_")) for entry in os.listdir(p)
        )

    # ------------------------------------------------------------- read

    def read(self, spec: TableSpec) -> DataFrame:
        """Read a table (without the internal ds partition column).

        Rolls forward any committed-but-unpublished transaction first
        (a writer that died between partition swaps would otherwise
        leave that partition invisible until the NEXT mutation — the
        exact window where the pipeline being down is likeliest).
        Readers going through this class therefore always see a fully
        published table; external readers scanning the path directly
        see the documented per-partition-atomic view instead."""
        self.recover(spec.name, rollback_uncommitted=False)
        if not self.exists(spec.name):
            return spec.empty(self.spark)
        df = self.spark.read.parquet(self.path(spec.name))
        return df.select(*spec.columns)

    def latest_timestamp(self, spec: TableSpec):
        """The incremental watermark: MAX(time_column), or None.

        With ds-partitioning, Catalyst prunes this to a scan of the
        lexicographically-last partitions in practice; exact
        semantics kept simple (full-column max) for correctness.
        """
        if spec.time_column is None or not self.exists(spec.name):
            return None
        df = self.spark.read.parquet(self.path(spec.name))
        row = df.agg(F.max(spec.time_column).alias("m")).first()
        return row["m"]

    def incremental_start(self, spec: TableSpec, now: datetime) -> datetime | None:
        """start = watermark − lookback (the reference's late-data
        re-fetch buffer, duckdb:1612-1629); None → full backfill."""
        latest = self.latest_timestamp(spec)
        if latest is None:
            return None
        value, unit = spec.lookback.split()
        delta = timedelta(**{unit if unit.endswith("s") else unit + "s": int(value)})
        return latest - delta

    # ----------------------------------------------- transaction plumbing

    def _staging_root(self, name: str) -> str:
        return os.path.join(self.root, "_staging", name)

    def _new_stage(self, name: str) -> str:
        tx = datetime.now().strftime("%Y%m%d%H%M%S%f") + "-" + uuid.uuid4().hex[:8]
        stage = os.path.join(self._staging_root(name), tx)
        os.makedirs(stage)
        return stage

    def _rename(self, src: str, dst: str) -> None:
        """Single-call seam for every publish-step rename — tests
        inject crashes here to exercise recovery."""
        os.rename(src, dst)

    def _part_dir(self, name: str, ds: str) -> str:
        return os.path.join(self.path(name), f"{DS_COL}={ds}")

    def _write_plan(self, stage: str, plan: dict) -> None:
        """The commit point: the plan file appears atomically
        (write-then-replace), and its presence means the staged data
        is complete and the transaction WILL be published (rolled
        forward by ``recover`` if this process dies first)."""
        tmp = os.path.join(stage, "_PLAN.json.tmp")
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, os.path.join(stage, "_PLAN.json"))

    def _publish(self, name: str, stage: str) -> None:
        """Execute (or re-execute) a committed plan. Idempotent: every
        step checks whether it already happened, so a crash at ANY
        rename boundary is repaired by running this again. Steps
        additionally tolerate FileNotFoundError from the rename
        itself — a reader-side ``recover`` racing the original
        writer's publish means the other process already performed
        the step between our existence check and our rename."""

        def step(src: str, dst: str) -> None:
            try:
                self._rename(src, dst)
            except FileNotFoundError:
                pass  # the concurrent publisher won the race; done

        plan_path = os.path.join(stage, "_PLAN.json")
        try:
            with open(plan_path) as f:
                plan = json.load(f)
        except FileNotFoundError:
            if not os.path.isdir(stage):
                return  # a concurrent recover published + cleaned it all
            raise
        data = os.path.join(stage, "data")
        old = os.path.join(stage, "_old")
        os.makedirs(old, exist_ok=True)
        if plan.get("whole_table"):
            live = self.path(name)
            if os.path.isdir(data):
                if os.path.isdir(live):
                    step(live, os.path.join(old, "table"))
                step(data, live)
        else:
            for ds in plan["drops"]:
                live = self._part_dir(name, ds)
                if os.path.isdir(live):
                    step(live, os.path.join(old, f"{DS_COL}={ds}"))
            for ds in plan["swaps"]:
                staged = os.path.join(data, f"{DS_COL}={ds}")
                live = self._part_dir(name, ds)
                if os.path.isdir(staged):
                    if os.path.isdir(live):
                        step(live, os.path.join(old, f"{DS_COL}={ds}"))
                    step(staged, live)
        shutil.rmtree(stage, ignore_errors=True)

    def _staged_partitions(self, data: str) -> list[str]:
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(data)
            if d.startswith(f"{DS_COL}=")
        )

    def recover(self, name: str, rollback_uncommitted: bool = True) -> int:
        """Repair unfinished transactions for a table: committed plans
        (plan file present ⇒ stage fully written) roll FORWARD to
        their final state; uncommitted stages roll BACK (discarded —
        the live table was never touched). Called automatically at the
        start of every mutation, so after a crash the next pipeline
        run self-heals; ``read`` calls it too with
        ``rollback_uncommitted=False`` — a plan-less stage there may
        be a LIVE writer mid-stage, and only the writer path (which
        owns the single-writer lock by contract) may discard one.
        Returns the number of transactions repaired."""
        sroot = self._staging_root(name)
        if not os.path.isdir(sroot):
            return 0
        n = 0
        for tx in sorted(os.listdir(sroot)):
            stage = os.path.join(sroot, tx)
            if not os.path.isdir(stage):
                continue
            if os.path.exists(os.path.join(stage, "_PLAN.json")):
                self._publish(name, stage)
            elif rollback_uncommitted:
                shutil.rmtree(stage, ignore_errors=True)
            else:
                continue
            n += 1
        return n

    # ------------------------------------------------------------ write

    def _with_ds(self, spec: TableSpec, df: DataFrame) -> DataFrame:
        src = spec.partition_date_source
        if src is None:
            return df
        return df.withColumn(DS_COL, F.to_date(F.col(src)))

    def init_table(self, spec: TableSpec) -> None:
        """CREATE TABLE IF NOT EXISTS (duckdb:1499-1521): write an
        empty partitioned dataset so readers never 404."""
        if not self.exists(spec.name):
            self._with_ds(spec, spec.empty(self.spark)).write.mode("overwrite").parquet(
                self.path(spec.name)
            )

    def overwrite(self, spec: TableSpec, df: DataFrame) -> None:
        """Full refresh (dimension tables, needs_incremental=False).
        Staged then swapped as ONE whole-table rename — a reader mid-
        refresh sees the complete old table or the complete new one,
        never Spark's delete-then-write window."""
        self.recover(spec.name)
        out = self._with_ds(spec, spec.align(df))
        stage = self._new_stage(spec.name)
        data = os.path.join(stage, "data")
        writer = out.write
        if spec.partition_date_source:
            writer = writer.partitionBy(DS_COL)
        writer.parquet(data)
        self._write_plan(stage, {"whole_table": True})
        self._publish(spec.name, stage)

    def write_bucketed(
        self,
        spec: TableSpec,
        df: DataFrame,
        n_buckets: int = 8,
        bucket_cols: list[str] | None = None,
    ) -> str:
        """Materialize a table bucketed (and sorted) by its leading
        primary-key column(s) for co-located joins: two tables
        bucketed the same way join WITHOUT a shuffle — at 100 TB the
        perp⋈spot premium join is the workload's dominant shuffle,
        and bucketing removes it from every hourly run. Registers
        ``<name>_bucketed`` in the session catalog and returns it."""
        cols = bucket_cols or [spec.primary_keys[0]]
        table = f"{spec.name}_bucketed"
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            spec.align(df)
            .write.mode("overwrite")
            .bucketBy(n_buckets, *cols)
            .sortBy(*cols)
            .option("path", self.path(table))
            .saveAsTable(table)
        )
        return table

    def upsert(self, spec: TableSpec, updates: DataFrame, order_col: str | None = None) -> None:
        """PK-upsert restricted to the date partitions the batch
        touches. Replay-idempotent (T3/T4); crash-atomic via the
        stage-plan-publish protocol (module docstring).

        Plan: dedup batch keep-last → read ONLY affected partitions
        of the target → anti-join out superseded rows → union →
        stage the rewritten partitions → publish by per-partition
        directory rename (plus explicit drops for touched partitions
        whose every row moved elsewhere).
        """
        self.recover(spec.name)
        # dedup before align: the ordering column may be auxiliary
        # (e.g. a batch sequence number) and not part of the schema
        if order_col is not None:
            updates = dedup_keep_last(updates, spec.primary_keys, order_col)
        else:
            updates = updates.dropDuplicates(list(spec.primary_keys))
        updates = spec.align(updates)

        if not self.exists(spec.name):
            self.overwrite(spec, updates)
            return

        # broadcast the batch keys into the anti-join only when the
        # batch is genuinely small — an hourly tick is, a backfill is
        # not, and force-broadcasting a backfill OOMs real executors.
        # (count() here is cheap next to the rewrite that follows.)
        keys = updates.select(*spec.primary_keys)
        anti_build = (
            F.broadcast(keys) if updates.count() <= 1_000_000 else keys
        )

        if spec.partition_date_source is None:
            merged = self.read(spec).join(
                anti_build, on=list(spec.primary_keys), how="left_anti"
            ).unionByName(updates)
            # stage the merge (reading the live table), then swap the
            # whole table directory in one rename
            stage = self._new_stage(spec.name)
            data = os.path.join(stage, "data")
            self._with_ds(spec, merged).write.parquet(data)
            self._write_plan(stage, {"whole_table": True})
            self._publish(spec.name, stage)
            return

        updates_ds = self._with_ds(spec, updates)
        touched = {r[DS_COL] for r in updates_ds.select(DS_COL).distinct().collect()}

        # When the partition source column is NOT part of the PK (e.g.
        # bn_option_symbols_exercised: PK (symbol, exchange),
        # partitioned by expiryDate), an update that moves a row's
        # partition value would strand the superseded row in its old
        # partition, breaking the unique-PK read contract. Locate every
        # partition holding a matched PK (a column-pruned scan of just
        # PK+ds) and fold it into the rewrite set. When the source IS a
        # PK column, a PK match implies the same ds — skip the scan.
        if spec.partition_date_source not in spec.primary_keys:
            stranded = (
                self.spark.read.parquet(self.path(spec.name))
                .select(DS_COL, *spec.primary_keys)
                .join(anti_build, on=list(spec.primary_keys), how="left_semi")
                .select(DS_COL)
                .distinct()
                .collect()
            )
            touched |= {r[DS_COL] for r in stranded}
        touched = sorted(touched)

        target = self.spark.read.parquet(self.path(spec.name)).filter(
            F.col(DS_COL).isin(touched)
        )
        kept = target.join(
            anti_build, on=list(spec.primary_keys), how="left_anti"
        ).select(*spec.columns)
        merged = self._with_ds(spec, kept.unionByName(updates))

        # stage the rewritten partitions, commit the plan, publish by
        # rename. A touched partition whose every row was superseded
        # (moved to another date) is absent from the staged output and
        # becomes an explicit drop — its stale directory is renamed
        # away at publish, closing the old dynamic-overwrite gap where
        # empty partitions kept their files.
        stage = self._new_stage(spec.name)
        data = os.path.join(stage, "data")
        merged.write.partitionBy(DS_COL).parquet(data)
        swaps = self._staged_partitions(data)
        drops = sorted({ds.isoformat() for ds in touched} - set(swaps))
        self._write_plan(
            stage, {"partitioned": True, "swaps": swaps, "drops": drops}
        )
        self._publish(spec.name, stage)

    # ------------------------------------------------------ maintenance

    def _hadoop_fs(self, path: str):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(self.spark._jsc.hadoopConfiguration()), jpath

    def partition_files(self, name: str) -> dict[str | None, tuple[int, int]]:
        """Per-``ds`` partition (or ``None`` for an unpartitioned
        table): (file_count, bytes). Hadoop FileSystem metadata calls
        only — works on local disk, HDFS, or object stores."""
        fs, root = self._hadoop_fs(self.path(name))
        out: dict[str | None, tuple[int, int]] = {}
        for st in fs.listStatus(root):
            base = st.getPath().getName()
            if st.isDirectory() and base.startswith(f"{DS_COL}="):
                n = b = 0
                for f in fs.listStatus(st.getPath()):
                    if not f.getPath().getName().startswith((".", "_")):
                        n += 1
                        b += f.getLen()
                out[base.split("=", 1)[1]] = (n, b)
            elif not st.isDirectory() and not base.startswith((".", "_")):
                cnt, tot = out.get(None, (0, 0))
                out[None] = (cnt + 1, tot + st.getLen())
        return out

    def maintain(
        self,
        spec: TableSpec,
        target_mb: int = 256,
        max_files_per_partition: int = 4,
    ) -> dict:
        """Background-merge parity with the reference's ClickHouse
        ReplacingMergeTree + ``OPTIMIZE FINAL`` (ch:1757–1793): hourly
        PK-upserts leave each hot date partition with one more file
        per tick, and scan cost decays accordingly. ``maintain``
        rewrites only the fragmented partitions (> ``max_files_per_
        partition`` files), compacting toward ``target_mb`` files and
        re-clustering rows by primary key (sortWithinPartitions), so
        parquet min/max stats stay selective on the PK — the
        file-layout analog of the merge-tree's clustered key.

        Partition-scoped like :meth:`upsert`: untouched partitions are
        never read or rewritten. Returns a stats dict."""
        import math

        self.recover(spec.name)
        if not self.exists(spec.name):
            return {"partitions_compacted": 0, "files_before": 0, "files_after": 0}
        stats = self.partition_files(spec.name)
        pk = list(spec.primary_keys)

        if spec.partition_date_source is None:
            n_files, n_bytes = stats.get(None, (0, 0))
            target = max(1, math.ceil(n_bytes / (target_mb << 20)))
            if n_files <= max(target, max_files_per_partition):
                return {"partitions_compacted": 0, "files_before": n_files,
                        "files_after": n_files}
            merged = (
                self.spark.read.parquet(self.path(spec.name))
                .coalesce(target)
                .sortWithinPartitions(*pk)
            )
            stage = self._new_stage(spec.name)
            merged.write.parquet(os.path.join(stage, "data"))
            self._write_plan(stage, {"whole_table": True})
            self._publish(spec.name, stage)
            return {"partitions_compacted": 1, "files_before": n_files,
                    "files_after": target}

        fragmented = {
            ds: (n, b)
            for ds, (n, b) in stats.items()
            if ds is not None and n > max_files_per_partition
        }
        files_before = sum(n for n, _ in fragmented.values())
        if not fragmented:
            return {"partitions_compacted": 0, "files_before": 0, "files_after": 0}
        total_target = sum(
            max(1, math.ceil(b / (target_mb << 20))) for _, b in fragmented.values()
        )
        from datetime import date

        touched = [date.fromisoformat(ds) for ds in fragmented]
        merged = (
            self.spark.read.parquet(self.path(spec.name))
            .filter(F.col(DS_COL).isin(touched))
            # range-partition on (ds, pk): each ds owns contiguous
            # output partitions sized by its byte share, and rows land
            # PK-clustered within them
            .repartitionByRange(total_target, DS_COL, *pk)
            .sortWithinPartitions(DS_COL, *pk)
        )
        stage = self._new_stage(spec.name)
        data = os.path.join(stage, "data")
        merged.write.partitionBy(DS_COL).parquet(data)
        self._write_plan(
            stage,
            {"partitioned": True, "swaps": self._staged_partitions(data),
             "drops": []},
        )
        self._publish(spec.name, stage)
        after = self.partition_files(spec.name)
        files_after = sum(
            after.get(ds, (0, 0))[0] for ds in fragmented
        )
        return {
            "partitions_compacted": len(fragmented),
            "files_before": files_before,
            "files_after": files_after,
        }

"""Pin the driver-session contract: every registry query must ANALYZE
and EXECUTE under a *default-config* SparkSession, not just under this
repo's tuned session (binancedatapipeline_spark.session disables parquet
NTZ inference; the driver's harness does not — round 3 lost 4 queries to
exactly that drift: a vanilla session read events.ts as TIMESTAMP_NTZ
and unix_millis() rejected it at analysis time).

Runs in a subprocess so the default session can't inherit anything from
the shared pytest session fixture.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import json, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

# Default config on purpose: no UTC pin, no NTZ-inference override, no
# shuffle-partition tuning — the point is to mimic the driver harness.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("vanilla-session-contract")
    .getOrCreate()
)
import __spark_entry__ as entry_mod

sf_dir = %(sf_dir)r
failures = {}
for name, fn in entry_mod.queries().items():
    try:
        fn(spark, sf_dir).limit(1).collect()
    except Exception as exc:  # noqa: BLE001 - report every query's error
        failures[name] = f"{type(exc).__name__}: {exc}"[:300]
entry_df = entry_mod.entry(spark)
try:
    entry_df.limit(1).collect()
except Exception as exc:  # noqa: BLE001
    failures["__entry__"] = f"{type(exc).__name__}: {exc}"[:300]
print("VANILLA_RESULT:" + json.dumps(failures))
spark.stop()
"""


def test_all_queries_run_under_default_session():
    sf_dir = os.environ.get("SPARK_GRAFT_VANILLA_SF", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO, "sf_dir": sf_dir}],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    marker = "VANILLA_RESULT:"
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith(marker)), None
    )
    assert line is not None, (
        f"subprocess died before reporting\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-2000:]}"
    )
    failures = json.loads(line[len(marker):])
    assert failures == {}, f"queries broken under a vanilla session: {failures}"

"""Dump .explain("formatted") for every registry query to
plans/r12/<name>_<suffix>.txt (driver contract unchanged; suffix via argv)."""
import os
import sys

sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))

import __spark_entry__ as entry_mod
from binancedatapipeline_spark.session import get_session

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="plans")
for name, fn in entry_mod.queries().items():
    if only and name not in only:
        continue
    df = fn(spark, sf_dir)
    # execute THIS DataFrame's queryExecution (a noop write would
    # plan its own) so AQE finalizes: the dumped plan is the runtime
    # plan, including ReusedExchange / AQEShuffleRead — r11's dumps
    # were the initial plans, which hide runtime reuse
    df.collect()
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(f"/root/repo/plans/r12/{name}_{suffix}.txt", "w") as f:
        f.write(txt)
    print(name, "ok")
spark.stop()

"""End-to-end alert-tick growth curve (round-8 ask #7): wall-time of
one full tick — premium upsert → detect → ledger anti-join → notify →
flip — as the PREMIUM table and the ALERT LEDGER grow, proving the
round-8 bounded reads (windowed ledger anti-join, flag-pruned unsent
scan) keep the tick flat where the round-7 full-ledger read +
unbounded broadcast grew without bound.

Per size step (default 4× growth per step): seed the premium table to
S symbols × D days of hourly rows, seed the ledger with L historical
delivered alerts (notified=True — the state an always-on deployment
accumulates forever), stage ONE fresh hour of premium data, run
``stream_extreme_alerts`` availableNow, and record the tick wall time
plus the file counts each bounded read actually listed.

Usage: python tools/bench_alert_tick.py [--steps 3] [--out /tmp/...]
Prints one JSON line per step plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from datetime import datetime, timedelta

sys.path.insert(0, ".")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from binancedatapipeline_spark import catalog  # noqa: E402
from binancedatapipeline_spark.session import get_session  # noqa: E402
from binancedatapipeline_spark.streaming.jobs import stream_extreme_alerts  # noqa: E402
from binancedatapipeline_spark.warehouse import Warehouse  # noqa: E402


def premium_rows(spark, symbols: int, hours: int, start: datetime):
    return (
        spark.range(symbols)
        .select(F.concat(F.lit("SYM"), F.col("id")).alias("symbol"))
        .crossJoin(
            spark.range(hours).select(
                (F.lit(start) + F.make_interval(hours=F.col("id"))).alias("timestamp")
            )
        )
        .withColumn("exchange", F.lit("binance"))
        .withColumn("close_time", F.col("timestamp"))
        .withColumn("premium", F.lit(0.001))
        .withColumn("wma120_premium", F.lit(0.001))
    )


def ledger_rows(spark, n: int, start: datetime):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("OLD"), F.col("id")).alias("symbol"),
            (F.lit(start) + F.make_interval(mins=F.col("id"))).alias("fundingTime"),
            F.lit(0.01).alias("fundingRate"),
            F.lit(-0.01).alias("fundingRate_change"),
            F.lit(0).cast("long").alias("batch_id"),
            F.lit(True).alias("notified"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--symbols", type=int, default=50)
    ap.add_argument("--base-days", type=int, default=30)
    ap.add_argument("--base-ledger", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/bench_alert_tick")
    args = ap.parse_args()

    spark = get_session(app_name="bench_alert_tick")
    prem_spec, alerts_spec = catalog.BN_PREMIUM, catalog.BN_EXTREME_ALERTS
    results = []
    for step in range(args.steps):
        scale = 4**step
        days, ledger_n = args.base_days * scale, args.base_ledger * scale
        root = f"{args.out}/s{step}"
        shutil.rmtree(root, ignore_errors=True)
        wh = Warehouse(spark, f"{root}/wh")
        t_hist = datetime(2020, 1, 1)
        horizon = t_hist + timedelta(hours=days * 24)
        wh.overwrite(prem_spec, premium_rows(spark, args.symbols, days * 24, t_hist))
        wh.overwrite(alerts_spec, ledger_rows(spark, ledger_n, t_hist))

        # one fresh hour, staged as the stream's micro-batch — planted
        # squeeze so the tick exercises detect→ledger→notify end-to-end
        batch = premium_rows(spark, args.symbols, 1, horizon).withColumn(
            "wma120_premium", F.lit(-0.02)
        )
        stage = f"{root}/in"
        batch.coalesce(1).write.parquet(stage)
        msgs: list[str] = []
        t0 = time.perf_counter()
        q = stream_extreme_alerts(
            spark.readStream.schema(prem_spec.schema).parquet(stage),
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "symbol": [f"SYM{i}" for i in range(args.symbols)],
                        "onboard_date": pd.to_datetime(
                            ["2019-01-01"] * args.symbols
                        ).astype("datetime64[us]"),
                    }
                )
            ),
            wh, prem_spec, alerts_spec, f"{root}/ckpt",
            notify=msgs.append, interval=2, detect_lookback="7 days",
            available_now=True,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError(
                f"step {step}: tick exceeded the 600s budget — the "
                "growth-curve row would be truncated/raced, aborting"
            )
        tick_s = time.perf_counter() - t0

        # evidence: what the bounded reads actually list vs the tables
        win_since = wh.latest_timestamp(prem_spec) - timedelta(days=7)
        led_win = len(
            wh.read_between(alerts_spec, since=win_since).inputFiles()
        )
        led_total = len(wh.read(alerts_spec).inputFiles())
        unsent = len(
            wh.read_between(
                alerts_spec, column="notified", since=False, until=False
            ).inputFiles()
        )
        prem_win = len(wh.read_between(prem_spec, since=win_since).inputFiles())
        prem_total = len(wh.read(prem_spec).inputFiles())
        row = {
            "step": step,
            "premium_rows": args.symbols * days * 24,
            "ledger_rows": ledger_n,
            "tick_s": round(tick_s, 2),
            "alerts_sent": len(msgs),
            "ledger_files_windowed": led_win,
            "ledger_files_total": led_total,
            "unsent_scan_files": unsent,
            "premium_files_windowed": prem_win,
            "premium_files_total": prem_total,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "alert_tick_growth", "steps": results}))


if __name__ == "__main__":
    main()

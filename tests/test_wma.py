"""WMA window operator vs the reference pandas kernel (SURVEY W4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from binancedatapipeline_spark.operators.wma import with_wma, wma_oracle_sql
from tests.helpers import assert_frames_match, linear_wma_pandas


def test_wma_matches_pandas_kernel(spark, fixture_dir):
    perp = pd.read_parquet(f"{fixture_dir}/bn_perp_klines.parquet")
    sdf = spark.createDataFrame(perp[["symbol", "timestamp", "close"]])
    got = (
        with_wma(sdf, "close", 120, ["symbol"], "timestamp", "wma")
        .toPandas()
    )
    exp = perp.sort_values(["symbol", "timestamp"]).copy()
    exp["wma"] = exp.groupby("symbol")["close"].transform(lambda x: linear_wma_pandas(x, 120))
    exp = exp[["symbol", "timestamp", "close", "wma"]]
    assert_frames_match(got, exp, rtol=1e-9, sort_cols=["symbol", "timestamp"])


def test_wma_small_window_exact(spark):
    pdf = pd.DataFrame(
        {"g": ["a"] * 5 + ["b"] * 3, "t": list(range(5)) + list(range(3)),
         "x": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 30.0]}
    )
    got = (
        with_wma(spark.createDataFrame(pdf), "x", 3, ["g"], "t", "wma")
        .orderBy("g", "t")
        .toPandas()
    )
    # weights 1,2,3 / 6
    assert got["wma"].iloc[0] != got["wma"].iloc[0]  # NaN warm-up
    assert abs(got["wma"].iloc[2] - (1 * 1 + 2 * 2 + 3 * 3) / 6.0) < 1e-12
    assert abs(got["wma"].iloc[4] - (3 * 1 + 4 * 2 + 5 * 3) / 6.0) < 1e-12
    assert abs(got["wma"].iloc[7] - (10 * 1 + 20 * 2 + 30 * 3) / 6.0) < 1e-12


def test_wma_oracle_sql_matches_spark(spark, fixture_dir, oracle):
    """The SQL rendering (used by __spark_entry__ oracles) matches the
    DataFrame operator when run by DuckDB."""
    sql = wma_oracle_sql(
        "bn_perp_klines", "close", 120, ["symbol"], "timestamp", "wma"
    )
    exp = oracle.execute(sql).df()
    sdf = spark.read.parquet(f"{fixture_dir}/bn_perp_klines.parquet")
    got = (
        with_wma(sdf.select("symbol", "timestamp", "close"), "close", 120,
                 ["symbol"], "timestamp", "wma")
        .toPandas()
    )
    assert_frames_match(got, exp, rtol=1e-9, sort_cols=["symbol", "timestamp"])

"""Flagship end-to-end slice: premium+WMA materialization and the
extreme-event detector vs the DuckDB oracle (SURVEY §3.2 / §3.3)."""

from __future__ import annotations

import pytest

from binancedatapipeline_spark.plans.extreme import extreme_cases
from binancedatapipeline_spark.plans.premium import premium_wma
from tests.helpers import assert_frames_match

START, END = "2024-01-10 00:00:00", "2024-01-28 00:00:00"

PREMIUM_ORACLE = f"""
WITH joined AS (
  SELECT p.symbol, p.exchange, p.timestamp, p.close_time,
         p.close / s.close - 1 AS premium
  FROM bn_perp_klines p
  INNER JOIN bn_spot_klines s
    ON p.symbol = s.symbol AND p.timestamp = s.timestamp
  WHERE p.timestamp >= TIMESTAMP '{START}' - INTERVAL '120 minutes'
    AND p.timestamp <= TIMESTAMP '{END}'
),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY timestamp) AS rn
  FROM joined
)
SELECT symbol, exchange, timestamp, close_time, premium,
       CASE WHEN count(premium) OVER w = 120 THEN
         (sum(premium * rn) OVER w - (rn - 120) * sum(premium) OVER w) / 7260.0
       END AS wma120_premium
FROM numbered
WINDOW w AS (PARTITION BY symbol ORDER BY timestamp
             ROWS BETWEEN 119 PRECEDING AND CURRENT ROW)
QUALIFY timestamp >= TIMESTAMP '{START}' AND timestamp <= TIMESTAMP '{END}'
"""


@pytest.fixture(scope="module")
def premium_sdf(spark, fixture_dir):
    perp = spark.read.parquet(f"{fixture_dir}/bn_perp_klines.parquet")
    spot = spark.read.parquet(f"{fixture_dir}/bn_spot_klines.parquet")
    return premium_wma(perp, spot, START, END).cache()


def test_premium_wma_matches_oracle(premium_sdf, oracle):
    exp = oracle.execute(PREMIUM_ORACLE).df().drop(columns=[], errors="ignore")
    got = premium_sdf.toPandas()
    assert_frames_match(got, exp, rtol=1e-9, sort_cols=["symbol", "timestamp"])


def test_premium_inner_join_drops_unmatched(premium_sdf):
    # PERPONLYUSDT has no spot bars → must not appear
    assert premium_sdf.filter("symbol = 'PERPONLYUSDT'").count() == 0


def test_extreme_cases_matches_oracle(spark, premium_sdf, fixture_dir, oracle):
    perp_symbols = spark.read.parquet(f"{fixture_dir}/bn_perp_symbols.parquet")
    got = extreme_cases(premium_sdf, perp_symbols, interval=30,
                        threshold_delta=-0.006, threshold_diff=1440).toPandas()

    premium_sdf.toPandas().to_parquet("/tmp/_premium_oracle_input.parquet", index=False)
    oracle.execute(
        "CREATE OR REPLACE VIEW bn_premium AS SELECT * FROM '/tmp/_premium_oracle_input.parquet'"
    )
    exp = oracle.execute("""
WITH prepare_fundingRate AS (
  SELECT p.symbol,
         p.timestamp AS fundingTime,
         LAG(p.timestamp, 30) OVER (PARTITION BY p.symbol ORDER BY p.timestamp) AS prev_fundingTime,
         wma120_premium AS fundingRate,
         LAG(wma120_premium, 30) OVER (PARTITION BY p.symbol ORDER BY p.timestamp) AS prev_fundingRate
  FROM bn_premium p
  INNER JOIN bn_perp_symbols s
    ON p.symbol = s.symbol AND p.timestamp > s.onboard_date + INTERVAL 5 DAY
),
change AS (
  SELECT *, fundingRate - prev_fundingRate AS fundingRate_change
  FROM prepare_fundingRate
  WHERE fundingRate - prev_fundingRate < -0.006
),
debounced AS (
  SELECT *,
         DATEDIFF('minute', LAG(fundingTime) OVER (PARTITION BY symbol ORDER BY fundingTime),
                  fundingTime) AS fundingTime_diff
  FROM change
)
SELECT *, fundingTime + INTERVAL 8 HOUR AS fundingTime_cn
FROM debounced
WHERE fundingTime_diff IS NULL OR fundingTime_diff > 1440
ORDER BY fundingTime DESC, symbol
LIMIT 10
""").df()
    assert len(got) > 0, "fixture must produce extreme events"
    assert_frames_match(got, exp, rtol=1e-9,
                        sort_cols=["fundingTime", "symbol"])

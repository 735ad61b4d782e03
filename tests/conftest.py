from __future__ import annotations

import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from binancedatapipeline_spark.session import get_session

    s = get_session(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    from binancedatapipeline_spark import fixtures

    out = str(tmp_path_factory.mktemp("bn_fixtures"))
    fixtures.write_all(out)
    return out


@pytest.fixture(scope="session")
def oracle(fixture_dir):
    """DuckDB connection with every bn_* fixture registered as a view."""
    con = duckdb.connect()
    for name in (
        "bn_spot_symbols",
        "bn_perp_symbols",
        "bn_spot_klines",
        "bn_perp_klines",
        "bn_funding_rates",
        "bn_margin_interest_rates",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{fixture_dir}/{name}.parquet'"
        )
    yield con
    con.close()

"""Differential harness: run every __spark_entry__ query against its
DuckDB oracle and report row-count/schema/value mismatches.

Usage: python tools/compare_entry.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from binancedatapipeline_spark.session import get_session

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
    return out.sort_values(by=list(out.columns), ignore_index=True, na_position="last")


def compare(name, got, exp):
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"rows: spark={len(got)} oracle={len(exp)}")
        return problems
    a, b = canon(got), canon(exp)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = av.astype(float).to_numpy()
            bb = bv.astype(float).to_numpy()
            same = (np.isnan(aa) & np.isnan(bb)) | (aa == bb)
            if not same.all():
                i = int(np.argmax(~same))
                problems.append(f"col {c}: {int((~same).sum())} exact mismatches, e.g. {aa[i]!r} vs {bb[i]!r}")
        else:
            mism = av.astype(str) != bv.astype(str)
            if mism.any():
                i = int(np.argmax(mism.to_numpy()))
                problems.append(f"col {c}: {int(mism.sum())} mismatches, e.g. {av.iloc[i]!r} vs {bv.iloc[i]!r} (dtype {av.dtype}/{bv.dtype})")
    return problems


def main():
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if vanilla:
        # default-config session (the driver harness's reader mode:
        # NTZ inference ON until _load disables it) — proves both
        # reader modes are value-identical, not just analyzable
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("compare_entry_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_session(app_name="compare_entry", shuffle_partitions=8)
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            continue
        try:
            exp = con.execute(osql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL {name} ({len(got)} rows): " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

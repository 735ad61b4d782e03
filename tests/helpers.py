from __future__ import annotations

import numpy as np
import pandas as pd


def canon(pdf: pd.DataFrame, sort_cols: list[str] | None = None) -> pd.DataFrame:
    """Canonicalize for order-insensitive comparison: sort columns by
    name, sort rows by all columns, reset index."""
    out = pdf[sorted(pdf.columns)]
    out = out.sort_values(by=sort_cols or list(out.columns), ignore_index=True)
    return out


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    rtol: float = 1e-9,
    atol: float = 1e-12,
    sort_cols: list[str] | None = None,
):
    a, b = canon(spark_pdf, sort_cols), canon(oracle_pdf, sort_cols)
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            np.testing.assert_allclose(
                av.astype(float).to_numpy(),
                bv.astype(float).to_numpy(),
                rtol=rtol,
                atol=atol,
                equal_nan=True,
                err_msg=f"column {col}",
            )
        else:
            mismatch = (av.astype(str) != bv.astype(str))
            assert not mismatch.any(), (
                f"column {col}: {int(mismatch.sum())} mismatches, first at "
                f"{mismatch.idxmax()}: {av[mismatch].head(3).tolist()} vs {bv[mismatch].head(3).tolist()}"
            )


def linear_wma_pandas(s: pd.Series, n: int) -> pd.Series:
    """Reference kernel: pandas_ta-style linear WMA (weights 1..n over
    the trailing n rows, NaN during warm-up)."""
    weights = np.arange(1, n + 1, dtype=float)
    return s.rolling(n).apply(lambda x: np.dot(x, weights) / weights.sum(), raw=True)

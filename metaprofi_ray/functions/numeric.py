"""Numeric helpers shared by pipelines and their SQL oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(x, ndigits: int = 2):
    """Round half away from zero — DuckDB's ROUND semantics (numpy/pandas
    default is half-to-even, which diverges on exact .5 boundaries like
    sums of .125-valued prices).  Matches DuckDB bit-for-bit on doubles."""
    p = 10.0 ** ndigits
    if isinstance(x, pd.Series):
        v = x.to_numpy(dtype=np.float64)
        return pd.Series(np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p, index=x.index)
    v = np.asarray(x, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p

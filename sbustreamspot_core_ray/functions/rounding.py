"""Oracle-compatible rounding.

numpy / pandas ``.round()`` is round-half-to-even (banker's); ANSI-SQL
``ROUND`` (DuckDB, Postgres) is round-half-AWAY-from-zero. Every query that
rounds a value feeding the driver's value-hash comparison must round the
same way the SQL oracle does, so this is the single rounding helper used
across the repo (reproduced divergence: 0.8203125 -> 0.820312 banker's vs
0.820313 SQL).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int):
    """Round half away from zero (SQL ROUND semantics) elementwise.

    Accepts scalars, numpy arrays, or pandas Series; returns the same
    container kind (Series keep their index/name).
    """
    import pandas as pd

    scale = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(arr) * scale + 0.5), arr) / scale
    if isinstance(x, pd.Series):
        return pd.Series(out, index=x.index, name=x.name)
    if np.isscalar(x):
        return float(out)
    return out

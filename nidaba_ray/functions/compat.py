"""SQL-compatible numeric helpers.

DuckDB's ROUND on DOUBLE rounds half AWAY from zero; numpy/pandas/
pyarrow round half to even. Ratios of small integers land exactly on
representable midpoints (53/8 = 6.625), so oracle value-hash
comparisons flip unless both sides round identically. Validated
against DuckDB on 30k random + midpoint doubles (0 mismatches at
digits 0/2/4).
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_like_sql"]


def round_like_sql(x, digits: int = 2):
    """Round half away from zero, matching DuckDB ROUND(double, d).

    Accepts scalars, numpy arrays or pandas Series; returns the same
    shape as float64."""
    m = 10.0 ** digits
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * m + 0.5) / m
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    try:
        import pandas as pd

        if isinstance(x, pd.Series):
            return pd.Series(out, index=x.index, name=x.name)
    except ImportError:
        pass
    return out


# md5_64 (first 8 digest bytes, big-endian — the repo's 64-bit hash
# convention, see dedup._md5_64) as a DuckDB SQL template. ONE source
# of truth for every oracle that replays md5_64 in SQL; DuckDB's own
# md5_number_upper/lower use a different byte order and do NOT match.
MD5_64_SQL = "('0x' || substr(md5({e}),1,16))::UBIGINT"

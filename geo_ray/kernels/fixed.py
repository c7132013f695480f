"""Fixed-point coordinate quantization (include/geo/fixed_latlng.h:10-30).

``kCoordinatePrecision = 1e7`` (fixed_latlng.h:11); ``double_to_fix`` uses
``std::round`` = round HALF AWAY FROM ZERO (not banker's rounding — NumPy's
``np.round`` would differ on exact .5 ticks), ``fix_to_double`` divides back.
This is the compact on-disk ring representation of area_db (area_db.h:42-43).
"""

from __future__ import annotations

import numpy as np

COORDINATE_PRECISION = 10_000_000  # fixed_latlng.h:11


def double_to_fix(c) -> np.ndarray:
    """int32 fixed-point at 1e-7 deg, round half away from zero."""
    x = np.asarray(c, dtype=np.float64) * COORDINATE_PRECISION
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int32)


def fix_to_double(c) -> np.ndarray:
    return np.asarray(c, dtype=np.float64) / COORDINATE_PRECISION


def round_half_away(x, decimals: int = 0):
    """Decimal rounding with ties AWAY from zero — the DuckDB / C++
    ``ROUND(double)`` rule. ``np.round`` ties to even, and the engine's
    derived grid coordinates land on exact decimal halves often enough that
    the two rules disagree on real rows (first seen on merc_x at sf0.1);
    every oracle-facing rounded output goes through this instead."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * s + 0.5), x) / s

"""Geohash encoding (public base32 geohash, Niemeyer scheme).

Not a reference operator — interop surface: geohash is the common exchange
cell id the reference's quadkey/tile_hash_32 users meet in external data.
Pure bit arithmetic so the DuckDB twin is exact: lat/lng quantize to the
precision's bit budget with ONE float expression each (mirrored op-for-op
in SQL), the bits interleave lng-first MSB-first, and 5-bit groups index
the standard alphabet.
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_U8 = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)


def geohash_cell(lat, lng, precision: int = 7):
    """Integer geohash cell value (5*precision bits) per point."""
    nbits = 5 * precision
    nlng = (nbits + 1) // 2
    nlat = nbits // 2
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    x = np.floor((lng + 180.0) / 360.0 * float(1 << nlng)).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * float(1 << nlat)).astype(np.int64)
    x = np.minimum(np.maximum(x, 0), (1 << nlng) - 1)
    y = np.minimum(np.maximum(y, 0), (1 << nlat) - 1)
    v = np.zeros(lat.shape, dtype=np.int64)
    for j in range(nbits):
        if j % 2 == 0:  # even position from MSB -> lng bit
            bit = (x >> np.int64(nlng - 1 - j // 2)) & 1
        else:
            bit = (y >> np.int64(nlat - 1 - (j - 1) // 2)) & 1
        v |= bit << np.int64(nbits - 1 - j)
    return v


def geohash_encode(lat, lng, precision: int = 7) -> np.ndarray:
    """Geohash strings, fully vectorized (no per-row Python)."""
    v = geohash_cell(lat, lng, precision)
    chars = np.empty((v.size, precision), dtype=np.uint8)
    for c in range(precision):
        idx = (v >> np.int64(5 * (precision - 1 - c))) & np.int64(31)
        chars[:, c] = _ALPHA_U8[idx]
    return chars.reshape(-1).view(f"S{precision}").astype(str)


def sql_geohash_cell(lat_col: str, lng_col: str, precision: int = 7) -> str:
    """DuckDB twin of :func:`geohash_cell` — identical float quantization
    expressions, explicit bit-interleave sum."""
    nbits = 5 * precision
    nlng = (nbits + 1) // 2
    nlat = nbits // 2
    x = (
        f"LEAST(GREATEST(CAST(FLOOR(({lng_col} + 180.0) / 360.0 * {float(1 << nlng)!r}) AS BIGINT), 0), {(1 << nlng) - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat_col} + 90.0) / 180.0 * {float(1 << nlat)!r}) AS BIGINT), 0), {(1 << nlat) - 1})"
    )
    terms = []
    for j in range(nbits):
        if j % 2 == 0:
            terms.append(f"(((gx >> {nlng - 1 - j // 2}) & 1) * {1 << (nbits - 1 - j)})")
        else:
            terms.append(f"(((gy >> {nlat - 1 - (j - 1) // 2}) & 1) * {1 << (nbits - 1 - j)})")
    return f"(SELECT {' + '.join(terms)} FROM (SELECT {x} AS gx, {y} AS gy))"


def sql_geohash_string(cell_expr: str, precision: int = 7) -> str:
    """Base32 string from a cell value expression (same alphabet)."""
    parts = [
        f"SUBSTRING('{ALPHABET}', CAST((({cell_expr}) >> {5 * (precision - 1 - c)}) & 31 AS INTEGER) + 1, 1)"
        for c in range(precision)
    ]
    return " || ".join(parts)


_ALPHA_INV = np.full(128, -1, dtype=np.int64)
for _i, _c in enumerate(ALPHABET):
    _ALPHA_INV[ord(_c)] = _i


def geohash_decode(hashes, precision: int = 7):
    """Vectorized inverse: geohash strings -> (lat, lng) CELL CENTERS.

    Bits deinterleave back to the (iu, iv) quantized coordinates; the
    center is the midpoint of the cell's span, so
    ``geohash_encode(*geohash_decode(h)) == h`` for every valid hash
    (round-trip pinned by pytest)."""
    arr = np.asarray(hashes, dtype=f"S{precision}")
    chars = arr.view(np.uint8).reshape(-1, precision)
    v = np.zeros(arr.size, dtype=np.int64)
    for c in range(precision):
        v = (v << np.int64(5)) | _ALPHA_INV[chars[:, c]]
    nbits = 5 * precision
    nlng = (nbits + 1) // 2
    nlat = nbits // 2
    iu = np.zeros(arr.size, dtype=np.int64)
    iv = np.zeros(arr.size, dtype=np.int64)
    for j in range(nbits):
        bit = (v >> np.int64(nbits - 1 - j)) & 1
        if j % 2 == 0:
            iu |= bit << np.int64(nlng - 1 - j // 2)
        else:
            iv |= bit << np.int64(nlat - 1 - (j - 1) // 2)
    lng = (iu.astype(np.float64) + 0.5) / float(1 << nlng) * 360.0 - 180.0
    lat = (iv.astype(np.float64) + 0.5) / float(1 << nlat) * 180.0 - 90.0
    return lat, lng

"""Spatial cell index: the reference's ``tile_hash_32`` quadkey, vectorized.

``tile_hash_32`` (src/latlng.cc:75-96) projects a point to the WebMercator
z=16 tile grid (``webmercator<1>``: pixels == tiles) and interleaves the
2-bit quad positions of all 16 ancestors into a 32-bit Z-order/quadkey hash
— the moral equivalent of an H3/S2 cell id. Bit layout: the quad position at
zoom j sits at bit offset ``2*(16-j)`` — x bits occupy even positions, y bits
odd positions.

This hash (or a coarser-zoom prefix of it) is the *shuffle key* for the
point-in-polygon join, the kNN join and clustering.
"""

from __future__ import annotations

import numpy as np

from geo_ray.kernels import mercator as M

CELL_ZOOM = 16


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of v (Morton spread)."""
    v = np.asarray(v, dtype=np.uint32) & np.uint32(0xFFFF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


def cell_xy(lat, lng):
    """z=16 tile coordinates under ``webmercator<1>`` (pixels == tiles)."""
    mx, my = M.latlng_to_merc(lat, lng)
    x = M.merc_to_pixel_x(mx, CELL_ZOOM, tile_size=1)
    y = M.merc_to_pixel_y(my, CELL_ZOOM, tile_size=1)
    return x, y


def tile_hash_32(lat, lng):
    """Vectorized 32-bit quadkey hash of each point (uint32 array)."""
    x, y = cell_xy(lat, lng)
    return _spread_bits16(x.astype(np.uint32)) | (
        _spread_bits16(y.astype(np.uint32)) << np.uint32(1)
    )


def hash_from_xy(x, y):
    """Quadkey hash from precomputed z=16 cell coordinates."""
    return _spread_bits16(np.asarray(x, dtype=np.uint32)) | (
        _spread_bits16(np.asarray(y, dtype=np.uint32)) << np.uint32(1)
    )


def cell_prefix(hash32, zoom: int):
    """Coarser cell id at ``zoom`` <= 16: the top ``2*zoom`` bits of the hash."""
    assert 0 <= zoom <= CELL_ZOOM
    return np.right_shift(np.asarray(hash32, dtype=np.uint32), np.uint32(2 * (CELL_ZOOM - zoom)))


def cell_at_zoom(lat, lng, zoom: int):
    """Cell coordinates (x, y) at an arbitrary zoom <= 16 (shift of the z16 grid)."""
    x, y = cell_xy(lat, lng)
    s = CELL_ZOOM - zoom
    return np.right_shift(x, s), np.right_shift(y, s)


def neighbor_cells(x, y, zoom: int, ring: int = 1):
    """Explode each (x, y) cell to itself + its ``ring``-neighborhood, clipped to
    the world. Returns (row_index, nx, ny) arrays — the cell-expansion step of
    the kNN probe side (SURVEY.md §3.2)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = (1 << zoom) - 1
    offs = np.arange(-ring, ring + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs)
    dx = dx.ravel()
    dy = dy.ravel()
    k = dx.size
    row = np.repeat(np.arange(x.size, dtype=np.int64), k)
    nx = (x[:, None] + dx[None, :]).ravel()
    ny = (y[:, None] + dy[None, :]).ravel()
    keep = (nx >= 0) & (nx <= n) & (ny >= 0) & (ny <= n)
    return row[keep], nx[keep], ny[keep]

"""Google/slippy XYZ tile algebra (vectorized over uint32 columns).

Reference semantics (include/geo/tile.h, src/tile.cc):
- ``parent`` / ``quad_pos``    -> tile.h:24-27
- ``bounds_on_z``              -> src/tile.cc:25-35
- ``tiles_on_z`` (range_on_z)  -> src/tile.cc:9-23
- ``tile_range_tiles``         -> src/tile.cc:44-52 (row-major enumeration)
- ``latlng_tile`` / ``tile_range_of_box`` -> tile.h:162-172
  (pixel // tile_size at zoom z)
- packed 64-bit tile key for shuffles: z<<58 | x<<29 | y

Tile *iteration* (pyramid traversal, tile.h:45-137) lives in
``geo_ray.kernels.tile_iter`` — the bidirectional auto-descend iterator,
``make_tile_range`` / ``tile_range_on_z`` / ``make_tile_pyramid`` — for API
parity and driver-side pyramid scheduling; the distributed engine enumerates
covers as NumPy meshgrids here, never Python-by-Python tile objects.
"""

from __future__ import annotations

import numpy as np

from geo_ray.kernels import mercator as M


def parent(x, y, z):
    return np.right_shift(x, 1), np.right_shift(y, 1), np.asarray(z) - 1


def quad_pos(x, y):
    """2-bit position among the four children of the parent tile."""
    return np.left_shift(np.bitwise_and(y, 1), 1) | np.bitwise_and(x, 1)


def bounds_on_z(x, y, z, target_z):
    """Half-open pixel-tile bounds (minx, miny, maxx, maxy) of a tile re-leveled
    to ``target_z`` (src/tile.cc:25-35)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(z, dtype=np.int64)
    tz = np.asarray(target_z, dtype=np.int64)
    down = z < tz
    dz = np.abs(tz - z)
    minx = np.where(down, x << dz, x >> dz)
    miny = np.where(down, y << dz, y >> dz)
    maxx = np.where(down, (x + 1) << dz, (x >> dz) + 1)
    maxy = np.where(down, (y + 1) << dz, (y >> dz) + 1)
    return minx, miny, maxx, maxy


def tiles_on_z(x, y, z, target_z):
    """All tiles of one tile re-leveled to target_z, row-major (scalar input)."""
    minx, miny, maxx, maxy = (int(v) for v in bounds_on_z(x, y, z, target_z))
    xs, ys = np.meshgrid(np.arange(minx, maxx), np.arange(miny, maxy))
    return xs.ravel(), ys.ravel(), np.full(xs.size, int(target_z), dtype=np.int64)


def tile_range_tiles(x1, y1, x2, y2, z):
    """Row-major enumeration of the inclusive tile rectangle (src/tile.cc:44-52)."""
    lox, hix = min(x1, x2), max(x1, x2)
    loy, hiy = min(y1, y2), max(y1, y2)
    xs, ys = np.meshgrid(np.arange(lox, hix + 1), np.arange(loy, hiy + 1))
    return xs.ravel(), ys.ravel(), np.full(xs.size, int(z), dtype=np.int64)


def latlng_tile(lat, lng, z, tile_size: int = M.DEFAULT_TILE_SIZE):
    """Tile coordinates containing each point: pixel // tile_size (tile.h:166-169)."""
    px, py = M.latlng_to_pixel(lat, lng, z, tile_size)
    return px // tile_size, py // tile_size


def tile_range_of_box(lat1, lng1, lat2, lng2, z, tile_size: int = M.DEFAULT_TILE_SIZE):
    """Inclusive tile rect covered by the box spanned by two points (tile.h:162-172).

    Vectorized: returns (x_min, y_min, x_max, y_max) per row.
    """
    x1, y1 = latlng_tile(lat1, lng1, z, tile_size)
    x2, y2 = latlng_tile(lat2, lng2, z, tile_size)
    return (
        np.minimum(x1, x2),
        np.minimum(y1, y2),
        np.maximum(x1, x2),
        np.maximum(y1, y2),
    )


def pack_key(x, y, z):
    """Pack (x, y, z) into one uint64 shuffle key: z<<58 | x<<29 | y."""
    return (
        np.left_shift(np.asarray(z, dtype=np.uint64), np.uint64(58))
        | np.left_shift(np.asarray(x, dtype=np.uint64), np.uint64(29))
        | np.asarray(y, dtype=np.uint64)
    )


def unpack_key(key):
    key = np.asarray(key, dtype=np.uint64)
    z = np.right_shift(key, np.uint64(58))
    x = np.bitwise_and(np.right_shift(key, np.uint64(29)), np.uint64((1 << 29) - 1))
    y = np.bitwise_and(key, np.uint64((1 << 29) - 1))
    return x.astype(np.int64), y.astype(np.int64), z.astype(np.int64)

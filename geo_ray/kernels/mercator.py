"""WebMercator projection kernels (vectorized).

Reference semantics (include/geo/webmercator.h):
- ``latlng_to_merc``  -> :158-165 (lat clamped to +-85.0511287798)
- ``merc_to_latlng``  -> :167-172
- ``merc_to_pixel_x`` -> :207-209  x TRUNCATES toward zero
- ``merc_to_pixel_y`` -> :211-215  y is flipped and std::round()ed
  (the x-trunc / y-round asymmetry is pinned by test/webmercator_test.cc:5-26)
- ``pixel_to_merc_*`` -> :221-230
- ``resolution`` / ``map_size`` -> :236-258

The ``tile_size`` kwarg replaces the C++ ``webmercator<TileSize>`` template;
default 4096 mirrors ``default_webmercator`` (webmercator.h:261).
"""

from __future__ import annotations

import numpy as np

from geo_ray.constants import MERC_EARTH_RADIUS, MERC_MAX_LATITUDE, MERC_ORIGIN_SHIFT, PI

DEFAULT_TILE_SIZE = 4096
MAX_ZOOM = 20


def resolution(z, tile_size: int = DEFAULT_TILE_SIZE):
    """Meters per pixel at zoom z."""
    z = np.asarray(z)
    return (2.0 * PI * MERC_EARTH_RADIUS / tile_size) / np.power(2.0, z.astype(np.float64))


def map_size(z, tile_size: int = DEFAULT_TILE_SIZE):
    """World size in pixels at zoom z (tile_size << z)."""
    return np.left_shift(np.int64(tile_size), np.asarray(z, dtype=np.int64))


def latlng_to_merc(lat, lng):
    """WGS84 degrees -> EPSG:900913 meters, lat clamped to the mercator limit."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERC_MAX_LATITUDE, MERC_MAX_LATITUDE)
    sin = np.sin(np.radians(lat))
    mx = MERC_EARTH_RADIUS * np.radians(np.asarray(lng, dtype=np.float64))
    my = MERC_EARTH_RADIUS * np.log((1.0 + sin) / (1.0 - sin)) / 2.0
    return mx, my


def merc_to_latlng(mx, my):
    d = 180.0 / PI
    lat = (2.0 * np.arctan(np.exp(np.asarray(my, dtype=np.float64) / MERC_EARTH_RADIUS)) - PI / 2.0) * d
    lng = np.asarray(mx, dtype=np.float64) * d / MERC_EARTH_RADIUS
    return lat, lng


def _round_half_away(v):
    """std::round semantics: halfway cases away from zero (np.round is half-even)."""
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def merc_to_pixel_x(mx, z, tile_size: int = DEFAULT_TILE_SIZE):
    v = (np.asarray(mx, dtype=np.float64) + MERC_ORIGIN_SHIFT) / resolution(z, tile_size)
    return np.trunc(v).astype(np.int64)


def merc_to_pixel_y(my, z, tile_size: int = DEFAULT_TILE_SIZE):
    v = map_size(z, tile_size).astype(np.float64) - (
        (np.asarray(my, dtype=np.float64) + MERC_ORIGIN_SHIFT) / resolution(z, tile_size)
    )
    return _round_half_away(v).astype(np.int64)


def merc_to_pixel(mx, my, z, tile_size: int = DEFAULT_TILE_SIZE):
    return merc_to_pixel_x(mx, z, tile_size), merc_to_pixel_y(my, z, tile_size)


def pixel_to_merc_x(px, z, tile_size: int = DEFAULT_TILE_SIZE):
    return np.asarray(px, dtype=np.float64) * resolution(z, tile_size) - MERC_ORIGIN_SHIFT


def pixel_to_merc_y(py, z, tile_size: int = DEFAULT_TILE_SIZE):
    return (
        (map_size(z, tile_size) - np.asarray(py, dtype=np.int64)).astype(np.float64)
        * resolution(z, tile_size)
        - MERC_ORIGIN_SHIFT
    )


def pixel_to_merc(px, py, z, tile_size: int = DEFAULT_TILE_SIZE):
    return pixel_to_merc_x(px, z, tile_size), pixel_to_merc_y(py, z, tile_size)


def latlng_to_pixel(lat, lng, z, tile_size: int = DEFAULT_TILE_SIZE):
    mx, my = latlng_to_merc(lat, lng)
    return merc_to_pixel(mx, my, z, tile_size)


def tile_bounds_merc(x, y, z, tile_size: int = DEFAULT_TILE_SIZE):
    """Tile envelope in mercator meters (y axis reversed, webmercator.h:184-198).

    Returns (minx, miny, maxx, maxy) arrays.
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z_arr = np.asarray(z, dtype=np.int64)
    y_rev = (np.int64(1) << z_arr) - 1 - y
    res = resolution(z_arr, tile_size)

    def p2m(p):
        return res * p.astype(np.float64) - MERC_ORIGIN_SHIFT

    return (
        p2m(x * tile_size),
        p2m(y_rev * tile_size),
        p2m((x + 1) * tile_size),
        p2m((y_rev + 1) * tile_size),
    )


def tile_bounds_pixel(x, y, tile_size: int = DEFAULT_TILE_SIZE):
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return x * tile_size, y * tile_size, (x + 1) * tile_size, (y + 1) * tile_size

"""Vectorized great-circle distance kernels.

Every function takes NumPy arrays (broadcastable) of degrees and returns
NumPy arrays; no Python-level row loops. Semantics mirror the reference:

- ``haversine``            -> geo::distance          (src/latlng.cc:29-31)
- ``approx_squared_distance`` -> src/latlng.cc:33-40 (with antimeridian wrap)
- ``lower_bound_distance_lng_degrees`` -> src/latlng.cc:14-17
- ``approx_distance_lng_degrees``      -> src/latlng.cc:19-23
- ``xyz`` / ``haversine_xyz``          -> include/geo/xyz.h:14-36
"""

from __future__ import annotations

import numpy as np

from geo_ray.constants import APPROX_DISTANCE_LAT_DEGREES, EARTH_RADIUS_M


def haversine(lat1, lng1, lat2, lng2):
    """Great-circle distance in meters (spherical haversine form)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlng = np.radians(np.asarray(lng2, dtype=np.float64) - np.asarray(lng1, dtype=np.float64))
    u = np.sin(dlat / 2.0)
    v = np.sin(dlng / 2.0)
    a = u * u + np.cos(lat1) * np.cos(lat2) * v * v
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def approx_squared_distance(lat1, lng1, lat2, lng2, approx_dist_lng_degrees):
    """Equirectangular squared distance in m^2 with antimeridian wrap."""
    y = np.abs(np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)) * (
        APPROX_DISTANCE_LAT_DEGREES
    )
    xdiff = np.abs(np.asarray(lng1, dtype=np.float64) - np.asarray(lng2, dtype=np.float64))
    x = np.where(xdiff > 180.0, 360.0 - xdiff, xdiff) * approx_dist_lng_degrees
    return x * x + y * y


def lower_bound_distance_lng_degrees(lat):
    """Cheap lower bound for meters per degree longitude at a latitude."""
    lat = np.asarray(lat, dtype=np.float64)
    return np.clip(1.0 - np.abs(lat) / 90.0, 0.0, 1.0) * APPROX_DISTANCE_LAT_DEGREES


def approx_distance_lng_degrees(lat, lng):
    """Exact meters per degree longitude at a reference point."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    other_lng = lng + np.where(lng < 0.0, 1.0, -1.0)
    return haversine(lat, lng, lat, other_lng)


def xyz(lat, lng):
    """Unit-half-sphere 3D embedding (x, y, z) for chord-based haversine."""
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lng_r = np.radians(np.asarray(lng, dtype=np.float64))
    cos_lat = np.cos(lat_r)
    return (
        0.5 * cos_lat * np.sin(lng_r),
        0.5 * cos_lat * np.cos(lng_r),
        0.5 * np.sin(lat_r),
    )


def haversine_xyz(a, b):
    """Distance in m from two (x, y, z) triples produced by :func:`xyz`."""
    dx = a[0] - b[0]
    dy = a[1] - b[1]
    dz = a[2] - b[2]
    r = np.sqrt(dx * dx + dy * dy + dz * dz)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(r)


def min_haversine_xyz(a, bs_x, bs_y, bs_z):
    """Min distance in m from one xyz point to arrays of xyz coordinates."""
    d = (a[0] - bs_x) ** 2 + (a[1] - bs_y) ** 2 + (a[2] - bs_z) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(d.min()))

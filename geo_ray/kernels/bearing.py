"""Bearing / destination-point / midpoint kernels (vectorized).

Reference semantics:
- ``bearing``           -> src/latlng.cc:44-54 (degrees CW from north, [0, 360))
- ``destination_point`` -> src/latlng.cc:197-221
- ``midpoint``          -> src/latlng.cc:57-73. NOTE the reference returns the
  result in RADIANS (the conversion back to degrees is missing upstream and no
  test covers it). We return degrees by default; ``radians_quirk=True``
  reproduces the reference bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from geo_ray.constants import EARTH_RADIUS_M, PI


def bearing(lat1, lng1, lat2, lng2):
    """Initial great-circle bearing in degrees clockwise from north."""
    p1lat = np.radians(np.asarray(lat1, dtype=np.float64))
    p2lat = np.radians(np.asarray(lat2, dtype=np.float64))
    dlng = np.radians(np.asarray(lng2, dtype=np.float64)) - np.radians(
        np.asarray(lng1, dtype=np.float64)
    )
    cos_p2lat = np.cos(p2lat)
    b = np.arctan2(
        np.sin(dlng) * cos_p2lat,
        np.cos(p1lat) * np.sin(p2lat) - np.sin(p1lat) * cos_p2lat * np.cos(dlng),
    )
    return np.degrees(np.fmod(b + 2.0 * PI, 2.0 * PI))


def destination_point(lat, lng, distance_m, bearing_deg):
    """Forward geodesic on the sphere: point at (distance, bearing) from source."""
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    brg = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    sin_lat = np.sin(lat_r)
    cos_lat = np.cos(lat_r)
    ang = np.asarray(distance_m, dtype=np.float64) / EARTH_RADIUS_M
    sin_ang = np.sin(ang)
    cos_ang = np.cos(ang)
    lat_dest = np.arcsin(sin_lat * cos_ang + cos_lat * sin_ang * np.cos(brg))
    lng_dest = np.radians(np.asarray(lng, dtype=np.float64)) + np.arctan2(
        np.sin(brg) * sin_ang * cos_lat, cos_ang - sin_lat * np.sin(lat_dest)
    )
    return np.degrees(lat_dest), np.degrees(lng_dest)


def midpoint(lat1, lng1, lat2, lng2, radians_quirk: bool = False):
    """Great-circle midpoint. ``radians_quirk=True`` reproduces the reference's
    missing rad->deg conversion (src/latlng.cc:72)."""
    d_lng = np.radians(np.asarray(lng2, dtype=np.float64) - np.asarray(lng1, dtype=np.float64))
    a_lat = np.radians(np.asarray(lat1, dtype=np.float64))
    b_lat = np.radians(np.asarray(lat2, dtype=np.float64))
    a_lng = np.radians(np.asarray(lng1, dtype=np.float64))
    b_x = np.cos(b_lat) * np.cos(d_lng)
    b_y = np.cos(b_lat) * np.sin(d_lng)
    lat = np.arctan2(
        np.sin(a_lat) + np.sin(b_lat),
        np.sqrt((np.cos(a_lat) + b_x) ** 2 + b_y * b_y),
    )
    lng = a_lng + np.arctan2(b_y, np.cos(a_lat) + b_x)
    if radians_quirk:
        return lat, lng
    return np.degrees(lat), np.degrees(lng)

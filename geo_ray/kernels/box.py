"""Axis-aligned lat/lng bounding-box kernels (struct-of-arrays: four float64
columns ``min_lat, min_lng, max_lat, max_lng``).

Reference semantics (include/geo/box.h):
- ``contains_point`` is STRICT (>/<, box.h:72-75)
- ``contains_box`` is inclusive (box.h:77-80)
- ``overlaps`` is inclusive (box.h:82-88)
- ``extend_meters`` buffers with 111000 m/deg lat and 111200*cos(lat) m/deg lng
  (box.h:50-70)
"""

from __future__ import annotations

import numpy as np


def make_box(lats, lngs):
    """Envelope of a coordinate list -> (min_lat, min_lng, max_lat, max_lng)."""
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    return lats.min(), lngs.min(), lats.max(), lngs.max()


def boxes_of_lists(lat_values, lng_values, offsets):
    """Per-row envelope of Arrow-style list columns given flat values + offsets.

    ``offsets`` has len n+1; row i covers values[offsets[i]:offsets[i+1]].
    Empty rows get the inverted "empty" box (+inf / -inf, box.h:15-19).
    """
    lat_values = np.asarray(lat_values, dtype=np.float64)
    lng_values = np.asarray(lng_values, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    min_lat = np.full(n, np.inf)
    min_lng = np.full(n, np.inf)
    max_lat = np.full(n, -np.inf)
    max_lng = np.full(n, -np.inf)
    nonempty = offsets[1:] > offsets[:-1]
    if nonempty.any():
        idx = np.flatnonzero(nonempty)
        starts = offsets[:-1][idx]
        ends = offsets[1:][idx]
        min_lat[idx] = np.minimum.reduceat(lat_values, starts)
        min_lng[idx] = np.minimum.reduceat(lng_values, starts)
        max_lat[idx] = np.maximum.reduceat(lat_values, starts)
        max_lng[idx] = np.maximum.reduceat(lng_values, starts)
        # reduceat segment i is [starts[i], starts[i+1]) — identical to row i's
        # value range because skipped (empty) rows contribute zero length.
        del ends
    return min_lat, min_lng, max_lat, max_lng


def contains_point(min_lat, min_lng, max_lat, max_lng, lat, lng):
    """Strict point containment (box.h:72-75)."""
    return (lat > min_lat) & (lat < max_lat) & (lng > min_lng) & (lng < max_lng)


def contains_box(a_min_lat, a_min_lng, a_max_lat, a_max_lng, b_min_lat, b_min_lng, b_max_lat, b_max_lng):
    """Inclusive box-in-box containment (box.h:77-80)."""
    return (
        (b_min_lat >= a_min_lat)
        & (b_max_lat <= a_max_lat)
        & (b_min_lng >= a_min_lng)
        & (b_max_lng <= a_max_lng)
    )


def overlaps(a_min_lat, a_min_lng, a_max_lat, a_max_lng, b_min_lat, b_min_lng, b_max_lat, b_max_lng):
    """Inclusive AABB intersection (box.h:82-88)."""
    return (
        (a_min_lat <= b_max_lat)
        & (a_max_lat >= b_min_lat)
        & (a_min_lng <= b_max_lng)
        & (a_max_lng >= b_min_lng)
    )


def extend_meters(min_lat, min_lng, max_lat, max_lng, dist_in_m):
    """Meter buffer with per-latitude longitude scaling (box.h:50-70)."""
    d_lat = dist_in_m / 111000.0
    new_min_lat = min_lat - d_lat
    new_max_lat = max_lat + d_lat
    min_m_per_deg = 111200.0 * np.cos(np.radians(new_min_lat))
    max_m_per_deg = 111200.0 * np.cos(np.radians(new_max_lat))
    new_min_lng = min_lng - np.abs(dist_in_m / min_m_per_deg)
    new_max_lng = max_lng + np.abs(dist_in_m / max_m_per_deg)
    return new_min_lat, new_min_lng, new_max_lat, new_max_lng


def centroid(min_lat, min_lng, max_lat, max_lng):
    """Box centroid; empty boxes (inverted) yield (0, 0) like latlng{} (box.h:90-96)."""
    empty = (max_lat < min_lat) | (max_lng < min_lng)
    lat = np.where(empty, 0.0, (min_lat + max_lat) / 2.0)
    lng = np.where(empty, 0.0, (min_lng + max_lng) / 2.0)
    return lat, lng


def is_empty(min_lat, min_lng, max_lat, max_lng):
    return (max_lat < min_lat) | (max_lng < min_lng)

"""Polyline kernels over Arrow-style list columns (flat values + offsets).

Reference semantics:
- ``length``      -> src/polyline.cc:12-14 (great-circle length in meters)
- ``extract``     -> src/polyline.cc:22-30 (reversible sub-polyline)
- ``serialize`` / ``deserialize`` -> include/geo/polyline.h:43-66
  (flat [lat0, lng0, lat1, lng1, ...] double array)
"""

from __future__ import annotations

import numpy as np

from geo_ray.kernels.distance import haversine


def lengths_of_lists(lat_values, lng_values, offsets):
    """Per-row great-circle length (m) of polylines stored as list columns."""
    lat = np.asarray(lat_values, dtype=np.float64)
    lng = np.asarray(lng_values, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if lat.size == 0:
        return np.zeros(offsets.size - 1)
    seg = haversine(lat[:-1], lng[:-1], lat[1:], lng[1:])
    # zero out the "segments" that bridge adjacent rows
    row_end = offsets[1:-1] - 1  # last vertex index of each row but the final
    if row_end.size:
        seg[row_end] = 0.0
    csum = np.concatenate([[0.0], np.cumsum(seg)])
    # length of row i = csum[offsets[i+1]-1] - csum[offsets[i]] (0 for rows with <2 pts)
    starts = offsets[:-1]
    ends = np.maximum(offsets[1:] - 1, starts)
    return csum[ends] - csum[starts]


def length(lat, lng):
    """Length of one polyline given coordinate arrays."""
    lat = np.asarray(lat, dtype=np.float64)
    if lat.size < 2:
        return 0.0
    lng = np.asarray(lng, dtype=np.float64)
    return float(haversine(lat[:-1], lng[:-1], lat[1:], lng[1:]).sum())


def extract(lat, lng, from_idx: int, to_idx: int):
    """Reversible sub-polyline [from, to] inclusive (from > to iterates backwards)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    if from_idx <= to_idx:
        return lat[from_idx : to_idx + 1].copy(), lng[from_idx : to_idx + 1].copy()
    stop = None if to_idx == 0 else to_idx - 1
    return lat[from_idx:stop:-1].copy(), lng[from_idx:stop:-1].copy()


def serialize(lat, lng):
    """Interleave into the reference's flat [lat0, lng0, lat1, lng1, ...] form."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    out = np.empty(lat.size * 2, dtype=np.float64)
    out[0::2] = lat
    out[1::2] = lng
    return out


def deserialize(flat):
    """Inverse of :func:`serialize` (zero-copy views)."""
    flat = np.asarray(flat, dtype=np.float64)
    assert flat.size % 2 == 0
    return flat[0::2], flat[1::2]

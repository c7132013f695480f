"""Point-in-polygon kernels (vectorized even-odd ray cast).

The reference delegates to ``boost::geometry::within(point, ring)``
(src/polygon.cc:38-41) which is untested upstream; per FIXTURES.md §5.h our
conformance target is an independent scalar oracle. Semantics here:

- planar even-odd (crossing-number) test on (lng, lat) coordinates,
- strict interior (boundary points are NOT contained, matching
  boost::geometry::within's interior semantics up to edge-degenerate cases),
- rings may be open or closed (implicit closure),
- polygons crossing the antimeridian are out of scope (as in the reference).

Multipolygon-with-holes containment (area_db semantics, area_db.h:194-214):
a point is in an area iff it is inside at least one outer ring and inside
none of that ring's holes.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(lat, lng, ring_lat, ring_lng, chunk: int = 4_000_000):
    """Even-odd containment of many points in ONE ring -> boolean array.

    Vectorized over points x edges; edge count x point count is chunked to
    bound the temporary matrix size.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    r_lat = np.asarray(ring_lat, dtype=np.float64)
    r_lng = np.asarray(ring_lng, dtype=np.float64)
    if r_lat.size >= 2 and (r_lat[0] != r_lat[-1] or r_lng[0] != r_lng[-1]):
        r_lat = np.concatenate([r_lat, r_lat[:1]])
        r_lng = np.concatenate([r_lng, r_lng[:1]])
    if r_lat.size < 4:  # fewer than 3 distinct vertices
        return np.zeros(lat.size, dtype=bool)

    y1 = r_lat[:-1]
    y2 = r_lat[1:]
    x1 = r_lng[:-1]
    x2 = r_lng[1:]
    # drop horizontal-in-lat degenerate edges (they never cross the ray)
    keep = y1 != y2
    y1, y2, x1, x2 = y1[keep], y2[keep], x1[keep], x2[keep]
    if y1.size == 0:
        return np.zeros(lat.size, dtype=bool)

    n = lat.size
    out = np.zeros(n, dtype=bool)
    pts_per_chunk = max(1, chunk // max(1, y1.size))
    for s in range(0, n, pts_per_chunk):
        e = min(n, s + pts_per_chunk)
        py = lat[s:e, None]
        px = lng[s:e, None]
        crosses = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        out[s:e] = np.bitwise_xor.reduce(crosses & (px < x_at), axis=1)
    return out


def points_in_area(lat, lng, outer_rings, holes_per_outer):
    """Containment of many points in one multipolygon with holes.

    ``outer_rings``: list of (lat_arr, lng_arr); ``holes_per_outer``: parallel
    list of lists of (lat_arr, lng_arr). Returns a boolean array.
    """
    lat = np.asarray(lat, dtype=np.float64)
    result = np.zeros(lat.size, dtype=bool)
    for (o_lat, o_lng), holes in zip(outer_rings, holes_per_outer):
        inside = points_in_ring(lat, lng, o_lat, o_lng)
        if not inside.any():
            continue
        for h_lat, h_lng in holes:
            if not inside.any():
                break
            idx = np.flatnonzero(inside)
            in_hole = points_in_ring(lat[idx], np.asarray(lng, dtype=np.float64)[idx], h_lat, h_lng)
            inside[idx[in_hole]] = False
        result |= inside
    return result

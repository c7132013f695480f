"""Deterministic geocoded-point derivation from the ``documents`` table.

The engine's driving input is a table of interleaved text+media documents
whose spans carry geocoded coordinates (BASELINE.json ``input_hint``). The
sandbox testdata's ``documents`` table has no coordinates, so geo spans are
DERIVED from ``doc_id`` by pure int64 + IEEE-double arithmetic. The same
derivation is emitted as SQL so the DuckDB oracle reproduces every coordinate
bit-for-bit (integer ops are exact; float divisions/additions are identical
correctly-rounded IEEE operations in NumPy and DuckDB).

Layout: ``n_pts = doc_id % 4`` geo points per document; 60% cluster around 8
"urban" centers with +-0.1 deg jitter (skew/salting exercise), 40% are
uniform-global. This mirrors FIXTURES.md §1's point distribution.
"""

from __future__ import annotations

import numpy as np

# 8 urban centers (lat, lng) — literal doubles shared with the SQL oracle.
CITIES = [
    (52.52, 13.405),      # Berlin
    (48.8566, 2.3522),    # Paris
    (51.5074, -0.1278),   # London
    (40.7128, -74.006),   # New York
    (35.6895, 139.6917),  # Tokyo
    (-33.8688, 151.2093), # Sydney
    (-23.5505, -46.6333), # Sao Paulo
    (30.0444, 31.2357),   # Cairo
]

_MULT = 2654435761  # Knuth multiplicative constant
_STEP = 40503
# irrational-ish grid scales (see point_coords for why these are not 1/1000)
_JITTER_LAT = 1.00000011e-05
_JITTER_LNG = 1.00000013e-05
_RURAL_LNG = 0.00100000001


def derive_points(doc_ids: np.ndarray):
    """Explode doc ids to derived geo points.

    Returns (doc_id, pt_idx, lat, lng) int64/int64/float64/float64 arrays,
    one row per derived point (pt_idx starts at 1).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n_pts = doc_ids % 4
    doc_rep = np.repeat(doc_ids, n_pts)
    # pt_idx = 1..n_pts per doc
    total = int(n_pts.sum())
    pt_idx = np.ones(total, dtype=np.int64)
    if total:
        starts = np.concatenate([[0], np.cumsum(n_pts)[:-1]])
        nz = n_pts > 0
        pt_idx = np.arange(total, dtype=np.int64) - np.repeat(starts[nz], n_pts[nz]) + 1
    return (doc_rep, pt_idx) + point_coords(doc_rep, pt_idx)


def point_coords(doc_id: np.ndarray, pt_idx: np.ndarray):
    """Coordinates of point ``pt_idx`` of ``doc_id`` (vectorized, exact)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    pt_idx = np.asarray(pt_idx, dtype=np.int64)
    h = doc_id * _MULT + pt_idx * _STEP
    urban = (h % 10) < 6
    c = ((h // 10) % 8).astype(np.int64)
    city_lat = np.asarray([p[0] for p in CITIES])[c]
    city_lng = np.asarray([p[1] for p in CITIES])[c]
    # Jitter/grid scales are IRRATIONAL-ish multipliers, not k/1000 grids: the
    # WebMercator x-pixel chain cancels pi (v = (lng+180)*2^z/360), so a
    # rational lng grid would land points EXACTLY on cell/tile boundaries where
    # a 1-ulp difference between NumPy and the SQL oracle flips trunc().
    jlat = ((h // 100) % 20000 - 10000) * _JITTER_LAT
    jlng = ((h // 7) % 20000 - 10000) * _JITTER_LNG
    rlat = ((h // 100) % 160000) / 1000.0 - 80.0
    rlng = ((h // 7) % 359990) * _RURAL_LNG - 180.0
    lat = np.where(urban, city_lat + jlat, rlat)
    lng = np.where(urban, city_lng + jlng, rlng)
    return lat, lng


def points_sql(docs_rel: str = "documents") -> str:
    """Subquery producing (doc_id, pt_idx, lat, lng) — the SQL twin of
    :func:`derive_points`. Embed as ``... FROM ({points_sql()}) pts ...``."""
    lat_cases = " ".join(
        f"WHEN {k} THEN CAST({CITIES[k][0]!r} AS DOUBLE)" for k in range(8)
    )
    lng_cases = " ".join(
        f"WHEN {k} THEN CAST({CITIES[k][1]!r} AS DOUBLE)" for k in range(8)
    )
    return f"""
SELECT doc_id, pt_idx,
  CASE WHEN h % 10 < 6
    THEN (CASE (h // 10) % 8 {lat_cases} END) + ((h // 100) % 20000 - 10000) * CAST({_JITTER_LAT!r} AS DOUBLE)
    ELSE ((h // 100) % 160000) / 1000.0 - 80.0 END AS lat,
  CASE WHEN h % 10 < 6
    THEN (CASE (h // 10) % 8 {lng_cases} END) + ((h // 7) % 20000 - 10000) * CAST({_JITTER_LNG!r} AS DOUBLE)
    ELSE ((h // 7) % 359990) * CAST({_RURAL_LNG!r} AS DOUBLE) - 180.0 END AS lng
FROM (
  SELECT doc_id, pt_idx, doc_id * {_MULT} + pt_idx * {_STEP} AS h
  FROM (
    SELECT doc_id, unnest(generate_series(1, doc_id % 4)) AS pt_idx
    FROM {docs_rel}
  )
)
""".strip()


def _polygon_rings():
    """Fixed literal polygons around each city: a hexagon-ish ring of radius
    ~0.08 deg (lng stretched 1.4x), vertices rounded to 6 dp so the Python and
    SQL literals are the same doubles."""
    out = []
    for k, (clat, clng) in enumerate(CITIES):
        ring = []
        for j in range(6):
            ang = 2 * np.pi * j / 6 + 0.3
            ring.append(
                (
                    round(clat + 0.08 * np.sin(ang), 6),
                    round(clng + 0.112 * np.cos(ang), 6),
                )
            )
        out.append((k, ring))
    return out


POLYGONS = _polygon_rings()


def polygons_arrays():
    """POLYGONS as (area_id, lat_array, lng_array) tuples for the kernels."""
    return [
        (k, np.array([p[0] for p in ring]), np.array([p[1] for p in ring]))
        for k, ring in POLYGONS
    ]


def pip_sql_predicate(ring, lat_col: str = "lat", lng_col: str = "lng") -> str:
    """Even-odd crossing test for ONE literal ring, unrolled to SQL — the exact
    arithmetic of geo_ray.kernels.pip.points_in_ring (same IEEE ops)."""
    closed = list(ring) + [ring[0]]
    terms = []
    for (y1, x1), (y2, x2) in zip(closed[:-1], closed[1:]):
        if y1 == y2:
            continue  # horizontal edges never cross the ray (kernel drops them too)
        terms.append(
            f"(CASE WHEN (CAST({y1!r} AS DOUBLE) > {lat_col}) <> (CAST({y2!r} AS DOUBLE) > {lat_col})"
            f" AND {lng_col} < (CAST({x2!r} AS DOUBLE) - CAST({x1!r} AS DOUBLE))"
            f" * ({lat_col} - CAST({y1!r} AS DOUBLE))"
            f" / (CAST({y2!r} AS DOUBLE) - CAST({y1!r} AS DOUBLE)) + CAST({x1!r} AS DOUBLE)"
            f" THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def many_polygons(n: int = 200):
    """Deterministic larger polygon set (hexagon-ish rings scattered around
    the cities by integer arithmetic, vertices rounded to 6 dp so Python and
    SQL literals are the same doubles) — exercises the cell-cover index path
    of CompiledPolygons with an exact SQL oracle."""
    out = []
    for k in range(n):
        clat, clng = CITIES[k % len(CITIES)]
        h = k * _MULT + 12345
        clat = clat + ((h % 1000) - 500) / 1000.0 * 0.5
        clng = clng + (((h // 1000) % 1000) - 500) / 1000.0 * 0.7
        r = 0.02 + ((h // 7) % 100) / 100.0 * 0.13
        ring = []
        for j in range(6):
            ang = 2 * np.pi * j / 6 + 0.3
            ring.append(
                (round(clat + r * np.sin(ang), 6), round(clng + 1.4 * r * np.cos(ang), 6))
            )
        out.append((k, ring))
    return out


def many_polygons_arrays(n: int = 200):
    return [
        (k, np.array([p[0] for p in ring]), np.array([p[1] for p in ring]))
        for k, ring in many_polygons(n)
    ]

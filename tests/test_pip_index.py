"""Cell-cover polygon index == linear bbox scan, on a 200-polygon set."""

import numpy as np

from geo_ray.sources import derive
from geo_ray.stages.pip_join import CompiledPolygons


def _many_polygons(n=200, seed=5):
    """Deterministic hexagon-ish rings scattered around the city centers."""
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n):
        clat, clng = derive.CITIES[k % len(derive.CITIES)]
        clat += float(rng.uniform(-0.5, 0.5))
        clng += float(rng.uniform(-0.7, 0.7))
        r = float(rng.uniform(0.02, 0.15))
        ang = 2 * np.pi * np.arange(6) / 6 + 0.3
        out.append((k, clat + r * np.sin(ang), clng + 1.4 * r * np.cos(ang)))
    return out


def _points(n=5000, seed=9):
    rng = np.random.default_rng(seed)
    pick = rng.integers(0, len(derive.CITIES), n)
    c = np.array(derive.CITIES)
    lat = c[pick, 0] + rng.uniform(-0.6, 0.6, n)
    lng = c[pick, 1] + rng.uniform(-0.8, 0.8, n)
    return lat, lng


def _pairs(idx, lat, lng):
    rows, areas = idx.lookup(lat, lng)
    return set(zip(rows.tolist(), areas.tolist()))


def test_indexed_equals_scan():
    polys = _many_polygons()
    lat, lng = _points()
    scan = CompiledPolygons(polys, index_threshold=10**9)  # force linear scan
    indexed = CompiledPolygons(polys, index_threshold=1)  # force cell index
    assert indexed.cell_index is not None and scan.cell_index is None
    a = _pairs(scan, lat, lng)
    b = _pairs(indexed, lat, lng)
    assert len(a) > 100  # non-trivial join
    assert a == b


def test_fixture_set_stays_linear():
    assert CompiledPolygons().cell_index is None  # 8 fixtures < threshold


def test_index_with_holes():
    polys = _many_polygons(40)
    # punch a hole in polygon 0 (small inner ring)
    k, rlat, rlng = polys[0]
    hole_lat = rlat.mean() + 0.2 * (rlat - rlat.mean())
    hole_lng = rlng.mean() + 0.2 * (rlng - rlng.mean())
    polys[0] = (k, rlat, rlng, [(hole_lat, hole_lng)])
    lat, lng = _points(2000)
    a = _pairs(CompiledPolygons(polys, index_threshold=10**9), lat, lng)
    b = _pairs(CompiledPolygons(polys, index_threshold=1), lat, lng)
    assert a == b

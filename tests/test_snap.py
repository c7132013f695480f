"""Nearest-road snap semantics: endpoint clamping, self-snap on the line,
and the road_id tie-break at shared city endpoints."""

import numpy as np
import pyarrow as pa

from geo_ray.kernels import distance as dist_k
from geo_ray.kernels import segment as seg_k
from geo_ray.pipelines import queries as Q
from geo_ray.sources import derive


def _snap_batch(lat, lng):
    segs = Q._road_segments()
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    best_d = np.full(lat.size, np.inf)
    best_r = np.zeros(lat.size, dtype=np.int64)
    for rid, fla, flg, tla, tlg in segs:
        clat, clng = seg_k.closest_on_segment(lat, lng, fla, flg, tla, tlg)
        d = dist_k.haversine(lat, lng, clat, clng)
        upd = d < best_d
        best_d[upd] = d[upd]
        best_r[upd] = rid
    return best_r, best_d


def test_snap_city_endpoint_tie_breaks_to_lower_road():
    # Paris is the shared endpoint of road 0 (Berlin->Paris) and road 1
    # (Paris->London): exact distance tie -> road 0 must win.
    plat, plng = derive.CITIES[1]
    r, d = _snap_batch([plat], [plng])
    assert r[0] == 0 and d[0] == 0.0


def test_snap_point_on_segment_is_zero_distance():
    # Berlin itself lies on road 0 only.
    blat, blng = derive.CITIES[0]
    r, d = _snap_batch([blat], [blng])
    assert r[0] == 0 and d[0] == 0.0


def test_snap_far_point_clamps_to_nearest_endpoint():
    # A point far south-east of Cairo (the terminal city of the last road)
    # snaps onto road 6's endpoint, at the haversine distance to Cairo.
    qlat, qlng = 20.0, 45.0
    r, d = _snap_batch([qlat], [qlng])
    clat, clng = derive.CITIES[7]
    want = dist_k.haversine(
        np.array([qlat]), np.array([qlng]), np.array([clat]), np.array([clng])
    )[0]
    assert r[0] == 6
    assert abs(d[0] - want) < 1e-6
